"""ctypes bindings to the C++ native core (libtsq_core.so).

The native core is built from csrc/ (see csrc/Makefile). Until it is built,
``available()`` returns False and the auto backend falls back to the oracle.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False

# Zero-copy result buffers: decode sizes are exact (the container header
# declares them), so the native core can write straight into a freshly
# allocated Python bytes object — the standard CPython refcount-1 idiom —
# instead of staging through numpy and paying a full-stream copy.
_py_new_bytes = ctypes.pythonapi.PyBytes_FromStringAndSize
_py_new_bytes.argtypes = [ctypes.c_void_p, ctypes.c_ssize_t]
_py_new_bytes.restype = ctypes.py_object
_py_bytes_ptr = ctypes.pythonapi.PyBytes_AsString
_py_bytes_ptr.argtypes = [ctypes.py_object]
_py_bytes_ptr.restype = ctypes.c_void_p


_py_resize_bytes = ctypes.pythonapi._PyBytes_Resize
_py_resize_bytes.argtypes = [ctypes.POINTER(ctypes.py_object),
                             ctypes.c_ssize_t]
_py_resize_bytes.restype = ctypes.c_int


# Large fresh PyBytes buffers fault in 4 KiB pages as the native core
# writes them; advising transparent huge pages first cuts the fault count
# 512x and the kernel's page zeroing runs at THP speed (measured on this
# box: 64 MiB decode output 52 -> 38 ms end to end, +39% wrapper decode
# throughput — numpy already does the same for its own big allocations,
# which is why np.empty outputs never showed the penalty).
_HUGE_MIN = 8 << 20       # advise only when it can span several 2 MiB pages
_HUGE_ALIGN = 2 << 20
_MADV_HUGEPAGE = 14       # linux uapi mman.h
_libc = None


def _advise_hugepages(ptr: int, n: int) -> None:
    """Best-effort madvise(MADV_HUGEPAGE) on the 2 MiB-aligned interior of
    [ptr, ptr+n). No-op on failure or non-Linux."""
    global _libc
    if n < _HUGE_MIN or not ptr:
        return
    try:
        if _libc is None:
            _libc = ctypes.CDLL(None, use_errno=True)
        a0 = (ptr + _HUGE_ALIGN - 1) & ~(_HUGE_ALIGN - 1)
        ln = (ptr + n - a0) & ~(_HUGE_ALIGN - 1)
        if ln > 0:
            _libc.madvise(ctypes.c_void_p(a0), ctypes.c_size_t(ln),
                          _MADV_HUGEPAGE)
    except Exception:
        pass


def _alloc_exact_bytes(n: int):
    """Uninitialized bytes of length n plus its writable buffer address."""
    b = _py_new_bytes(None, n)
    ptr = _py_bytes_ptr(b)
    _advise_hugepages(ptr, n)
    return b, ptr


def _shrink_bytes(obj: ctypes.py_object, n: int) -> bytes:
    """In-place shrink of a refcount-1 bytes held ONLY by ``obj``."""
    if _py_resize_bytes(ctypes.byref(obj), n) != 0:
        raise MemoryError("bytes resize failed")
    return obj.value


def _find_library() -> Optional[Path]:
    here = Path(__file__).resolve().parent.parent.parent
    candidates = [  # an explicit override outranks the repo builds
        Path(os.environ.get("TSQ_CORE_LIB", "/nonexistent")),
        here / "build" / "libtsq_core.so",
        here / "csrc" / "libtsq_core.so",
    ]
    for c in candidates:
        if c.exists():
            return c
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    path = _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.tsq_compress_bound.restype = ctypes.c_uint64
    lib.tsq_compress_bound.argtypes = [ctypes.c_uint64]
    lib.tsq_compress_mt.restype = ctypes.c_int64
    lib.tsq_compress_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,        # input
        ctypes.c_void_p, ctypes.c_uint64,        # output buffer, capacity
        ctypes.c_int, ctypes.c_uint32, ctypes.c_int,  # ext, level, n_threads
    ]
    lib.tsq_decompress_mt.restype = ctypes.c_int64
    lib.tsq_decompress_mt.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_int,
    ]
    lib.tsq_decompressed_size.restype = ctypes.c_int64
    lib.tsq_decompressed_size.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.tsq_tokenize_block.restype = ctypes.c_int64
    lib.tsq_tokenize_block.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
    ]
    lib.tsq_bulk_prep.restype = ctypes.c_int64
    lib.tsq_bulk_prep.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.tsq_bulk_prep_dict.restype = ctypes.c_int64
    lib.tsq_bulk_prep_dict.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.tsq_bulk_merge2.restype = ctypes.c_int64
    lib.tsq_bulk_merge2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.tsq_bulk_mergen.restype = ctypes.c_int64
    lib.tsq_bulk_mergen.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
    ]
    lib.tsq_bulk_gang.restype = ctypes.c_int64
    lib.tsq_bulk_gang.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_uint32, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    lib.tsq_build_candidates.restype = None
    lib.tsq_build_candidates.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_void_p]
    lib.tsq_encode_block_candidates.restype = ctypes.c_int64
    lib.tsq_encode_block_candidates.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int]
    lib.tsq_encode_block_lazy.restype = ctypes.c_int64
    lib.tsq_encode_block_lazy.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_uint32]
    lib.tsq_compress_mt_dict.restype = ctypes.c_int64
    lib.tsq_compress_mt_dict.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, PROGRESS_CFUNC, ctypes.c_void_p]
    lib.tsq_decompress_mt_dict.restype = ctypes.c_int64
    lib.tsq_decompress_mt_dict.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, PROGRESS_CFUNC,
        ctypes.c_void_p]
    lib.tsq_compress_mt_cb.restype = ctypes.c_int64
    lib.tsq_compress_mt_cb.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_uint32, ctypes.c_int, PROGRESS_CFUNC,
        ctypes.c_void_p]
    lib.tsq_decompress_mt_cb.restype = ctypes.c_int64
    lib.tsq_decompress_mt_cb.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64,
        ctypes.c_int, PROGRESS_CFUNC, ctypes.c_void_p]
    lib.tsq_compress_file_cb.restype = ctypes.c_int64
    lib.tsq_compress_file_cb.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_uint32,
        ctypes.c_int, PROGRESS_CFUNC, ctypes.c_void_p]
    lib.tsq_decompress_file_cb.restype = ctypes.c_int64
    lib.tsq_decompress_file_cb.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, PROGRESS_CFUNC,
        ctypes.c_void_p]
    lib.tsq_encode_block_dict.restype = ctypes.c_int64
    lib.tsq_encode_block_dict.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint32]
    _LIB = lib
    return _LIB

MAX_DICT = 65536 - 4


def compress_dict(data: bytes, dictionary: bytes, ext: bool = True,
                  n_threads: int = 0, level: int = 1,
                  progress=None) -> bytes:
    """Compress with a preset dictionary (shared 64 KiB context virtually
    preceding every block; framework extension — see csrc/tsq_core.h)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    if not (0 < len(dictionary) <= MAX_DICT):
        raise ValueError(f"dictionary must be 1..{MAX_DICT} bytes")
    bound = lib.tsq_compress_bound(len(data))
    out = np.empty(bound, dtype=np.uint8)
    cb, _keep = _wrap_progress(progress)
    n = lib.tsq_compress_mt_dict(data, len(data), dictionary,
                                 len(dictionary), _as_ptr(out), bound,
                                 1 if ext else 0, n_threads, level, cb,
                                 None)
    if n < 0:
        raise RuntimeError(f"native dict compress failed (code {n})")
    return out[:n].tobytes()


def decompress_dict(stream: bytes, dictionary: bytes,
                    n_threads: int = 0, progress=None) -> bytes:
    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    if not (0 < len(dictionary) <= MAX_DICT):
        raise ValueError(f"dictionary must be 1..{MAX_DICT} bytes")
    size = lib.tsq_decompressed_size(stream, len(stream))
    if size < 0:
        raise FormatError(f"bad .tsq stream (code {size})")
    out, ptr = _alloc_exact_bytes(size)
    cb, _keep = _wrap_progress(progress)
    n = lib.tsq_decompress_mt_dict(stream, len(stream), dictionary,
                                   len(dictionary), ptr, size, n_threads,
                                   cb, None)
    if n < 0:
        raise FormatError(f"native dict decompress failed (code {n})")
    if n != size:
        raise FormatError(f"native dict decompress short ({n} != {size})")
    return out


def encode_block_dict(block: bytes, dictionary: bytes, cand,
                      ext: bool, level: int = 1) -> bytes:
    """Emit one block payload from concat-buffer candidates (device encode
    path with dictionary: candidates come from find_candidates over
    dictionary+block). level >= 2 selects the lazy best-of-chain parse,
    same as the non-dict emission."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cand = np.ascontiguousarray(cand, dtype=np.int32)
    if len(cand) != len(dictionary) + len(block):
        raise ValueError("candidates must cover dictionary + block")
    out = np.empty((1 << 22) + (1 << 20) + 64, dtype=np.uint8)
    psz = lib.tsq_encode_block_dict(
        dictionary + block + bytes(80), len(dictionary), len(block),
        cand.ctypes.data, out.ctypes.data, 1 if ext else 0, level)
    if psz < 0:
        raise RuntimeError(f"dict emission failed (code {psz})")
    return out[:psz].tobytes()


def build_candidates(block: bytes):
    """Host hash-chain candidate array for one block (int32, -1 = none)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cand = np.empty(len(block), dtype=np.int32)
    lib.tsq_build_candidates(block + bytes(8), len(block), cand.ctypes.data)
    return cand


def encode_block_candidates(block: bytes, cand, ext: bool,
                            level: int = 1) -> bytes:
    """Emission from a candidate array -> one block payload (the device
    encode phase B): level 1 = nearest-predecessor greedy, level >= 2 =
    lazy best-of-chain parse."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cand = np.ascontiguousarray(cand, dtype=np.int32)
    if len(cand) != len(block):
        raise ValueError("candidate array length must equal block length")
    out = np.empty((1 << 22) + (1 << 20) + 64, dtype=np.uint8)
    if level >= 2:
        psz = lib.tsq_encode_block_lazy(
            block + bytes(80), len(block), cand.ctypes.data,
            out.ctypes.data, 1 if ext else 0, level)
    else:
        psz = lib.tsq_encode_block_candidates(
            block + bytes(80), len(block), cand.ctypes.data,
            out.ctypes.data, 1 if ext else 0)
    if psz < 0:
        raise RuntimeError(f"candidate emission failed (code {psz})")
    return out[:psz].tobytes()


def tokenize_block(payload: bytes, ext: bool, dict_len: int = 0):
    """Parse one block payload into token arrays (dst, src, len, lit) plus
    the uncompressed size. Phase A of the TPU decode path. With dict_len,
    positions come out in the dict-extended output space [0, dict_len+size)
    so dictionary-reaching match sources stay non-negative."""
    import numpy as np

    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    padded = payload + bytes(64)
    # worst case ~1 token / 4 output bytes, plus tail slack
    max_tokens = (1 << 20) + 64
    dst = np.empty(max_tokens, dtype=np.uint32)
    src = np.empty(max_tokens, dtype=np.uint32)
    ln = np.empty(max_tokens, dtype=np.uint16)
    lit = np.empty(max_tokens, dtype=np.uint8)
    size = ctypes.c_uint32(0)
    n = lib.tsq_tokenize_block(
        padded, len(payload), 1 if ext else 0,
        dst.ctypes.data, src.ctypes.data, ln.ctypes.data, lit.ctypes.data,
        max_tokens, ctypes.byref(size), dict_len)
    if n < 0:
        raise FormatError(f"tokenize failed (code {n})")
    return (dst[:n].astype(np.int32), src[:n].astype(np.int32),
            ln[:n].astype(np.int32), lit[:n].astype(np.int32),
            int(size.value))


BULK_FALLBACK = -100  # stream too fragmented for the bulk formulation


def bulk_prep(payload: bytes, ext: bool, dictionary: bytes = None):
    """Resolve one block payload into the bulk-decode planes
    (csrc/tsq_bulk.cpp): compacted literal bytes, row-grouped record
    stream, and the meta words (size, n_windows, lit bytes, record words,
    per-window record offsets). Returns (lit u8[], rec u32[], meta u32[]).
    With ``dictionary`` the planes cover the dict-extended output space
    [0, dict_len + size) (the dictionary staged as a literal-plane copy —
    the resolver twin of the guard-region decode); the caller slices the
    decoded rows at [dict_len, dict_len + size). Raises FormatError on
    malformed payloads; returns None when the stream is too fragmented
    for the bulk formulation (caller should decode that block through
    the fused-parser path instead)."""
    import numpy as np

    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    padded = payload + bytes(64)
    size = (payload[0] | (payload[1] << 8) | (payload[2] << 16)
            if len(payload) >= 3 else 0)
    dlen = len(dictionary) if dictionary else 0
    lit = np.empty(dlen + size + 64, dtype=np.uint8)
    meta = np.zeros(8, dtype=np.uint32)
    # record words scale with tokens (~0.5 words per payload byte
    # measured on level-0 text); 2 w/B gives ~4x headroom so the
    # overflow retry (which re-parses) is a cold path, not the common one
    rec_cap = max(1 << 19, 2 * len(payload))
    while True:
        rec = np.empty(rec_cap, dtype=np.uint32)
        if dlen:
            n = lib.tsq_bulk_prep_dict(
                padded, len(payload), 1 if ext else 0, dictionary, dlen,
                lit.ctypes.data, lit.shape[0],
                rec.ctypes.data, rec_cap, meta.ctypes.data)
        else:
            n = lib.tsq_bulk_prep(
                padded, len(payload), 1 if ext else 0,
                lit.ctypes.data, lit.shape[0],
                rec.ctypes.data, rec_cap, meta.ctypes.data)
        if n == -101 and rec_cap < (1 << 24):  # overflow: retry bigger
            rec_cap *= 4
            continue
        break
    if n == BULK_FALLBACK or n == -101:
        return None
    if n < 0:
        raise FormatError(f"bulk prep failed (code {n})")
    return lit[:int(meta[2])], rec[:int(n)], meta


def bulk_merge2(rec_a, meta_a, rec_b, meta_b):
    """Zip two blocks' bulk record streams into the strictly-alternating
    merged stream for the two-block co-scheduled kernel. Returns
    (merged u32[], meta2 u32[8])."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cap = 2 * (len(rec_a) + len(rec_b)) + 4096
    out = np.empty(cap, dtype=np.uint32)
    meta2 = np.zeros(8, dtype=np.uint32)
    rec_a = np.ascontiguousarray(rec_a, dtype=np.uint32)
    rec_b = np.ascontiguousarray(rec_b, dtype=np.uint32)
    meta_a = np.ascontiguousarray(meta_a, dtype=np.uint32)
    meta_b = np.ascontiguousarray(meta_b, dtype=np.uint32)
    n = lib.tsq_bulk_merge2(rec_a.ctypes.data, meta_a.ctypes.data,
                            rec_b.ctypes.data, meta_b.ctypes.data,
                            out.ctypes.data, cap, meta2.ctypes.data)
    if n < 0:
        raise RuntimeError(f"bulk merge failed (code {n})")
    return out[:int(n)], meta2


def bulk_mergen(recs, metas):
    """Zip N (<= 4) blocks' bulk record streams into one strictly
    round-robin merged stream for the N-way co-scheduled kernel. Returns
    (merged u32[], metan u32[16]): sizes [0..3], n_win [4..7], merged
    window boundaries [8..15] ([8] = 0)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    nblk = len(recs)
    assert 1 <= nblk <= 4 and len(metas) == nblk
    recs = [np.ascontiguousarray(r, dtype=np.uint32) for r in recs]
    metas = [np.ascontiguousarray(m, dtype=np.uint32) for m in metas]
    cap = 2 * sum(len(r) for r in recs) + 4096
    out = np.empty(cap, dtype=np.uint32)
    metan = np.zeros(16, dtype=np.uint32)
    rp = (ctypes.c_void_p * nblk)(*[r.ctypes.data for r in recs])
    mp = (ctypes.c_void_p * nblk)(*[m.ctypes.data for m in metas])
    n = lib.tsq_bulk_mergen(rp, mp, nblk, out.ctypes.data, cap,
                            metan.ctypes.data)
    if n < 0:
        raise RuntimeError(f"bulk mergen failed (code {n})")
    return out[:int(n)], metan


def bulk_gang(recs, metas, slot_recs: int = 8):
    """Re-shape N (<= 8) blocks' bulk record streams into the
    fixed-geometry gang stream for the round-4 co-scheduled kernel
    (csrc/tsq_gang.cpp ABI). Returns (gang u32[], gmeta u32[32]):
    sizes [0..7], n_win [8..15], per-window U/W segment round boundaries
    [16..21], total rounds [30], nblk [31]."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    nblk = len(recs)
    assert 1 <= nblk <= 8 and len(metas) == nblk
    recs = [np.ascontiguousarray(r, dtype=np.uint32) for r in recs]
    metas = [np.ascontiguousarray(m, dtype=np.uint32) for m in metas]
    # worst case: one block holds every entry (others pad with null
    # gangs), entries as short as one record each (4 -> nblk*16 words)
    cap = nblk * 4 * max(max(len(r) for r in recs), 64) + 64 * nblk * 16
    rp = (ctypes.c_void_p * nblk)(*[r.ctypes.data for r in recs])
    mp = (ctypes.c_void_p * nblk)(*[m.ctypes.data for m in metas])
    for _ in range(3):
        out = np.empty(cap, dtype=np.uint32)
        # the merged stream is tens of MB of fresh pages; THP advice cuts
        # this box's pathological first-touch fault cost ~40x (see
        # _advise_hugepages)
        _advise_hugepages(out.ctypes.data, out.nbytes)
        gmeta = np.zeros(32, dtype=np.uint32)
        n = lib.tsq_bulk_gang(rp, mp, nblk, slot_recs, out.ctypes.data,
                              cap, gmeta.ctypes.data)
        if n >= 0:
            return out[:int(n)], gmeta
        if n == -102:  # kBulkBadArg: invalid nblk/slot_recs/n_windows
            raise ValueError(
                f"bulk_gang invalid arguments (nblk={nblk}, "
                f"slot_recs={slot_recs}, code {n})")
        if n != -101:  # not an overflow: don't retry
            break
        cap *= 2
    raise RuntimeError(f"bulk gang merge failed (code {n})")


# Per-block progress callback plumbing (the upstream writer thread's
# per-block fractions, tsq_threads.cpp:248-254): the C core calls back from
# worker threads with a monotone done count; ctypes re-acquires the GIL.
PROGRESS_CFUNC = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_uint64,
                                  ctypes.c_uint64)
_NULL_PROGRESS = PROGRESS_CFUNC()


def _wrap_progress(progress):
    """python callable (done, total) -> (cfunc, keepalive)."""
    if progress is None:
        return _NULL_PROGRESS, None

    def trampoline(_ctx, done, total):
        try:
            progress(int(done), int(total))
        except Exception:
            pass  # in-band contract: callbacks never raise across C

    cf = PROGRESS_CFUNC(trampoline)
    return cf, cf


def available() -> bool:
    return _load() is not None


def streaming_ok(backend: str) -> bool:
    """True when `backend` resolves to this native core (the streaming
    file pipeline / per-block progress fast paths apply). Single source of
    truth for the CLI and the JobEngine."""
    if backend not in ("auto", "native"):
        return False
    try:
        return available()
    except Exception:
        return False


def _as_ptr(arr) -> ctypes.c_char_p:
    return ctypes.cast(arr.ctypes.data, ctypes.c_char_p)


def compress(data: bytes, ext: bool = True, level: int = 0,
             n_threads: int = 0, progress=None) -> bytes:
    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    bound = lib.tsq_compress_bound(len(data))
    # write into a bound-size bytes, then shrink in place (refcount-1 idiom:
    # `obj` must stay the only reference until the shrink)
    obj = ctypes.py_object(_py_new_bytes(None, bound))
    out_ptr = _py_bytes_ptr(obj)
    _advise_hugepages(out_ptr, bound)
    if progress is not None:
        cb, _keep = _wrap_progress(progress)
        n = lib.tsq_compress_mt_cb(data, len(data), out_ptr,
                                   bound, 1 if ext else 0, level, n_threads,
                                   cb, None)
    else:
        n = lib.tsq_compress_mt(data, len(data), out_ptr,
                                bound, 1 if ext else 0, level, n_threads)
    if n < 0:
        raise RuntimeError(f"native compress failed (code {n})")
    return _shrink_bytes(obj, n)


def compress_array(arr, ext: bool = True, level: int = 0,
                   n_threads: int = 0):
    """Compress a numpy uint8 array -> numpy uint8 array (single copy-free
    native call; output is a trimmed view of a fresh buffer)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    bound = lib.tsq_compress_bound(arr.nbytes)
    out = np.empty(bound, dtype=np.uint8)
    n = lib.tsq_compress_mt(_as_ptr(arr), arr.nbytes, _as_ptr(out), bound,
                            1 if ext else 0, level, n_threads)
    if n < 0:
        raise RuntimeError(f"native compress failed (code {n})")
    return out[:n]


def decompress_array(stream_arr, n_threads: int = 0):
    """Decompress a numpy uint8 .tsq array -> numpy uint8 array."""
    import numpy as np

    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    size = lib.tsq_decompressed_size(_as_ptr(stream_arr), stream_arr.nbytes)
    if size < 0:
        raise FormatError(f"bad .tsq stream (code {size})")
    out = np.empty(max(size, 1), dtype=np.uint8)
    n = lib.tsq_decompress_mt(_as_ptr(stream_arr), stream_arr.nbytes,
                              _as_ptr(out), size, n_threads)
    if n < 0:
        raise FormatError(f"native decompress failed (code {n})")
    return out[:n]


def compress_file(in_path: str, out_path: str, ext: bool = True,
                  level: int = 0, n_threads: int = 0, progress=None) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cb, _keep = _wrap_progress(progress)
    n = lib.tsq_compress_file_cb(in_path.encode(), out_path.encode(),
                                 1 if ext else 0, level, n_threads, cb, None)
    if n < 0:
        raise RuntimeError(f"native file compress failed (code {n})")
    return n


def decompress_file(in_path: str, out_path: str, n_threads: int = 0,
                    progress=None) -> int:
    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    cb, _keep = _wrap_progress(progress)
    n = lib.tsq_decompress_file_cb(in_path.encode(), out_path.encode(),
                                   n_threads, cb, None)
    if n < 0:
        raise FormatError(f"native file decompress failed (code {n})")
    return n


def decompress(stream: bytes, n_threads: int = 0, progress=None) -> bytes:
    from ..format import FormatError

    lib = _load()
    if lib is None:
        raise RuntimeError("native core not built (run `make -C csrc`)")
    size = lib.tsq_decompressed_size(stream, len(stream))
    if size < 0:
        raise FormatError(f"bad .tsq stream (code {size})")
    out, ptr = _alloc_exact_bytes(size)
    if progress is not None:
        cb, _keep = _wrap_progress(progress)
        n = lib.tsq_decompress_mt_cb(stream, len(stream), ptr, size,
                                     n_threads, cb, None)
    else:
        n = lib.tsq_decompress_mt(stream, len(stream), ptr, size, n_threads)
    if n < 0:
        raise FormatError(f"native decompress failed (code {n})")
    if n != size:  # decompress_mt returns total or an error code
        raise FormatError(f"native decompress short ({n} != {size})")
    return out
