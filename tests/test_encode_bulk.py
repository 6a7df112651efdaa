"""Two-pass bulk emission (encode_bulk): byte-identity vs the host
level-1 emission, interpret mode.

Contract identical to test_encode_emit (same candidates in -> same
payload bytes out, csrc encode_candidates_impl / TokenSink semantics,
upstream hot loop tsq_encode.cpp:216-326), but through the
decide+assemble pipeline: scalar decisions -> side plane + record
stream -> gang-machinery assembly. Real-TPU identity is covered by the
TSQ_TEST_TPU Mosaic lane and by bench.py's verify-before-timing gate.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from turbosqueeze_tpu.kernels import encode_bulk as EB
from turbosqueeze_tpu.kernels import encode_emit as EE
from turbosqueeze_tpu.utils.corpus import synthetic_text

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    from turbosqueeze_tpu.runtime import native as mod

    if not mod.available():
        subprocess.run(["make", "-C", str(REPO / "csrc")], check=True)
        mod._SEARCHED = False
    assert mod.available()
    return mod


def run_bulk(native, blk, ext):
    cand = native.build_candidates(blk)
    want = native.encode_block_candidates(blk, cand, ext, level=1)
    got, ovf = EB.emit_bulk_block(blk, cand, ext=ext, interpret=True)
    assert ovf == 0
    return got, want


@pytest.mark.parametrize("ext", [True, False])
@pytest.mark.slow
def test_bulk_text_identity(native, ext):
    got, want = run_bulk(native, synthetic_text(40_000, seed=31), ext)
    assert got == want


def test_bulk_zeros_identity(native):
    got, want = run_bulk(native, bytes(20_000), True)
    assert got == want


def test_bulk_random_identity(native):
    rng = np.random.default_rng(7)
    blk = rng.integers(0, 256, 16_384, dtype=np.uint8).tobytes()
    got, want = run_bulk(native, blk, True)
    assert got == want


def test_bulk_dead_size_slot_shift(native):
    """Trailing EMPTY size slot gets residue << 4 when the tail loop runs
    (the r5 TokenSink regression) — two-pass kernel vs host bytes."""
    from tests.test_encode_emit import _dead_size_slot_case

    for k, blk in enumerate(list(_dead_size_slot_case())[:6]):
        got, want = run_bulk(native, blk, True)
        assert got == want, f"trigger block {k}"


@pytest.mark.parametrize("n", [1, 3, 5, 17, 33, 64, 513, 1025])
def test_bulk_tiny_blocks(native, n):
    blk = (synthetic_text(2_000, seed=40))[:n]
    got, want = run_bulk(native, blk, True)
    assert got == want


def test_bulk_dense_alternation_entry_cap(native):
    """1-literal/1-match alternation packs >120 records into single
    output rows: the decide pass must split entries at the
    decode_bulk ring-slack cap (same-row reopened entries)."""
    rng = np.random.default_rng(3)
    parts = []
    for k in range(1200):
        parts.append(rng.integers(0, 256, 3, dtype=np.uint8).tobytes())
        parts.append(b"QWERTYUI")
    blk = b"".join(parts)
    got, want = run_bulk(native, blk, True)
    assert got == want


def test_bulk_offset_window_edge(native):
    """The r2 offset-wrap regression shape: candidate at the 16-bit
    window edge + anchor-advancing trailing literal flush (upstream
    re-check tsq_encode.cpp:298)."""
    from tests.test_encode_emit import _window_edge_case

    for q in (65_500, 65_534, 65_560):
        got, want = run_bulk(native, _window_edge_case(q), True)
        assert got == want


def test_bulk_dictionary_identity(native):
    d = synthetic_text(30_000, seed=34)
    blk = synthetic_text(8_000, seed=34)[4_000:] + bytes(2_000)
    concat = d + blk
    cand = native.build_candidates(concat)
    want = native.encode_block_dict(blk, d, cand, True)
    got, ovf = EB.emit_bulk_block(concat, cand, ext=True, base=len(d),
                                  interpret=True)
    assert ovf == 0
    assert got == want


def test_bulk_matches_emit_batch(native):
    """Cross-check the two device emitters against each other (and the
    host) on a mixed corpus."""
    blk = (synthetic_text(9_000, seed=51) + bytes(600)
           + synthetic_text(5_000, seed=52))
    cand = native.build_candidates(blk)
    want = native.encode_block_candidates(blk, cand, True, level=1)
    got_bulk, ovf = EB.emit_bulk_block(blk, cand, ext=True, interpret=True)
    iw = EE.pack_input_words(blk)[None]
    cw = EE.pack_cand_words(cand)[None]
    meta = np.zeros((1, 8), np.int32)
    meta[0, 0] = len(blk)
    out, osz = EE.emit_batch(iw, cw, meta, ext=True, interpret=True)
    got_emit = EE.payload_from_words(np.asarray(out)[0],
                                     int(np.asarray(osz)[0, 0]))
    assert ovf == 0
    assert got_bulk == want
    assert got_emit == want
