"""Flat gang decide kernel + sort layout (encode_flat.flat_emit_*):
byte-identity vs the host level-1 emission, interpret mode.

Same contract as test_encode_bulk (same candidates in -> same payload
bytes out) through the descriptor formulation: gang decide chains emit
one word per symbol; layout_batch reconstructs the TokenSink byte
layout. Covers the rare-path services (candidate-chain walks, >=8-byte
extends, ring catchups) and the nblk=2 co-schedule.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from turbosqueeze_tpu.kernels import encode_flat as EF
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


def run_flat(native, blk, ext, nblk=1):
    cand = native.build_candidates(blk)
    want = native.encode_block_candidates(blk, cand, ext, level=1)
    got, ovf = EF.flat_emit_block(blk, cand, ext=ext, nblk=nblk,
                                  interpret=True)
    assert ovf == 0
    return got, want


@pytest.mark.parametrize("ext", [True, False])
@pytest.mark.slow
def test_flat_text_identity(native, ext):
    got, want = run_flat(native, synthetic_text(40_000, seed=31), ext)
    assert got == want


def test_flat_zeros_identity(native):
    """Zero fills: every match runs the >=8-byte extend service and the
    64-byte codes; candidate chains walk in the repetitive region."""
    got, want = run_flat(native, bytes(20_000), True)
    assert got == want


def test_flat_zeros_noext(native):
    got, want = run_flat(native, bytes(6_000), False)
    assert got == want


def test_flat_random_identity(native):
    rng = np.random.default_rng(7)
    blk = rng.integers(0, 256, 16_384, dtype=np.uint8).tobytes()
    got, want = run_flat(native, blk, True)
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 5, 17, 33, 64, 513, 1025])
def test_flat_tiny_blocks(native, n):
    blk = (synthetic_text(2_000, seed=40))[:n]
    got, want = run_flat(native, blk, True)
    assert got == want


def test_flat_dense_alternation(native):
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(1200):
        parts.append(rng.integers(0, 256, 3, dtype=np.uint8).tobytes())
        parts.append(b"QWERTYUI")
    blk = b"".join(parts)
    got, want = run_flat(native, blk, True)
    assert got == want


@pytest.mark.slow
def test_flat_offset_window_edge(native):
    """Candidate at the 16-bit window edge + anchor-advancing trailing
    flush (the rewalk/revalidate paths, upstream tsq_encode.cpp:298)."""
    from tests.test_encode_emit import _window_edge_case

    for q in (65_500, 65_534, 65_560):
        got, want = run_flat(native, _window_edge_case(q), True)
        assert got == want


@pytest.mark.slow
def test_flat_dead_size_slot_shift(native):
    """Trailing EMPTY size slot gets residue << 4 when the tail loop runs
    (the r5 TokenSink regression) — layout_batch vs host bytes."""
    from tests.test_encode_emit import _dead_size_slot_case

    for k, blk in enumerate(list(_dead_size_slot_case())[:6]):
        got, want = run_flat(native, blk, True)
        assert got == want, f"trigger block {k}"


def test_flat_mixed_fills(native):
    blk = (synthetic_text(9_000, seed=51) + bytes(600)
           + synthetic_text(5_000, seed=52))
    got, want = run_flat(native, blk, True)
    assert got == want


def test_flat_dictionary_identity(native):
    d = synthetic_text(30_000, seed=34)
    blk = synthetic_text(8_000, seed=34)[4_000:] + bytes(2_000)
    concat = d + blk
    cand = native.build_candidates(concat)
    want = native.encode_block_dict(blk, d, cand, True)
    got, ovf = EF.flat_emit_block(concat, cand, ext=True, base=len(d),
                                  interpret=True)
    assert ovf == 0
    assert got == want


@pytest.mark.slow
def test_flat_fuzz_structured(native):
    """Randomized structured blocks: repeated phrases, fills, binary
    records, random tails — every decide path in one sweep."""
    rng = np.random.default_rng(99)
    words = [rng.integers(0, 256, rng.integers(3, 12),
                          dtype=np.uint8).tobytes() for _ in range(12)]
    for trial in range(6):
        parts = []
        budget = int(rng.integers(2_000, 20_000))
        while sum(map(len, parts)) < budget:
            r = rng.integers(0, 5)
            if r == 0:
                parts.append(bytes(int(rng.integers(1, 200))))
            elif r == 1:
                parts.append(words[int(rng.integers(0, len(words)))]
                             * int(rng.integers(1, 30)))
            elif r == 2:
                parts.append(rng.integers(0, 256,
                                          int(rng.integers(1, 400)),
                                          dtype=np.uint8).tobytes())
            else:
                parts.append(words[int(rng.integers(0, len(words)))])
        blk = b"".join(parts)[:budget]
        got, want = run_flat(native, blk, bool(trial % 2 == 0))
        assert got == want, f"trial {trial}"


@pytest.mark.slow
def test_flat_gang2_identity(native):
    """Two co-scheduled chains in one program produce the same bytes as
    two independent single-chain runs."""
    import jax.numpy as jnp
    from turbosqueeze_tpu.kernels.encode_emit import (
        pack_input_words, pack_cand_words, payload_from_words)

    blks = [synthetic_text(12_000, seed=61),
            synthetic_text(12_000, seed=62)[:9_000] + bytes(800)]
    iw, cw, meta = [], [], np.zeros((2, 8), np.int32)
    wants = []
    for k, blk in enumerate(blks):
        cand = native.build_candidates(blk)
        wants.append(native.encode_block_candidates(blk, cand, True,
                                                    level=1))
        iw.append(pack_input_words(blk))
        cw.append(pack_cand_words(np.asarray(cand, np.int32)))
        meta[k, 0] = len(blk)
    words, osz = EF.flat_emit_batch(
        jnp.asarray(np.stack(iw)), jnp.asarray(np.stack(cw)),
        jnp.asarray(meta), ext=True, nblk=2, desc_rows=128, out_rows=64,
        interpret=True)
    osz = np.asarray(osz)
    for k in range(2):
        assert osz[k, 2] == 0
        got = payload_from_words(np.asarray(words)[k], int(osz[k, 0]))
        assert got == wants[k], f"block {k}"
