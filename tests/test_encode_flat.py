"""Sort-based layout pass (encode_flat.layout_batch): byte-identity vs
the host level-1 emission.

Descriptors are derived from the host payload itself (tokenize_block maps
1:1 onto descriptor words), so the test isolates the LAYOUT contract: the
closed-form position/slot/padding/dead-slot reconstruction must reproduce
every payload byte, including reserved trailing slots holding literal
over-copy bytes (TokenSink dead-slot rule, csrc tsq_core.cpp:83-86,
126-138).
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


def roundtrip_layout(native, blk, ext):
    cand = native.build_candidates(blk)
    want = native.encode_block_candidates(blk, cand, ext, level=1)
    desc = EF.descs_from_tokens(want, ext)
    got = EF.layout_block(blk, desc, ext=ext)
    return got, want


@pytest.mark.parametrize("ext", [True, False])
def test_layout_text_identity(native, ext):
    got, want = roundtrip_layout(native, synthetic_text(40_000, seed=31),
                                 ext)
    assert got == want


def test_layout_zeros_identity(native):
    got, want = roundtrip_layout(native, bytes(20_000), True)
    assert got == want


def test_layout_random_identity(native):
    rng = np.random.default_rng(7)
    blk = rng.integers(0, 256, 16_384, dtype=np.uint8).tobytes()
    got, want = roundtrip_layout(native, blk, True)
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 17, 33, 64, 513, 1025])
def test_layout_tiny_blocks(native, n):
    blk = (synthetic_text(2_000, seed=40))[:n]
    got, want = roundtrip_layout(native, blk, True)
    assert got == want


@pytest.mark.slow
def test_layout_dead_slot_sizes(native):
    """Sweep sizes around group boundaries so n_sym % 8 and % 2 hit every
    trailing-slot shape (dead ctrl, dead size, padded partial groups)."""
    text = synthetic_text(4_096, seed=44)
    for sz in range(900, 964):
        got, want = roundtrip_layout(native, text[:sz], True)
        assert got == want, f"size {sz}"


def test_layout_dense_alternation(native):
    rng = np.random.default_rng(3)
    parts = []
    for _ in range(600):
        parts.append(rng.integers(0, 256, 3, dtype=np.uint8).tobytes())
        parts.append(b"QWERTYUI")
    blk = b"".join(parts)
    got, want = roundtrip_layout(native, blk, True)
    assert got == want


def test_layout_window_edge(native):
    from tests.test_encode_emit import _window_edge_case

    for q in (65_500, 65_534, 65_560):
        got, want = roundtrip_layout(native, _window_edge_case(q), True)
        assert got == want


def test_layout_fills_ext(native):
    """Long zero fills exercise the 32/48/64-byte codes (nibbles 0-2)."""
    blk = synthetic_text(3_000, seed=45) + bytes(9_000) \
        + synthetic_text(2_000, seed=46)
    got, want = roundtrip_layout(native, blk, True)
    assert got == want
