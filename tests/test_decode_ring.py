"""decode_ring: the K-stream sliding-window fused decoder (interpret mode).

This kernel is the bounded-VMEM multi-stream variant of the fused decoder
(see BASELINE.md round-2 notes for why the single-stream kernel remains
the throughput default). Correctness surface: sliding-window rebase,
amortized eviction, far offsets at the reachback edge, dictionaries, and
unequal-length stream sets.
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from turbosqueeze_tpu.format import iter_container
from turbosqueeze_tpu.kernels import decode_ring as DR
from turbosqueeze_tpu.kernels import decode_stream as DS
from turbosqueeze_tpu.kernels import decode_tokens as DK
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


def decode_ring(native, data, ext, K, dictionary=None, pay_rows=1024,
                out_rows=1032):
    if dictionary is not None:
        stream = native.compress_dict(data, dictionary, ext)
    else:
        stream = native.compress(data, ext)
    blocks = [(p, e) for _, p, e in iter_container(stream)]
    n = len(blocks)
    B = -(-n // K) * K
    pw = np.zeros((B, pay_rows, 128), np.int32)
    exts, sizes = [], []
    for b, (p, e) in enumerate(blocks):
        pw[b] = DK.pack_payload_words(p, pay_rows=pay_rows)
        exts.append(e)
        sizes.append(p[0] | (p[1] << 8) | (p[2] << 16))
    dlen = len(dictionary) if dictionary else 0
    meta = DS.pack_meta(exts + [False] * (B - n), sizes + [0] * (B - n),
                        dict_len=dlen)
    dw = DS.pack_dict_words(dictionary) if dictionary else None
    host = np.asarray(DR.decode_ring_batch(
        pw, meta, dw, interpret=True, out_rows=out_rows, streams=K))
    parts = []
    for b in range(n):
        parts.append(host[b].reshape(-1).view("<u1")
                     [dlen:dlen + sizes[b]].tobytes())
    return b"".join(parts)


def test_multiwrap_rebase(native):
    """> 3 window rebases + ~50 eviction chunks on one stream."""
    data = synthetic_text(420_000, seed=201)
    assert decode_ring(native, data, True, 1) == data


def test_far_offsets_at_reachback_edge(native):
    period = synthetic_text(65_200, seed=202)
    data = (period * 5)[:300_000]
    assert decode_ring(native, data, True, 1) == data
    assert decode_ring(native, data, False, 1) == data


def test_dict_with_rebase(native):
    d = synthetic_text(50_000, seed=203)
    data = d[:30_000] + synthetic_text(250_000, seed=204)
    assert decode_ring(native, data, True, 2, dictionary=d) == data


def test_unequal_streams(native):
    """Streams of very different lengths: finished streams freeze while
    the longest keeps decoding (the dead-clamp path)."""
    texts = [synthetic_text(n, seed=205 + n)
             for n in (150_000, 8_000, 200_000, 500)]
    streams = [native.compress(t, True) for t in texts]
    pays = [next(iter_container(s))[1] for s in streams]
    B = K = 4
    pw = np.zeros((B, 1024, 128), np.int32)
    sizes = []
    for b, p in enumerate(pays):
        pw[b] = DK.pack_payload_words(p, pay_rows=1024)
        sizes.append(p[0] | (p[1] << 8) | (p[2] << 16))
    meta = DS.pack_meta([True] * 4, sizes)
    host = np.asarray(DR.decode_ring_batch(pw, meta, None, interpret=True,
                                           out_rows=1032, streams=4))
    for b, want in enumerate(texts):
        got = host[b].reshape(-1).view("<u1")[:len(want)].tobytes()
        assert got == want, f"stream {b} mismatch"


def test_corrupt_stream_is_contained(native):
    """Bit-flipped payloads decode to garbage without leaving the window
    (no crash, other streams in the batch unaffected)."""
    good = synthetic_text(120_000, seed=206)
    stream = native.compress(good, True)
    blocks = [(p, e) for _, p, e in iter_container(stream)]
    p, e = blocks[0]
    bad = bytearray(p)
    for i in range(40, len(bad), 997):
        bad[i] ^= 0x5A
    pw = np.zeros((2, 1024, 128), np.int32)
    pw[0] = DK.pack_payload_words(bytes(bad), pay_rows=1024)
    pw[1] = DK.pack_payload_words(p, pay_rows=1024)
    size = p[0] | (p[1] << 8) | (p[2] << 16)
    meta = DS.pack_meta([e, e], [size, size])
    host = np.asarray(DR.decode_ring_batch(pw, meta, None, interpret=True,
                                           out_rows=1032, streams=2))
    got_good = host[1].reshape(-1).view("<u1")[:size].tobytes()
    assert got_good == good


def test_ring_through_pipeline(native):
    """impl='ring' is reachable through the public decompress pipeline."""
    from turbosqueeze_tpu.parallel import pipeline

    data = synthetic_text(250_000, seed=207)
    stream = native.compress(data, True)
    assert pipeline.decompress(stream, impl="ring") == data
