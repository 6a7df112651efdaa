"""Bulk decode path: host resolver (csrc/tsq_bulk.cpp) + wave-free
record-stream kernel (kernels/decode_bulk.py), and its pipeline impl.

Runs interpreted on the CPU mesh like the other kernel suites; the
compiled path is covered by bench.py's verify-before-timing and the
TSQ_TEST_TPU smoke lane.
"""

import subprocess

import numpy as np
import pytest

from turbosqueeze_tpu import reference_codec as rc
from turbosqueeze_tpu.kernels import decode_bulk as DB
from turbosqueeze_tpu.parallel import pipeline
from turbosqueeze_tpu.utils.corpus import synthetic_binary, synthetic_text


@pytest.fixture(scope="module", autouse=True)
def _native():
    from turbosqueeze_tpu.runtime import native

    if not native.available():
        subprocess.run(["make", "-C", "csrc"], check=True)
        native._SEARCHED = False
    assert native.available()


def _roundtrip(data, level=0, ext=True):
    from turbosqueeze_tpu.runtime import native

    payload = native.compress(data, ext, level=level)[19:]
    out = DB.decode_bulk_block(payload, ext, interpret=True)
    assert out is not None, "unexpected bulk fallback"
    assert out == data


@pytest.mark.parametrize("level", [0, 1, 2])
@pytest.mark.slow
def test_corpus_classes(level):
    for data in (synthetic_text(96 * 1024, seed=3),
                 synthetic_binary(96 * 1024, seed=4),
                 bytes(128 * 1024),
                 np.random.default_rng(7).bytes(64 * 1024)):
        _roundtrip(data, level)


def test_noext():
    _roundtrip(synthetic_text(64 * 1024, seed=5), level=0, ext=False)


def test_two_windows_tail_reach():
    """Content straddling the 2 MiB kernel window with matches reaching
    the previous window through the 130-row tail region."""
    base = synthetic_text(64 * 1024, seed=11)
    # repeat with a long period so matches near the window boundary reach
    # ~64 KiB back across it
    data = (base * ((3 << 20) // len(base) + 1))[: (1 << 21) + 200_000]
    _roundtrip(data, level=1)


def test_anchor_before_window_edge():
    """A pair whose anchor sits just before a window boundary while its
    second symbol's dst lands after it (the 64-byte tail extension)."""
    rng = np.random.default_rng(23)
    data = rng.bytes(1 << 21) + bytes(100_000) + rng.bytes(50_000)
    _roundtrip(data, level=2)


def test_upstream_stream_decodes(golden_harness, tmp_path):
    data = synthetic_text(300_000, seed=31)
    fin = tmp_path / "in"
    ftsq = tmp_path / "a.tsq"
    fin.write_bytes(data)
    subprocess.run([str(golden_harness), "c", "1", str(fin), str(ftsq)],
                   check=True)
    stream = ftsq.read_bytes()
    payload = stream[19:]
    out = DB.decode_bulk_block(payload, True, interpret=True)
    assert out == data


def test_resolver_stats_zeros_collapse():
    """Constant chains must fold to FILL records — the measured wave-depth
    pathology (123k deep on zeros-class streams) costs nothing here."""
    from turbosqueeze_tpu.runtime import native

    payload = native.compress(bytes(1 << 20), True, level=1)[19:]
    lit, rec, meta = native.bulk_prep(payload, True)
    assert len(rec) <= 3 * 2048 * 4  # ~1 fill record per output row
    assert int(meta[2]) == 0  # no literal-plane bytes at all


def test_corrupt_stream_rejected():
    from turbosqueeze_tpu.format import FormatError
    from turbosqueeze_tpu.runtime import native

    payload = bytearray(native.compress(b"abcdef" * 1000, True)[19:])
    payload[10] ^= 0xFF
    try:
        r = native.bulk_prep(bytes(payload), True)
    except FormatError:
        return  # rejected: fine
    if r is None:
        return  # fallback: fine (the fused path validates)
    # if it parsed, the planes must still be internally consistent
    lit, rec, meta = r
    assert int(meta[3]) == len(rec)


@pytest.mark.slow
def test_fuzz_roundtrip():
    rng = np.random.default_rng(1234)
    for trial in range(6):
        n = int(rng.integers(1, 200_000))
        kind = trial % 3
        if kind == 0:
            data = synthetic_text(n, seed=trial)
        elif kind == 1:
            chunk = rng.bytes(max(n // 17, 1))
            data = (chunk * (n // len(chunk) + 1))[:n]
        else:
            data = rng.bytes(n)
        _roundtrip(data, level=int(rng.integers(0, 3)))


def test_two_block_coschedule():
    """The K=2 kernel (merged alternating streams, separate scratch refs)
    must agree bit-exactly, including the odd-count empty-block pad."""
    from turbosqueeze_tpu.runtime import native

    datas = [synthetic_text(700_000, seed=41),
             bytes(300_000),
             synthetic_binary(500_000, seed=43)]  # odd count -> pad
    pe = [(native.compress(d, True, level=lv)[19:], True)
          for d, lv in zip(datas, (0, 1, 2))]
    planes = DB.prep_batch2(pe)
    assert planes is not None
    lw, rw, m2, sizes = planes
    host = np.asarray(DB.decode_bulk2_batch(lw, rw, m2, interpret=True))
    for k, d in enumerate(datas):
        assert host[k].reshape(-1).view("<u1")[:sizes[k]].tobytes() == d


@pytest.mark.parametrize("nblk", [3, 4])
@pytest.mark.slow
def test_nway_coschedule(nblk):
    """The general N-way kernel (round-robin merged streams, one scratch
    pair per block) must agree bit-exactly across mixed levels and the
    pad-to-multiple empty blocks."""
    from turbosqueeze_tpu.runtime import native

    datas = [synthetic_text(700_000, seed=41),
             bytes(300_000),
             synthetic_binary(500_000, seed=43),
             synthetic_text(250_000, seed=44),
             np.random.default_rng(7).bytes(400_000)]  # 5 -> pad to 6/8
    pe = [(native.compress(d, True, level=lv)[19:], True)
          for d, lv in zip(datas, (0, 1, 2, 1, 0))]
    planes = DB.prep_batchn(pe, nblk)
    assert planes is not None
    lw, rw, mn, sizes = planes
    assert lw.shape[0] % nblk == 0
    host = np.asarray(DB.decode_bulkn_batch(lw, rw, mn, nblk=nblk,
                                            interpret=True))
    for k, d in enumerate(datas):
        assert host[k].reshape(-1).view("<u1")[:sizes[k]].tobytes() == d


def test_coschedule_fit_budget():
    """VMEM auto-fit: small literal planes admit 4-way co-scheduling,
    full-block literal planes cap at lower N."""
    assert DB.best_coschedule(64) == 4
    assert DB.best_coschedule(DB.rows_for_bytes(1 << 22)) <= 2
    assert DB.best_coschedule(10**9) == 1


@pytest.mark.slow
def test_pipeline_impl_bulk_multiblock():
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text(2 * (1 << 22) + 54321, seed=17)
    stream = native.compress(data, True, level=1)
    assert pipeline.decompress(stream, impl="bulk") == data


def test_bulk_dictionary_decode():
    """Resolver dict mode: the preset dictionary is staged as a
    literal-plane copy in the dict-extended output space (third 2 MiB
    window when needed); matches reaching into the dictionary resolve
    like any literal interval."""
    from turbosqueeze_tpu.format import iter_container
    from turbosqueeze_tpu.runtime import native

    d = synthetic_text(50_000, seed=91)
    data = synthetic_text(100_000, seed=92) + bytes(4_000)
    stream = native.compress_dict(data, d, True, level=1)
    blocks = [(p, e) for _, p, e in iter_container(stream)]
    got = DB.decode_bulk_block(blocks[0][0], blocks[0][1], interpret=True,
                               dictionary=d)
    assert got == data


@pytest.mark.parametrize("impl", ["bulk", "bulk2", "bulkn"])
@pytest.mark.slow
def test_pipeline_impl_bulk_dictionary(impl):
    from turbosqueeze_tpu.runtime import native

    d = synthetic_text(40_000, seed=93)
    data = synthetic_text(90_000, seed=94)
    stream = native.compress_dict(data, d, True, level=1)
    assert pipeline.decompress(stream, impl=impl, dictionary=d) == data


@pytest.mark.slow
def test_decompress_to_file_bulk(tmp_path):
    """Per-host file writes through the bulk kernels (CLI file path)."""
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text((1 << 22) + 60_000, seed=95)  # 2 blocks
    stream = native.compress(data, True, level=1)
    for impl in ("bulk", "bulk2", "bulkn"):
        out = tmp_path / f"out_{impl}.bin"
        n = pipeline.decompress_to_file(stream, str(out), impl=impl)
        assert n == len(data)
        assert out.read_bytes() == data


@pytest.mark.slow
def test_pipeline_impl_bulk2_multiblock():
    """Co-scheduled pair kernel through the public pipeline: odd block
    count (pair padding) and a ragged tail block."""
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text(2 * (1 << 22) + 54321, seed=18)
    stream = native.compress(data, True, level=1)
    assert pipeline.decompress(stream, impl="bulk2") == data


@pytest.mark.slow
def test_pipeline_impl_bulkn_multiblock():
    """Auto N-way co-schedule through the public pipeline: group padding
    (3 real blocks in groups of N) and a ragged tail block."""
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text(2 * (1 << 22) + 54321, seed=19)
    stream = native.compress(data, True, level=1)
    assert pipeline.decompress(stream, impl="bulkn") == data
