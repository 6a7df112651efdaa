"""Gang-stream decode path: gang merger (csrc/tsq_gang.cpp) + the round-4
co-scheduled kernel (kernels/decode_gang.py), and its pipeline impl.

Runs interpreted on the CPU mesh like the other kernel suites; the
compiled path is covered by bench/ab_gang.py's verify-before-timing and
the TSQ_TEST_TPU smoke lane (test_tpu_smoke.py::test_gang_kernel_compiled).
"""

import subprocess

import numpy as np
import pytest

from turbosqueeze_tpu.kernels import decode_gang as DG
from turbosqueeze_tpu.parallel import pipeline
from turbosqueeze_tpu.utils.corpus import synthetic_binary, synthetic_text


@pytest.fixture(scope="module", autouse=True)
def _native():
    from turbosqueeze_tpu.runtime import native

    if not native.available():
        subprocess.run(["make", "-C", "csrc"], check=True)
        native._SEARCHED = False
    assert native.available()


def _decode_all(datas, levels, nblk, unroll=2, slot_recs=8):
    from turbosqueeze_tpu.runtime import native

    pe = [(native.compress(d, True, level=lv)[19:], True)
          for d, lv in zip(datas, levels)]
    planes = DG.prep_gang(pe, nblk, slot_recs)
    assert planes is not None
    lw, gw, gm, sizes = planes
    assert lw.shape[0] % nblk == 0
    host = np.asarray(DG.decode_gang_batch(lw, gw, gm, nblk=nblk,
                                           unroll=unroll, interpret=True,
                                           slot_recs=slot_recs))
    for k, d in enumerate(datas):
        got = host[k].reshape(-1).view("<u1")[:sizes[k]].tobytes()
        assert got == d, \
            f"gang{nblk}.{unroll}.{slot_recs} mismatch on block {k}"


@pytest.mark.parametrize("nblk", [1, 2, 3, 4])
@pytest.mark.slow
def test_nway_mixed_corpora(nblk):
    """Mixed levels and corpus classes, count not a multiple of nblk
    (empty-block padding), zeros block (FILL gangs)."""
    datas = [synthetic_text(700_000, seed=41),
             bytes(300_000),
             synthetic_binary(500_000, seed=43),
             synthetic_text(250_000, seed=44),
             np.random.default_rng(7).bytes(400_000)]
    _decode_all(datas, (0, 1, 2, 1, 0), nblk)


@pytest.mark.parametrize("nblk", [5, 6, 8])
@pytest.mark.slow
def test_wide_gangs_with_padding(nblk):
    """nblk >= 5 exercises the full 32-word gmeta ABI (sizes [0..7],
    n_win [8..15]) — a 16-word meta clobbered n_windows with sizes here
    and silently decoded block 0 to zeros. Block count (5) is not a
    multiple of nblk, so groups pad with empty blocks."""
    datas = [synthetic_text(180_000, seed=41),
             bytes(80_000),
             synthetic_binary(120_000, seed=43),
             synthetic_text(60_000, seed=44),
             np.random.default_rng(7).bytes(90_000)]
    _decode_all(datas, (0, 1, 2, 1, 0), nblk)


@pytest.mark.parametrize("unroll", [1, 4, 8])
@pytest.mark.slow
def test_unroll_variants(unroll):
    """Every legal round-loop unroll consumes the same padded stream
    (segments are padded to kGangAlignRounds = 8 rounds)."""
    datas = [synthetic_text(400_000, seed=45), bytes(100_000)]
    _decode_all(datas, (0, 2), 2, unroll)


@pytest.mark.parametrize("srecs", [16, 32])
def test_slot_recs_wide(srecs):
    """16/32-record slots (32/64-word gangs): same records, half/quarter
    the per-gang fixed costs; must stay bit-exact across mixed corpora."""
    datas = [synthetic_text(400_000, seed=45), bytes(100_000),
             synthetic_binary(300_000, seed=47)]
    _decode_all(datas, (0, 2, 1), 2, slot_recs=srecs)


def test_two_windows_tail_reach():
    """Multi-window block: U/W segments per window, tail staging between
    windows, matches reaching the previous window through the tail."""
    base = synthetic_text(64 * 1024, seed=11)
    data = (base * ((3 << 20) // len(base) + 1))[: (1 << 21) + 200_000]
    _decode_all([data], (1,), 1)


def test_gang_stream_geometry():
    """ABI invariants the kernel relies on: 16-word slots, row embedded
    in record 0 bits 19-30, segments multiples of kGangAlignRounds,
    boundaries monotone, stream length = rounds * nblk * 16."""
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text(300_000, seed=46)
    pe = [(native.compress(data, True, level=0)[19:], True)] * 3
    preps = [native.bulk_prep(p, e) for p, e in pe]
    rec, gm = native.bulk_gang([p[1] for p in preps],
                               [p[2] for p in preps])
    nblk, rounds = int(gm[31]), int(gm[30])
    assert nblk == 3
    assert len(rec) == rounds * nblk * 16
    bounds = [int(gm[16 + i]) for i in range(6)]
    assert bounds == sorted(bounds) and bounds[-1] == rounds
    assert all(b % 8 == 0 for b in bounds)  # kGangAlignRounds
    # identical blocks -> identical per-round slots; row bits present
    slots = rec.reshape(rounds, nblk, 16)
    assert (slots[:, 0] == slots[:, 1]).all()
    rows = (slots[:, :, 0] >> 19) & 0xFFF
    assert rows.max() < 4096
    # offsets stay 9-bit under the row bits
    assert ((slots[:, :, 0] >> 10) & 0x1FF).max() < 512


@pytest.mark.parametrize("impl", ["gang"])
@pytest.mark.slow
def test_pipeline_impl_gang_dictionary(impl):
    from turbosqueeze_tpu.runtime.api import compress

    d = synthetic_text(40_000, seed=51)
    data = synthetic_text(300_000, seed=52)
    stream = compress(data, dictionary=d, backend="native")
    assert pipeline.decompress(stream, impl=impl, dictionary=d) == data


@pytest.mark.slow
def test_pipeline_impl_gang_multiblock(tmp_path):
    """Gang through the public pipeline: group padding, ragged tail
    block, memory and file paths."""
    from turbosqueeze_tpu.runtime import native

    data = synthetic_text(2 * (1 << 22) + 54321, seed=19)
    stream = native.compress(data, True, level=1)
    assert pipeline.decompress(stream, impl="gang") == data
    out = tmp_path / "out_gang.bin"
    n = pipeline.decompress_to_file(stream, str(out), impl="gang")
    assert n == len(data)
    assert out.read_bytes() == data
