"""Async job engine: callbacks, chaining, stress, drain-on-close.

Mirrors the upstream async test suite (test/test.cpp: async lifecycle,
async chaining, massive async) at framework level.
"""

import threading

import pytest

from turbosqueeze_tpu.runtime.jobs import JobEngine
from turbosqueeze_tpu.utils.corpus import synthetic_text


@pytest.fixture(scope="module")
def payloads():
    return [synthetic_text(20_000, seed=s) for s in range(4)]


def test_sync_roundtrip(payloads):
    with JobEngine() as eng:
        for data in payloads:
            assert eng.decompress(eng.compress(data)) == data


def test_async_callbacks(payloads):
    events = []
    done = threading.Event()

    def on_complete(jobid, success):
        events.append((jobid, success))
        done.set()

    with JobEngine() as eng:
        job = eng.submit_compress(payloads[0], on_complete=on_complete)
        stream = job.result(timeout=30)
        assert done.wait(timeout=30)
    assert events == [(job.jobid, True)]
    assert stream[:4] == b"TSQ1"


def test_progress_reported(payloads):
    fractions = []
    with JobEngine() as eng:
        job = eng.submit_compress(
            payloads[1], on_progress=lambda j, f: fractions.append(f))
        job.result(timeout=30)
    assert fractions[0] == 0.0 and fractions[-1] == 1.0


def test_async_chaining(payloads):
    """Submit a decompress job from inside a compress completion callback
    (upstream test_tsq_decompress_async_mt pattern). The chain must stay
    non-blocking: callbacks run on worker threads and must not wait on the
    jobs they spawn."""
    result = {}
    done = threading.Event()
    eng = JobEngine(n_workers=2)

    def stage3(jobid, success):
        done.set()

    submitted = threading.Event()
    chained = threading.Event()

    def stage2(jobid, success):
        assert success
        submitted.wait(30)  # the callback may outrun submit() returning
        result["dec"] = eng.submit_decompress(result["comp"].result(30),
                                              on_complete=stage3)
        chained.set()

    result["comp"] = eng.submit_compress(payloads[2], on_complete=stage2)
    submitted.set()
    assert done.wait(timeout=30)
    assert chained.wait(timeout=30)
    assert result["dec"].result(timeout=30) == payloads[2]
    eng.close()


def test_jobids_monotonic(payloads):
    with JobEngine() as eng:
        jobs = [eng.submit_compress(payloads[0]) for _ in range(5)]
        ids = [j.jobid for j in jobs]
        assert ids == sorted(ids) and len(set(ids)) == 5
        for j in jobs:
            j.result(timeout=30)


def test_failure_in_band():
    """A bad job reports success=False via callback and captures the error
    without raising across the worker boundary."""
    events = []
    with JobEngine() as eng:
        job = eng.submit_decompress(
            b"NOT A TSQ STREAM" * 4,
            on_complete=lambda j, ok: events.append(ok))
        with pytest.raises(Exception):
            job.result(timeout=30)
    assert events == [False]
    assert not job.success


def test_massive_async(payloads):
    """200 chained compress->decompress jobs through one engine."""
    with JobEngine(n_workers=4) as eng:
        jobs = [eng.submit_compress(payloads[i % 4]) for i in range(200)]
        streams = [j.result(timeout=60) for j in jobs]
        decs = [eng.submit_decompress(s) for s in streams]
        outs = [d.result(timeout=60) for d in decs]
    assert all(outs[i] == payloads[i % 4] for i in range(200))


def test_file_jobs(tmp_path, payloads):
    src = tmp_path / "src"
    dst = tmp_path / "out.tsq"
    back = tmp_path / "back"
    src.write_bytes(payloads[3])
    with JobEngine() as eng:
        eng.submit_compress(in_path=str(src), out_path=str(dst)).result(30)
        eng.submit_decompress(in_path=str(dst), out_path=str(back)).result(30)
    assert back.read_bytes() == payloads[3]


def test_submit_validation():
    with JobEngine() as eng:
        with pytest.raises(ValueError):
            eng.submit_compress()  # neither data nor path
        with pytest.raises(ValueError):
            eng.submit_compress(b"x", in_path="/nope")


def test_close_drains(payloads):
    eng = JobEngine()
    jobs = [eng.submit_compress(payloads[0]) for _ in range(8)]
    eng.close()
    assert all(j.future.done() for j in jobs)
    with pytest.raises(RuntimeError):
        eng.submit_compress(payloads[0])


def test_jobs_compression_levels(payloads):
    """The level knob flows through the engine; higher levels shrink
    compressible payloads and roundtrip exactly."""
    data = payloads[0] * 8
    with JobEngine(n_workers=2) as eng:
        s0 = eng.compress(data, level=0)
        s2 = eng.compress(data, level=2)
        assert eng.decompress(s0) == data
        assert eng.decompress(s2) == data
    assert len(s2) <= len(s0)


def test_per_block_progress_fractions(tmp_path):
    """Multi-block jobs report intermediate per-block fractions, not just
    the endpoints (upstream writer-thread parity, tsq_threads.cpp:248-254)."""
    from turbosqueeze_tpu.runtime.jobs import JobEngine
    from turbosqueeze_tpu.utils.corpus import synthetic_text

    data = synthetic_text(3 * (1 << 22) + 999, seed=81)  # 4 blocks
    fractions = []
    with JobEngine(backend="native") as eng:
        stream = eng.submit_compress(
            data, on_progress=lambda j, f: fractions.append(f)).result(120)
    assert fractions[0] == 0.0 and fractions[-1] == 1.0
    mids = [f for f in fractions if 0.0 < f < 1.0]
    assert len(mids) >= 3, fractions       # 4 blocks -> 3 interior ticks
    assert fractions == sorted(fractions)  # monotone

    # file-to-file jobs stream through the native windowed pipeline and
    # report the same per-block fractions
    src = tmp_path / "in.bin"
    dst = tmp_path / "out.tsq"
    back = tmp_path / "back.bin"
    src.write_bytes(data)
    fr2, fr3 = [], []
    with JobEngine(backend="native") as eng:
        n = eng.submit_compress(
            in_path=str(src), out_path=str(dst),
            on_progress=lambda j, f: fr2.append(f)).result(120)
        assert n == dst.stat().st_size
        eng.submit_decompress(
            in_path=str(dst), out_path=str(back),
            on_progress=lambda j, f: fr3.append(f)).result(120)
    assert back.read_bytes() == data
    assert len([f for f in fr2 if 0.0 < f < 1.0]) >= 3
    assert len([f for f in fr3 if 0.0 < f < 1.0]) >= 3
