"""True multi-process (multi-host analog) pipeline test.

Spawns two jax.distributed processes on this machine (DCN stand-in:
localhost TCP), each owning 4 virtual CPU devices; the sharded decompress
runs over the global 8-device mesh with the ordered cross-process gather.
This is BASELINE.json config 5's code path at miniature scale.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_decompress(tmp_path):
    from turbosqueeze_tpu.runtime import native
    from turbosqueeze_tpu.utils.corpus import synthetic_text

    data = synthetic_text(3 * (1 << 20) + 12345, seed=61)
    stream = native.compress(data, True)
    stream_path = tmp_path / "in.tsq"
    out_path = tmp_path / "out.bin"
    stream_path.write_bytes(stream)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests/multihost_worker.py"),
             coordinator, "2", str(pid), str(stream_path), str(out_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=840) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]
    assert out_path.read_bytes() == data
    # per-host file writes (decompress_to_file): every process wrote its
    # own blocks; the assembled file must still be exact and in order
    assert Path(str(out_path) + ".perhost").read_bytes() == data
    # 2-process sharded COMPRESS: the container must match the
    # single-process level-1 parse byte-for-byte and roundtrip
    restream = Path(str(out_path) + ".tsq2").read_bytes()
    assert restream == native.compress(data, True, level=1)
    assert native.decompress(restream) == data
    # the chunked host-0 KV assembly measured its own throughput (worker
    # tail); it must have run, verified, and reported a positive number
    kv = [ln for ln in outs[0][0].decode().splitlines()
          if ln.startswith("KV_HOST0_MBPS")]
    assert kv, "worker 0 did not report the KV assembly measurement"
    assert float(kv[0].split()[1]) > 0
    print(f"host-0 KV assembly: {kv[0].split()[1]} MB/s cross-host")
