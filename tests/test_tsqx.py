"""TSQX serving profile: pack -> device gang decode -> original bytes.

The pack side runs the same resolver/merger the gang decode path uses
per decode (csrc/tsq_bulk.cpp, tsq_gang.cpp), so byte correctness here
leans on the same kernel; what these tests pin down is the container
round trip, the zero-copy view geometry, and the API/CLI sniffing.
"""

import numpy as np
import pytest

from turbosqueeze_tpu import tsqx
from turbosqueeze_tpu.utils.corpus import synthetic_binary, synthetic_text


@pytest.fixture(scope="module")
def native():
    from turbosqueeze_tpu.runtime import native as n

    if not n.available():
        import subprocess

        subprocess.run(["make", "-C", "csrc"], check=True)
        n._SEARCHED = False
    assert n.available()
    return n


def test_view_geometry(native):
    data = synthetic_text(300_000, seed=91)
    packed = tsqx.pack(native.compress(data, True), nblk=2)
    v = tsqx.TsqxView(packed)
    assert v.n_blocks == 1 and v.nblk == 2 and v.n_pad == 2
    assert v.total_size == len(data)
    assert v.sizes == [len(data)]
    assert v.lit_words.shape == (2, v.lit_rows, 128)
    assert v.gang_words.shape == (1, v.rec_rows, 128)
    assert v.gmeta.shape[1] == 32


def test_roundtrip_multiblock(native):
    data = synthetic_text((1 << 22) + 70_000, seed=92)  # 2 blocks
    packed = tsqx.pack(native.compress(data, True), nblk=2)
    assert tsqx.is_tsqx(packed)
    assert tsqx.decompress(packed) == data


@pytest.mark.slow
def test_roundtrip_nblk4_mixed(native):
    data = (synthetic_text(1 << 22, seed=93)
            + synthetic_binary((1 << 22) + 5_000, seed=94)
            + bytes(200_000))
    packed = tsqx.pack(native.compress(data, True, level=2), nblk=4)
    assert tsqx.decompress(packed) == data


def test_api_sniffs_tsqx(native):
    from turbosqueeze_tpu.runtime.api import decompress

    data = synthetic_binary(150_000, seed=95)
    packed = tsqx.pack(native.compress(data, False), nblk=1)
    assert decompress(packed) == data


def test_empty_container(native):
    packed = tsqx.pack(native.compress(b"", True))
    assert tsqx.decompress(packed) == b""


def test_cli_pack_verb(native, tmp_path):
    from turbosqueeze_tpu.cli import main

    data = synthetic_text(200_000, seed=96)
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    tsq = tmp_path / "a.tsq"
    tsqx_f = tmp_path / "a.tsqx"
    out = tmp_path / "out.bin"
    assert main(["c", str(src), str(tsq)]) == 0
    assert main(["x", str(tsq), str(tsqx_f), "--nblk", "2"]) == 0
    assert main(["d", str(tsqx_f), str(out)]) == 0
    assert out.read_bytes() == data
