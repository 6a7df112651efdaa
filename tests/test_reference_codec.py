"""Oracle codec roundtrip + golden byte-parity vs the compiled C++ reference."""

import subprocess

import pytest

from turbosqueeze_tpu import reference_codec as rc
from turbosqueeze_tpu.utils.corpus import incompressible, synthetic_text


@pytest.mark.parametrize("ext", [False, True])
def test_roundtrip_cases(corpus_cases, ext):
    for data in corpus_cases:
        payload = rc.encode_block(data, ext)
        assert rc.decode_block(payload, ext) == data


@pytest.mark.parametrize("ext", [False, True])
def test_container_roundtrip(ext):
    data = synthetic_text(50_000)
    stream = rc.compress(data, ext)
    assert stream[:4] == b"TSQ1"
    assert rc.decompress(stream) == data


def test_container_empty():
    assert rc.decompress(rc.compress(b"")) == b""


def test_compressible_actually_compresses():
    data = synthetic_text(50_000)
    assert len(rc.encode_block(data, True)) < len(data) * 0.8


def test_incompressible_bounded_expansion():
    data = incompressible(10_000)
    payload = rc.encode_block(data, False)
    # worst case: 16-byte literals cost 17.125/16 plus 5 fixed bytes
    assert len(payload) <= len(data) * 1.25 + 16


@pytest.mark.parametrize("ext", [0, 1])
def test_golden_encode_byte_parity(golden_harness, corpus_cases, tmp_path, ext):
    """Our encoder must reproduce the reference encoder byte-for-byte under
    the zero-initialized-buffer convention."""
    for n, data in enumerate(corpus_cases):
        fin = tmp_path / "in"
        fout = tmp_path / "out"
        fin.write_bytes(data)
        subprocess.run(
            [str(golden_harness), "eb", str(ext), str(fin), str(fout)],
            check=True,
        )
        ref = fout.read_bytes()
        mine = rc.encode_block(data, bool(ext))
        assert mine == ref, f"case {n} (len {len(data)}, ext={ext})"


@pytest.mark.parametrize("ext", [0, 1])
def test_golden_cross_decode(golden_harness, corpus_cases, tmp_path, ext):
    """Reference decoder must decode our payloads; our decoder must decode
    reference payloads."""
    for data in corpus_cases:
        fin = tmp_path / "in"
        fmid = tmp_path / "mid"
        fout = tmp_path / "out"
        # ours -> reference decoder
        fmid.write_bytes(rc.encode_block(data, bool(ext)))
        subprocess.run(
            [str(golden_harness), "db", str(ext), str(fmid), str(fout)],
            check=True,
        )
        assert fout.read_bytes() == data
        # reference encoder -> our decoder
        fin.write_bytes(data)
        subprocess.run(
            [str(golden_harness), "eb", str(ext), str(fin), str(fmid)],
            check=True,
        )
        assert rc.decode_block(fmid.read_bytes(), bool(ext)) == data


def test_golden_container_parity(golden_harness, tmp_path):
    """Whole-file container: reference tsqCompress output must decompress
    with our code and vice versa."""
    data = synthetic_text(150_000, seed=5)
    fin = tmp_path / "in"
    ftsq = tmp_path / "a.tsq"
    fdec = tmp_path / "dec"
    fin.write_bytes(data)
    for ext in (0, 1):
        subprocess.run([str(golden_harness), "c", str(ext), str(fin), str(ftsq)], check=True)
        assert rc.decompress(ftsq.read_bytes()) == data
        ftsq.write_bytes(rc.compress(data, bool(ext)))
        subprocess.run([str(golden_harness), "d", str(ftsq), str(fdec)], check=True)
        assert fdec.read_bytes() == data


def test_decode_rejects_oversized_block():
    bad = bytes([0xFF, 0xFF, 0xFF]) + bytes(10)
    with pytest.raises(Exception):
        rc.decode_block(bad, False)
