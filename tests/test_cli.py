"""CLI verb tests (upstream sample/main.cpp parity + framework verbs)."""

from turbosqueeze_tpu.cli import main
from turbosqueeze_tpu.utils.corpus import synthetic_text


def test_compress_decompress_verbs(tmp_path, capsys):
    data = synthetic_text(200_000, seed=9)
    src = tmp_path / "src"
    tsq = tmp_path / "a.tsq"
    out = tmp_path / "out"
    src.write_bytes(data)

    assert main(["c", str(src), str(tsq)]) == 0
    assert tsq.read_bytes()[:4] == b"TSQ1"
    assert main(["d", str(tsq), str(out)]) == 0
    assert out.read_bytes() == data
    assert "MB/s" in capsys.readouterr().out


def test_no_ext_flag(tmp_path):
    data = synthetic_text(50_000)
    src = tmp_path / "src"
    tsq = tmp_path / "a.tsq"
    src.write_bytes(data)
    assert main(["c", str(src), str(tsq), "--no-ext"]) == 0
    # ext bit must be clear in every block header
    from turbosqueeze_tpu.format import scan_block_table

    _, table = scan_block_table(tsq.read_bytes())
    assert all(not ext for _, _, ext in table)


def test_info_and_verify(tmp_path, capsys):
    data = synthetic_text(100_000, seed=3)
    src = tmp_path / "src"
    tsq = tmp_path / "a.tsq"
    src.write_bytes(data)
    main(["c", str(src), str(tsq)])
    assert main(["info", str(tsq), "--blocks"]) == 0
    out = capsys.readouterr().out
    assert "1 blocks" in out and "block 0" in out
    assert main(["verify", str(src), str(tsq)]) == 0


def test_bench_small(capsys):
    assert main(["b", "--size", "1"]) == 0
    out = capsys.readouterr().out
    assert "roundtrip OK" in out


def test_oracle_backend(tmp_path):
    data = synthetic_text(10_000)
    src = tmp_path / "src"
    tsq = tmp_path / "a.tsq"
    out = tmp_path / "out"
    src.write_bytes(data)
    assert main(["--backend", "oracle", "c", str(src), str(tsq)]) == 0
    assert main(["--backend", "oracle", "d", str(tsq), str(out)]) == 0
    assert out.read_bytes() == data
