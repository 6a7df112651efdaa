"""Mixed-corpus compressed-size parity sweep vs the upstream binary
(BASELINE config 3 — Silesia stand-in; no egress, so the file classes are
synthesized: wiki-ish text, structured binary records, zeros, and
incompressible bytes).

Contract per file class and level:
  level 0 -> byte-identical container to the upstream binary (same parse);
  level 1 -> <= upstream size (exact candidates beat the lossy table);
  level 2 -> <= level 1 (lazy parse only ever defers for a longer match).
"""

import hashlib
import subprocess
from pathlib import Path

import pytest

from turbosqueeze_tpu.utils.corpus import ratio_sweep_files, real_files

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def native():
    from turbosqueeze_tpu.runtime import native as mod

    if not mod.available():
        subprocess.run(["make", "-C", str(REPO / "csrc")], check=True)
        mod._SEARCHED = False
    assert mod.available()
    return mod


@pytest.fixture(scope="module")
def harness(golden_harness):
    return golden_harness


def corpus_files():
    return ratio_sweep_files()


def test_real_corpus_provenance():
    """The bundled real-data classes decompress to the exact bytes the
    NOTICE.md documents (tests/data/real) — ratio evidence is only as
    good as the corpus's integrity."""
    want = {
        "real-licenses": ("ebfaf0e33f92e6df", 303_417),
        "real-pydoc": ("78c41895369593e2", 517_537),
        "real-source": ("14a1a8f2e71ccf09", 4_626_393),
        "real-binary": ("758eaea181397672", 3_732_501),
    }
    files = real_files()
    assert set(files) == set(want), "real corpus bundle incomplete"
    for name, data in files.items():
        digest = hashlib.sha256(data).hexdigest()[:16]
        assert (digest, len(data)) == want[name], f"{name} corrupted"


def ref_size(harness, tmp_path, name, data, ext):
    src = tmp_path / f"{name}.bin"
    dst = tmp_path / f"{name}.tsq"
    src.write_bytes(data)
    subprocess.run([str(harness), "c", "1" if ext else "0", str(src),
                    str(dst)], check=True)
    return dst.stat().st_size, dst.read_bytes()


@pytest.mark.parametrize("ext", [True, False])
def test_ratio_parity_sweep(native, harness, tmp_path, ext):
    rows = []
    for name, data in corpus_files().items():
        rsize, rbytes = ref_size(harness, tmp_path, name, data, ext)
        s0 = native.compress(data, ext, level=0)
        s1 = native.compress(data, ext, level=1)
        s2 = native.compress(data, ext, level=2)
        # level 0 reproduces the upstream parse bit-for-bit
        assert s0 == rbytes, f"{name}: level-0 container differs"
        assert len(s1) <= rsize, f"{name}: level 1 larger than upstream"
        assert len(s2) <= len(s1), f"{name}: level 2 larger than level 1"
        # everything roundtrips
        assert native.decompress(s2) == data
        # format compatibility: the UPSTREAM BINARY decodes our level-1
        # and level-2 streams (same bitstream format, better parse)
        for lvl, stream in (("l1", s1), ("l2", s2)):
            sp = tmp_path / f"{name}.{lvl}.tsq"
            dp = tmp_path / f"{name}.{lvl}.out"
            sp.write_bytes(stream)
            subprocess.run([str(harness), "d", str(sp), str(dp)],
                           check=True)
            assert dp.read_bytes() == data, (
                f"{name}: upstream cannot decode our {lvl} stream")
        rows.append((name, rsize, len(s0), len(s1), len(s2)))
    # table printed for the bench log (pytest -s)
    print(f"\nratio sweep (ext={ext}), 1 MiB per class:")
    print(f"{'file':16s} {'upstream':>10s} {'lvl0':>10s} {'lvl1':>10s} "
          f"{'lvl2':>10s}")
    for name, r, a, b, c in rows:
        print(f"{name:16s} {r:10,d} {a:10,d} {b:10,d} {c:10,d}")
