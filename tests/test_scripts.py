"""Wrapper-script and checkpoint coverage: the reference CI smoke test
(shoot_peng on MafK_100seqs, .travis.yml:23), pwm2iupac, and the
checkpoint/resume cycle."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "tests", "golden")


def _env_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_shoot_peng_smoke(tmp_path):
    """The reference CI quality gate: exit-0 of
    shoot_peng.py MafK_100seqs.fasta -w 6 --no-scoring -o out
    (reference: .travis.yml:23)."""
    out = tmp_path / "test.out"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "shoot_peng.py"),
         os.path.join(GOLDEN, "MafK_100seqs.fasta"),
         "-w", "6", "--no-scoring", "--silent", "-o", str(out),
         "-j", str(tmp_path / "test.json")],
        env=_env_cpu(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    content = out.read_text()
    assert content.startswith("MEME version 4")
    assert "zoops_score= nan" in content
    data = json.loads((tmp_path / "test.json").read_text())
    assert data["patterns"]
    assert all("zoops_score" in p for p in data["patterns"])


def test_shoot_peng_requires_output_file():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "shoot_peng.py"),
         os.path.join(GOLDEN, "MafK_100seqs.fasta")],
        env=_env_cpu(), capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1


def test_pwm2iupac(tmp_path):
    pwm = tmp_path / "x.pwm"
    pwm.write_text(
        "0.97 0.01 0.01 0.01\n"
        "0.01 0.485 0.485 0.02\n"   # S (C/G)
        "0.25 0.25 0.25 0.25\n"     # N
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "pwm2iupac.py"),
         str(pwm)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ASN"


def test_pwm2iupac_rejects_bad_rows(tmp_path):
    pwm = tmp_path / "bad.pwm"
    pwm.write_text("0.9 0.9 0.9 0.9\n")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "pwm2iupac.py"),
         str(pwm)],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 1


def test_checkpoint_roundtrip(tmp_path):
    """Resumed run must produce byte-identical output to the counting
    run, and a config-mismatched checkpoint must fail cleanly."""
    from peng_motif_tpu.cli import main
    import contextlib
    import io

    fasta = os.path.join(GOLDEN, "MafK_100seqs.fasta")
    ckpt = str(tmp_path / "ckpt")
    out1, out2 = str(tmp_path / "a.meme"), str(tmp_path / "b.meme")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main([fasta, "-w", "8", "-o", out1,
                     "--save-checkpoint", ckpt]) == 0
        assert main([fasta, "-w", "8", "-o", out2,
                     "--load-checkpoint", ckpt]) == 0
    assert open(out1, "rb").read() == open(out2, "rb").read()
    assert os.path.exists(os.path.join(ckpt, "bg.hbcp"))

    # config mismatch: counting ran at w=8, resume requests w=6
    with contextlib.redirect_stdout(buf):
        rc = main([fasta, "-w", "6", "-o", str(tmp_path / "c.meme"),
                   "--load-checkpoint", ckpt])
    assert rc == 1


def test_missing_input_file_matches_reference(capsys):
    """Missing FASTA: "Error: Cannot open FASTA file: <path>" on stderr,
    rc=1 (reference: src/shared/SequenceSet.cpp:445-448)."""
    from peng_motif_tpu.cli import main

    rc = main(["/nonexistent_peng_input.fa", "-w", "8"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "Error: Cannot open FASTA file: /nonexistent_peng_input.fa" in err


def test_background_model_bamm_roundtrip(tmp_path):
    """BaMM-format write/read (reference: BackgroundModel.cpp:94-164,
    406-488) preserves the conditionals."""
    from peng_motif_tpu.io.fasta import load_sequence_set
    from peng_motif_tpu.models.background import BackgroundModel

    seqs = load_sequence_set(os.path.join(GOLDEN, "MafK_100seqs.fasta"))
    bg = BackgroundModel(seqs.sequences, order=2, interpolate=True)
    bg.name = "m"
    path = bg.write(str(tmp_path))
    loaded = BackgroundModel.read(path)
    assert loaded.order == bg.order
    for k in range(3):
        np.testing.assert_allclose(loaded.v[k], bg.v[k], rtol=2e-6)


def test_count_kmers_vectorized_matches_loop():
    from peng_motif_tpu.models.background import count_kmers, _count_kmers_loop

    rng = np.random.default_rng(5)
    for trial in range(4):
        seqs = [rng.integers(0, 5, size=rng.integers(0, 40)).astype(np.uint8)
                for _ in range(11)]
        for order in (0, 2, 3):
            want = _count_kmers_loop(seqs, order)
            got = count_kmers(seqs, order)
            for k in range(order + 1):
                np.testing.assert_array_equal(got[k], want[k])


def test_count_kmers_native_matches_loop():
    from peng_motif_tpu.models.background import _count_kmers_loop
    from peng_motif_tpu.native import bg_count_kmers_native

    if bg_count_kmers_native([], 0) is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    # long sequences so the threaded path engages; Ns included to cover
    # the 9-window sentinel + v == 0 quirk
    seqs = [rng.integers(0, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(1, 500, size=130)]
    for order in (0, 2, 4):
        want = _count_kmers_loop(seqs, order)
        got = bg_count_kmers_native(seqs, order)
        for k in range(order + 1):
            np.testing.assert_array_equal(got[k], want[k])
