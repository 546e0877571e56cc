"""TPU-engine parity on real accelerator hardware.

These are the same tolerance checks as tests/test_engine_tpu.py, but on
the attached accelerator backend — the environment where f32 einsums
can silently lower to bf16 MXU passes (the exact failure mode
BENCH_r02 caught and the CPU-pinned suite could not).
"""

import os

import pytest

from conftest import GOLDEN_DIR

from peng_motif_tpu.cli import main


def _run_and_diff_tol(argv, stem, tmp_path, tol=5e-6, rel=1e-6):
    """Token-level equality with per-float tolerance tol + rel*|golden|
    (the TPU engine parity contract, see engine_tpu.py docstring)."""
    meme_out = str(tmp_path / "out.meme")
    assert main(argv + ["-o", meme_out]) == 0
    with open(meme_out) as f, \
            open(os.path.join(GOLDEN_DIR, f"{stem}.meme")) as g:
        got_lines, want_lines = f.read().splitlines(), g.read().splitlines()
    assert len(got_lines) == len(want_lines), f"line count differs: {stem}"
    for ln, (a, b) in enumerate(zip(got_lines, want_lines), 1):
        if a == b:
            continue
        ta, tb = a.split(), b.split()
        assert len(ta) == len(tb), f"{stem}:{ln}: {a!r} vs {b!r}"
        for x, y in zip(ta, tb):
            if x == y:
                continue
            try:
                fx, fy = float(x), float(y)
            except ValueError:
                raise AssertionError(f"{stem}:{ln}: {a!r} vs {b!r}")
            assert abs(fx - fy) <= tol + rel * abs(fy), \
                f"{stem}:{ln}: {a!r} vs {b!r}"


HW_CASES = [
    ("mafk100_w8", ["MafK_100seqs.fasta", "-w", "8"]),
    ("mafk100_w8_plus", ["MafK_100seqs.fasta", "-w", "8",
                         "--strand", "PLUS"]),
    ("mafk100_w8_logpval",
     ["MafK_100seqs.fasta", "-w", "8", "--optimization_score", "LOGPVAL"]),
    ("mafk_w8", ["MafK.fasta", "-w", "8"]),
    ("mafk_w10", ["MafK.fasta", "-w", "10"]),   # the headline config
    ("synth_w8", ["synthetic_n.fasta", "-w", "8"]),
]


@pytest.mark.parametrize("stem,args", HW_CASES, ids=[c[0] for c in HW_CASES])
def test_tpu_engine_parity_on_hardware(stem, args, tmp_path, accelerator):
    argv = ([os.path.join(GOLDEN_DIR, args[0])] + args[1:]
            + ["--engine", "tpu"])
    _run_and_diff_tol(argv, stem, tmp_path)


def test_forced_device_count_byte_identical_on_hardware(
        tmp_path, accelerator, monkeypatch):
    """Counting on the accelerator must feed the byte-exact host
    pipeline unchanged (integer path: no tolerance)."""
    monkeypatch.setenv("PENG_COUNT_HOST_MAX_BASES", "0")
    meme_out = str(tmp_path / "out.meme")
    argv = [os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta"), "-w", "8",
            "--engine", "exact", "-o", meme_out]
    assert main(argv) == 0
    with open(meme_out, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, "mafk100_w8.meme"), "rb") as g:
        assert f.read() == g.read()
