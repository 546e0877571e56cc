"""End-to-end parity: the full pipeline must produce byte-identical
MEME/JSON output vs the reference C++ binary on the golden datasets,
across strands, optimization scores, EM/merging toggles, and PWM modes."""

import os

import pytest

from conftest import GOLDEN_DIR

from peng_motif_tpu.cli import main


CASES = [
    # (golden file stem, argv, check json too)
    ("mafk100_w8", ["MafK_100seqs.fasta", "-w", "8"], True),
    ("mafk100_w6", ["MafK_100seqs.fasta", "-w", "6"], True),
    ("mafk100_w8_plus", ["MafK_100seqs.fasta", "-w", "8", "--strand", "PLUS"], False),
    ("mafk100_w8_noem", ["MafK_100seqs.fasta", "-w", "8", "--no-em"], False),
    ("mafk100_w8_logpval",
     ["MafK_100seqs.fasta", "-w", "8", "--optimization_score", "LOGPVAL"], False),
    ("mafk100_w8_enrich",
     ["MafK_100seqs.fasta", "-w", "8", "--optimization_score", "ENRICHMENT"], False),
    ("mafk100_w8_nomerge_noem",
     ["MafK_100seqs.fasta", "-w", "8", "--no-merging", "--no-em"], False),
    ("mafk100_w8_defpwm",
     ["MafK_100seqs.fasta", "-w", "8", "--use-default-pwm"], False),
    ("mafk_w8", ["MafK.fasta", "-w", "8"], True),
    ("mafk_w6_plus", ["MafK.fasta", "-w", "6", "--strand", "PLUS"], False),
    ("mafk100_w4", ["MafK_100seqs.fasta", "-w", "4"], False),
    ("mafk100_w8_bgo1",
     ["MafK_100seqs.fasta", "-w", "8", "--bg-model-order", "1"], False),
    ("mafk100_w8_bgmafk",
     ["MafK_100seqs.fasta", "-w", "8",
      "--background-sequences", os.path.join(GOLDEN_DIR, "MafK.fasta")],
     False),
    ("mafk100_w8_thresh",
     ["MafK_100seqs.fasta", "-w", "8", "-t", "5",
      "--count-threshold", "1", "--pseudo-counts", "5"], False),
    # merge-heavy / motif-rich: 25-motif EM batch, 14 merge rounds
    # incl. a 13-mer triple merge (round-4 verdict next #7)
    ("mafk_w8_rich",
     ["MafK.fasta", "-w", "8", "-t", "5",
      "--minimum-processed-patterns", "25"], True),
    ("mafk100_w8_minmax",
     ["MafK_100seqs.fasta", "-w", "8",
      "--minimum-processed-patterns", "10",
      "--max-optimized-patterns", "20"], False),
    # synthetic dataset with 2% Ns: exercises N-window/validity handling
    # end-to-end (counting, background model, climbs)
    ("synth_w8", ["synthetic_n.fasta", "-w", "8"], True),
    ("synth_w8_plus", ["synthetic_n.fasta", "-w", "8", "--strand", "PLUS"],
     True),
    ("synth_w6_noem", ["synthetic_n.fasta", "-w", "6", "--no-em"], True),
    ("synth_w8_b02", ["synthetic_n.fasta", "-w", "8", "-b", "0.2"], True),
    ("synth_w8_emiter3",
     ["synthetic_n.fasta", "-w", "8", "--em-max-iterations", "3",
      "--em-threshold", "0.2", "-a", "1000"], True),
]


@pytest.mark.parametrize("stem,args,check_json", CASES,
                         ids=[c[0] for c in CASES])
def test_byte_identical_output(stem, args, check_json, tmp_path, capsys):
    meme_out = str(tmp_path / "out.meme")
    json_out = str(tmp_path / "out.json")
    argv = [os.path.join(GOLDEN_DIR, args[0])] + args[1:] + ["-o", meme_out]
    if check_json:
        argv += ["-j", json_out]
    assert main(argv) == 0
    captured = capsys.readouterr()
    with open(meme_out, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, f"{stem}.meme"), "rb") as g:
        assert f.read() == g.read(), f"MEME output differs for {stem}"
    if check_json:
        with open(json_out, "rb") as f, \
                open(os.path.join(GOLDEN_DIR, f"{stem}.json"), "rb") as g:
            assert f.read() == g.read(), f"JSON output differs for {stem}"
    # stdout parity: the golden .log files captured the reference binary
    # with stderr merged in; warnings (std::cerr in the reference,
    # sys.stderr here) are checked on our stderr instead
    log_path = os.path.join(GOLDEN_DIR, f"{stem}.log")
    if os.path.exists(log_path):
        with open(log_path) as g:
            golden_lines = g.read().splitlines(keepends=True)
        warnings = [ln for ln in golden_lines if ln.startswith("Warning:")]
        expected_out = "".join(
            ln for ln in golden_lines if not ln.startswith("Warning:"))
        assert captured.out == expected_out, f"stdout differs for {stem}"
        for ln in warnings:
            assert ln.rstrip("\n") in captured.err


@pytest.mark.slow
def test_byte_identical_w12(tmp_path, capsys):
    """-w 12: the largest recommended pattern length (4**12 = 16.8M
    entry tables; README.md:119)."""
    meme_out = str(tmp_path / "out.meme")
    argv = [os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta"), "-w", "12",
            "-o", meme_out]
    assert main(argv) == 0
    with open(meme_out, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, "mafk100_w12.meme"), "rb") as g:
        assert f.read() == g.read()


@pytest.mark.slow
def test_byte_identical_w10_default(tmp_path, capsys):
    """Default -w 10 on the full MafK set (the reference's headline
    configuration, 15.6 s single-core C++)."""
    meme_out = str(tmp_path / "out.meme")
    json_out = str(tmp_path / "out.json")
    argv = [os.path.join(GOLDEN_DIR, "MafK.fasta"), "-o", meme_out,
            "-j", json_out]
    assert main(argv) == 0
    with open(meme_out, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, "mafk_w10.meme"), "rb") as g:
        assert f.read() == g.read()
    with open(json_out, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, "mafk_w10.json"), "rb") as g:
        assert f.read() == g.read()
