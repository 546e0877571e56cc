"""Degenerate-input behavior parity (verified against the reference
binary built from /root/reference): empty files, header-only entries,
sequences shorter than W, and all-N sequences all run through and emit a
header-only MEME file with the reference's background frequencies."""

import os

import numpy as np
import pytest

from peng_motif_tpu.cli import main

HEADER_ONLY_MEME = """MEME version 4

ALPHABET= ACGT

Background letter frequencies
A 0.25 C 0.25 G 0.25 T 0.25

"""


def _run(tmp_path, fasta_text, args=()):
    fa = tmp_path / "in.fa"
    fa.write_text(fasta_text)
    out = tmp_path / "out.meme"
    rc = main([str(fa), "-w", "8", "-o", str(out), *args])
    return rc, (out.read_text() if out.exists() else None)


def test_empty_file(tmp_path, capsys):
    rc, meme = _run(tmp_path, "")
    assert rc == 0
    assert meme == HEADER_ONLY_MEME


def test_header_only_entry_warns_and_runs(tmp_path, capsys):
    rc, meme = _run(tmp_path, ">only_header\n")
    assert rc == 0
    assert meme == HEADER_ONLY_MEME
    err = capsys.readouterr().err
    # the reference parses the input twice (sequence set + background
    # set, src/Global.cpp:66-74), warning once per parse
    assert err.count("Warning: Ignore FASTA entry without sequence") == 2


def test_sequences_shorter_than_w(tmp_path, capsys):
    rc, meme = _run(tmp_path, ">s1\nACGT\n")
    assert rc == 0
    assert meme == HEADER_ONLY_MEME


def test_all_n_sequences(tmp_path, capsys):
    rc, meme = _run(tmp_path, ">s1\n" + "N" * 64 + "\n")
    assert rc == 0
    assert meme is not None
    assert meme.startswith("MEME version 4")
