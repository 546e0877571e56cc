"""Phase-1 parity: count tables, background probabilities, and statistics
must match tables dumped from the reference C++ implementation exactly
(counts, ltot) or to float32 tolerance (probabilities, stats)."""

import os

import numpy as np
import pytest

from conftest import GOLDEN_DIR

from peng_motif_tpu.io.fasta import read_fasta
from peng_motif_tpu.models.background import BackgroundModel
from peng_motif_tpu.pattern_tables import PatternTables, Strand


def _load_golden(prefix, w):
    n = 4 ** w
    g = {}
    g["counts"] = np.fromfile(f"{prefix}.counts.u64", dtype=np.uint64)
    for k in range(3):
        g[f"bg{k}"] = np.fromfile(f"{prefix}.bg{k}.f32", dtype=np.float32)
        g[f"bgmodel{k}"] = np.fromfile(f"{prefix}.bgmodel{k}.f32", dtype=np.float32)
    g["expected"] = np.fromfile(f"{prefix}.expected.f32", dtype=np.float32)
    g["logp"] = np.fromfile(f"{prefix}.logp.f32", dtype=np.float32)
    with open(f"{prefix}.meta.txt") as f:
        for line in f:
            key, val = line.split()
            g[key] = int(val)
    assert g["counts"].shape[0] == n
    return g


def _build(fasta, w, strand):
    sset = read_fasta(fasta)
    bg = BackgroundModel(sset.sequences, order=2)
    tables = PatternTables(
        w, strand, k=2, max_k=2, padded_codes=sset.padded(),
        bg_model=bg, n_sequences=sset.n,
    )
    return sset, bg, tables


CASES = [
    ("mafk100_w8", "MafK_100seqs.fasta", 8, Strand.BOTH_STRANDS),
    ("mafk100_w8_plus", "MafK_100seqs.fasta", 8, Strand.PLUS_STRAND),
    ("mafk100_w4", "MafK_100seqs.fasta", 4, Strand.BOTH_STRANDS),
    ("mafk100_w6", "MafK_100seqs.fasta", 6, Strand.BOTH_STRANDS),
    ("default_w4", "default_sequence_set.fa", 4, Strand.BOTH_STRANDS),
]


@pytest.mark.parametrize("name,fasta,w,strand", CASES)
def test_phase1_tables(name, fasta, w, strand):
    prefix = os.path.join(GOLDEN_DIR, "tables", name)
    golden = _load_golden(prefix, w)
    sset, bg, tables = _build(os.path.join(GOLDEN_DIR, fasta), w, strand)

    # background model conditionals: float32-exact
    for k in range(3):
        np.testing.assert_array_equal(
            bg.v[k], golden[f"bgmodel{k}"],
            err_msg=f"bg model conditionals order {k}",
        )

    # counts: integer-exact, ltot exact
    assert tables.ltot == golden["ltot"]
    np.testing.assert_array_equal(
        tables.counts_np.astype(np.uint64), golden["counts"]
    )

    # bg probability tables: tolerance (different multiply order)
    for k in range(3):
        got = np.asarray(tables.bg_tensors[k]).reshape(-1)
        np.testing.assert_allclose(got, golden[f"bg{k}"], rtol=2e-6, atol=0)

    np.testing.assert_allclose(
        tables.expected_np, golden["expected"], rtol=2e-6, atol=0
    )

    # log p-values where finite
    logp = tables.logp_np
    gl = golden["logp"]
    finite = np.isfinite(gl)
    np.testing.assert_array_equal(np.isfinite(logp), finite)
    np.testing.assert_allclose(logp[finite], gl[finite], rtol=1e-4, atol=1e-5)
