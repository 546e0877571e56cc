"""Targeted unit tests for the greedy control flow of the hill climb,
merge loop, and redundancy filter (round-1 verdict weak-point 8) —
the decision rules of src/peng.cpp:437-541 (climb) and 199-313
(redundancy / merge), exercised directly with scripted scores instead
of only transitively through e2e byte parity.
"""

import io

import numpy as np
import pytest

import conftest  # noqa: F401

from peng_motif_tpu import pipeline as pl
from peng_motif_tpu.io.fasta import SequenceSet
from peng_motif_tpu.models.background import BackgroundModel
from peng_motif_tpu.models.motif import Motif
from peng_motif_tpu.pattern_tables import OptimizationScore, Strand
from peng_motif_tpu.pipeline import Peng


W = 4
POW11 = 11 ** np.arange(W, dtype=np.int64)


def iupac_id(digits):
    return int((np.asarray(digits, dtype=np.int64) * POW11).sum())


# IUPAC digit codes: A=0 C=1 G=2 T=3 S=4 W=5 R=6 Y=7 M=8 K=9 N=10
AAAA = iupac_id([0, 0, 0, 0])
WAAA = iupac_id([5, 0, 0, 0])
KAAA = iupac_id([9, 0, 0, 0])


class ScriptedTables:
    """Stand-in for PatternTables with a scripted score per IUPAC id
    (ENRICHMENT with pseudo 0 and counts 1 makes score == expected),
    forcing the walk through chosen decision points."""

    def __init__(self, scores, seed_scores):
        self.pattern_length = W
        self.scores = scores
        self.seed_scores = seed_scores

    def optimization_score(self, score_type, pattern, pseudo):
        return np.float32(self.seed_scores[pattern])

    def aggregate_and_score(self, digits, score_type, pseudo):
        return None  # force the sequential reference-order walk

    def aggregate_digits(self, digits):
        ids = (np.asarray(digits, dtype=np.int64) * POW11).sum(axis=1)
        expected = np.array(
            [self.scores.get(int(i), 2.0) for i in ids], dtype=np.float32)
        counts = np.ones(len(ids), dtype=np.int64)
        bgp = np.full(len(ids), 1e-3, dtype=np.float32)
        return counts, expected, bgp

    def to_string(self, pattern):
        return "ACGT"[pattern % 4] + "AAA"


def _tiny_peng(out):
    seqs = [np.array([1, 2, 3, 4, 1, 2, 3, 4], dtype=np.uint8)] * 2
    sset = SequenceSet(filepath="<mem>", sequences=seqs,
                       headers=["a", "b"])
    bg = BackgroundModel(seqs, order=0)
    peng = Peng(Strand.BOTH_STRANDS, 0, 0, sset, bg, stdout=out)
    return peng


def test_seen_set_kills_duplicate_and_evaluated_walks():
    """Three seeds (reference walk src/peng.cpp:465-524):
    - AAAA climbs to WAAA (score 0.5) and emits it;
    - TAAA also reaches WAAA -> best in `seen` -> removed; along the
      way it *evaluates* KAAA (0.6, not accepted: 0.6 > running 0.5)
      which is recorded into `seen` (all evaluated mutants except the
      current best, src/peng.cpp:507-508);
    - GAAA's best move is KAAA -> killed purely by walk 2's evaluation
      record, the adversarial case of the seen-set rule."""
    out = io.StringIO()
    peng = _tiny_peng(out)
    scores = {AAAA: 2.0, WAAA: 0.5, KAAA: 0.6}
    # seeds as base-4 ids: AAAA=0, TAAA=3, GAAA=2
    tables = ScriptedTables(scores, seed_scores={0: 1.0, 3: 1.0, 2: 1.0})
    motifs = peng._optimize_iupac_patterns(
        OptimizationScore.ENRICHMENT, tables, [0, 3, 2], 0.0)

    assert [m.pattern_id for m in motifs] == [WAAA]
    text = out.getvalue()
    assert text.count("removed") == 2
    assert "optimization: AAAA -> WAAA" in text


def test_walk_accepts_every_strict_improvement_in_order():
    """Within one mother, later candidates compare against the running
    best-so-far, not the step's start (src/peng.cpp:485-497): 0.8 then
    0.3 both print as accepted rows; a following 0.5 does not."""
    out = io.StringIO()
    peng = _tiny_peng(out)
    # From AAAA, pos-0 candidates arrive in similar-set order W, R, M, N
    RAAA = iupac_id([6, 0, 0, 0])
    MAAA = iupac_id([8, 0, 0, 0])
    scores = {WAAA: 0.8, RAAA: 0.3, MAAA: 0.5}
    tables = ScriptedTables(scores, seed_scores={0: 1.0})
    motifs = peng._optimize_iupac_patterns(
        OptimizationScore.ENRICHMENT, tables, [0], 0.0)
    assert [m.pattern_id for m in motifs] == [RAAA]
    text = out.getvalue()
    assert "WAAA" in text and "RAAA" in text
    # MAAA at 0.5 > running 0.3 must never print as an accepted row
    assert "\tMAAA" not in text


class FakeMotif:
    def __init__(self, name, length, log_pvalue=-10.0):
        self.name = name
        self.length = length
        self.log_pvalue = log_pvalue

    def pattern_string(self, profile):
        return self.name


def test_merge_too_long_terminates_loop_not_pair(monkeypatch):
    """When the best pair's merge exceeds max_merged_length, the
    reference ends the whole merge phase rather than trying the next
    pair (src/peng.cpp:308-310 `continue` with found_better false)."""
    out = io.StringIO()
    peng = _tiny_peng(out)
    a, b, c = FakeMotif("A", 8), FakeMotif("B", 8), FakeMotif("C", 8)

    def fake_overlap(m1, m2, both, bg0):
        # (A,B) is the best pair; (A,C) also clears the threshold
        if {m1.name, m2.name} == {"A", "B"}:
            return np.float32(9.0), 0, False
        return np.float32(8.0), 0, False

    merged = FakeMotif("AB", 20)  # > max_merged_length=14

    monkeypatch.setattr(pl, "calculate_best_overlap", fake_overlap)
    monkeypatch.setattr(pl, "merge_motifs",
                        lambda *args, **kw: merged)
    motifs = [a, b, c]
    peng._merge_patterns(8, 0.4, motifs, 14)
    # no merge happened and the (A,C) pair was never merged either
    assert [m.name for m in motifs] == ["A", "B", "C"]
    assert "merge:" not in out.getvalue()


def test_merge_skips_weak_pvalue_motifs(monkeypatch):
    """Motifs with log_pvalue > -5 never participate in merging
    (src/peng.cpp:249-252)."""
    out = io.StringIO()
    peng = _tiny_peng(out)
    a, b = FakeMotif("A", 8, log_pvalue=-1.0), FakeMotif("B", 8,
                                                         log_pvalue=-1.0)
    calls = []

    def fake_overlap(m1, m2, both, bg0):
        calls.append((m1.name, m2.name))
        return np.float32(99.0), 0, False

    monkeypatch.setattr(pl, "calculate_best_overlap", fake_overlap)
    motifs = [a, b]
    peng._merge_patterns(8, 0.4, motifs, 14)
    assert calls == []
    assert [m.name for m in motifs] == ["A", "B"]


def test_redundancy_filter_breaks_after_one_deselection(monkeypatch):
    """With A,B,C mutually similar, the reference deselects B under
    i=A then breaks the j loop — C survives (src/peng.cpp:199-235
    break-per-i quirk)."""
    out = io.StringIO()
    peng = _tiny_peng(out)

    def make(name, logp):
        m = Motif(0, W)
        m.log_pvalue = np.float32(logp)
        m.set_pwm(np.full((W, 4), 0.25, dtype=np.float32))
        m.name = name
        return m

    a, b, c = make("A", -30.0), make("B", -20.0), make("C", -10.0)
    monkeypatch.setattr(pl, "calculate_s",
                        lambda *args, **kw: np.float32(1e9))
    motifs = [c, a, b]  # filter re-sorts by log_pvalue first
    peng.filter_redundancy(0.4, motifs)
    assert [m.name for m in motifs] == ["A", "C"]


def test_walks_wide_matches_narrow():
    """wide=True (f64 aggregation chain for ltot >= 2**24) must produce
    identical walk decisions and aggregates in the regime where both
    are exact (all counts < 2**24)."""
    import jax
    import jax.numpy as jnp
    from peng_motif_tpu.ops.climb import walks_program

    rng = np.random.default_rng(5)
    W = 6
    # keep the FULL-table aggregate (worst mask set, all-N) < 2**24 so
    # the narrow f32 chain is itself exact and equality is well-defined
    counts = jnp.asarray(rng.integers(0, 4_000, size=4 ** W).astype(np.int32))
    expected = jnp.asarray((rng.random(4 ** W) * 50).astype(np.float32))
    bgp = jnp.asarray((rng.random(4 ** W) * 1e-4).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 4 ** W, size=7).astype(np.int32))
    valid = jnp.ones(7, bool)
    outs = {}
    for wide in (False, True):
        outs[wide] = jax.device_get(walks_program(
            counts, expected, bgp, ids, valid,
            jnp.float32(500), jnp.float32(0), W, True, 0, wide=wide))
    a, b = outs[False], outs[True]
    np.testing.assert_array_equal(a["improved"], b["improved"])
    np.testing.assert_array_equal(a["chosen_idx"], b["chosen_idx"])
    np.testing.assert_array_equal(a["chosen_counts"],
                                  b["chosen_counts"].astype(np.float32))
    np.testing.assert_array_equal(a["acc_n"], b["acc_n"])
    # float aggregates: f64 sums rounded to f32 may differ in the last
    # ulp from f32 tree sums; scores compare as f32
    np.testing.assert_allclose(
        a["chosen_expected"], b["chosen_expected"], rtol=1e-6)
    np.testing.assert_allclose(a["chosen_score"], b["chosen_score"],
                               rtol=2e-6, atol=2e-5)


def test_adv_pwm_wide_matches_narrow():
    import jax
    import jax.numpy as jnp
    from peng_motif_tpu.engine_tpu import adv_pwm_program

    rng = np.random.default_rng(6)
    W = 6
    counts = jnp.asarray(rng.integers(0, 60_000, size=4 ** W).astype(np.int32))
    dig = jnp.asarray(rng.integers(0, 11, size=(4, W)).astype(np.int32))
    bg0 = jnp.asarray(np.full(4, 0.25, np.float32))
    a = np.asarray(adv_pwm_program(dig, counts, bg0, 10, W, True, wide=False))
    b = np.asarray(adv_pwm_program(dig, counts, bg0, 10, W, True, wide=True))
    np.testing.assert_array_equal(a, b)
