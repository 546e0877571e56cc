"""Flat-layout device table ops vs brute-force / host oracles."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from peng_motif_tpu.alphabets import IUPAC_MASKS
from peng_motif_tpu.ops import bgprobs, flat_tables as ft


def _brute_sep_sum(flat, masks, W):
    ids = np.arange(4 ** W)
    total = 0.0
    for i in ids:
        w = 1.0
        for p in range(W):
            w *= masks[p][(i >> (2 * p)) & 3]
        total += flat[i] * w
    return total


@pytest.mark.parametrize("W", [2, 4, 5])
def test_sep_sum_flat(W):
    rng = np.random.default_rng(0)
    flat = rng.normal(size=4 ** W).astype(np.float32)
    masks = rng.integers(0, 2, size=(W, 4)).astype(np.float32)
    got = float(ft.sep_sum_flat(jnp.asarray(flat), jnp.asarray(masks), W))
    want = _brute_sep_sum(flat.astype(np.float64), masks, W)
    assert abs(got - want) < 1e-3


@pytest.mark.parametrize("W", [3, 4, 6])
def test_all_marginals(W):
    rng = np.random.default_rng(1)
    flat = rng.normal(size=4 ** W).astype(np.float32)
    masks = rng.uniform(0, 1, size=(W, 4)).astype(np.float32)
    got = np.asarray(ft.all_marginals(jnp.asarray(flat), jnp.asarray(masks), W))
    assert got.shape == (W, 4)
    ids = np.arange(4 ** W)
    for p in range(W):
        for a in range(4):
            w = np.ones(4 ** W)
            for q in range(W):
                if q != p:
                    w *= masks[q][(ids >> (2 * q)) & 3]
            sel = ((ids >> (2 * p)) & 3) == a
            want = (flat.astype(np.float64) * w)[sel].sum()
            assert abs(got[p, a] - want) < 1e-2, (p, a)


@pytest.mark.parametrize("W", [4, 6])
def test_pair_marginals(W):
    rng = np.random.default_rng(2)
    flat = rng.normal(size=4 ** W).astype(np.float32)
    masks = rng.uniform(0, 1, size=(W, 4)).astype(np.float32)
    got = np.asarray(ft.pair_marginals(jnp.asarray(flat), jnp.asarray(masks), W))
    assert got.shape == (W // 2, 4, 4)
    ids = np.arange(4 ** W)
    for i in range(W // 2):
        j = W - 1 - i
        w = np.ones(4 ** W)
        for q in range(W):
            if q not in (i, j):
                w *= masks[q][(ids >> (2 * q)) & 3]
        for a in range(4):
            for b in range(4):
                sel = ((((ids >> (2 * i)) & 3) == a)
                       & (((ids >> (2 * j)) & 3) == b))
                want = (flat.astype(np.float64) * w)[sel].sum()
                assert abs(got[i, a, b] - want) < 1e-2, (i, a, b)


def test_marginals_batched():
    W = 4
    rng = np.random.default_rng(3)
    flat = rng.normal(size=(3, 4 ** W)).astype(np.float32)
    masks = rng.uniform(0, 1, size=(W, 4)).astype(np.float32)
    got = np.asarray(ft.all_marginals(jnp.asarray(flat), jnp.asarray(masks), W))
    assert got.shape == (3, W, 4)
    for g in range(3):
        single = np.asarray(
            ft.all_marginals(jnp.asarray(flat[g]), jnp.asarray(masks), W))
        np.testing.assert_allclose(got[g], single, rtol=1e-6)
    pg = np.asarray(ft.pair_marginals(jnp.asarray(flat), jnp.asarray(masks), W))
    assert pg.shape == (3, W // 2, 4, 4)
    for g in range(3):
        single = np.asarray(
            ft.pair_marginals(jnp.asarray(flat[g]), jnp.asarray(masks), W))
        np.testing.assert_allclose(pg[g], single, rtol=1e-6)


@pytest.mark.parametrize("W,order", [(4, 0), (4, 2), (6, 2), (5, 1)])
def test_bg_prob_flat_matches_host(W, order):
    rng = np.random.default_rng(4)
    v = []
    for j in range(order + 1):
        t = rng.uniform(0.1, 1.0, size=4 ** (j + 1)).astype(np.float32)
        v.append(t)
    got = np.asarray(ft.bg_prob_flat([jnp.asarray(x) for x in v], W, order))
    want = bgprobs.host_bg_prob_flat(v, W, order)
    # same multiply order, correctly-rounded f32 ops: bit-equal
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("W", [4, 5])
def test_double_strand_flat_matches_host(W):
    rng = np.random.default_rng(5)
    p = rng.uniform(0.0, 1.0, size=4 ** W).astype(np.float32)
    got = np.asarray(ft.aggregate_double_strand_flat(jnp.asarray(p), W))
    want = bgprobs.host_aggregate_double_strand_flat(p, W)
    np.testing.assert_array_equal(got, want)


def test_rc_and_canonical_match_encoding():
    from peng_motif_tpu.ops import encoding

    for W in (3, 4):
        np.testing.assert_array_equal(
            np.asarray(ft.rc_ids(W)), np.asarray(encoding.rc_ids_flat(W)))
        np.testing.assert_array_equal(
            np.asarray(ft.canonical_mask(W)),
            np.asarray(encoding.canonical_mask_flat(W)))


def test_scores_match_numerics():
    from peng_motif_tpu.utils import numerics

    rng = np.random.default_rng(6)
    obs = rng.integers(0, 2000, size=64).astype(np.int64)
    exp_ = rng.uniform(0.01, 1000, size=64).astype(np.float32)
    n_seq = 5000
    mi = np.asarray(ft.mutual_information_score(
        jnp.asarray(obs), jnp.asarray(exp_), n_seq))
    for i in range(64):
        want = numerics.mutual_information_score(
            np.float32(obs[i]), exp_[i], n_seq)
        assert abs(mi[i] - want) < 5e-5 + 1e-4 * abs(want), i

    enr = np.asarray(ft.enrichment_score(
        jnp.asarray(np.maximum(obs, 1)), jnp.asarray(exp_), 25))
    for i in range(64):
        want = numerics.exp_count_fraction(max(int(obs[i]), 1), exp_[i], 25)
        assert abs(enr[i] - want) < 1e-5 * abs(want) + 1e-6

    from peng_motif_tpu.alphabets import LOG_BONFERRONI
    digits = rng.integers(0, 11, size=(64, 6))
    bsum = LOG_BONFERRONI[digits].astype(np.float64).sum(axis=1).astype(
        np.float32)
    z = np.asarray(ft.iupac_zscore(jnp.asarray(obs), jnp.asarray(exp_)))
    lp = np.asarray(ft.iupac_log_pvalue(
        jnp.asarray(obs), jnp.asarray(exp_), jnp.asarray(z),
        jnp.asarray(bsum)))
    for i in range(64):
        want = numerics.iupac_log_pvalue(
            int(obs[i]), exp_[i], z[i], digits[i], LOG_BONFERRONI)
        if np.isinf(want):
            assert np.isinf(lp[i])
        else:
            assert abs(lp[i] - want) < 5e-4 + 1e-4 * abs(want), i
