"""Flat-layout device table operations for the TPU engine.

Every 4**W table is kept as a flat ``[4**W]`` array on device (rank-W
``(4,)*W`` tensors tile on TPU as (8, 128) over the trailing dims — a
32x physical blow-up; the flat layout stays exact).  Position p of a
pattern id is the little-endian base-4 digit with factor ``4**p``
(reference id layout: src/base_pattern.h:20-29), so a row-major reshape
``[4**W] -> (4**(W-1-p)..., 4, 4**p)`` exposes position p as the middle
axis; all contractions below work through such reshapes, always keeping
the large extent in the trailing axis.

Core primitives:

* :func:`sep_sum_flat` — full contraction with one mask per position
  (the IUPAC aggregation inner product, reference:
  src/iupac_pattern.cpp:410-473 re-expressed as a separable sum).
* :func:`all_marginals` — for every position p, the contraction over
  all *other* positions: turns a hill-climb step's W x 10 single-
  position mutants into O(4**W) total work instead of O(W * 10 * 4**W)
  (each mutant score is then a length-4 dot product).
* :func:`pair_marginals` — marginals leaving a (p, W-1-p) position pair
  uncontracted: the double-strand dedup term S(m & m_rc) of a single-
  position mutant differs from the mother at *two* positions (p and its
  mirror), so candidate evaluation needs pair marginals.
* :func:`bg_prob_flat` — the background-probability DP
  (reference: src/base_pattern.cpp:285-325) as W broadcasted multiplies
  in the reference's left-to-right factor order (single f32 multiplies
  are correctly rounded and XLA does not reassociate elementwise
  chains, so entries are bit-equal to the host fold).
* device score formulas mirroring utils/numerics.py (f32 throughout;
  transcendentals use the backend libm, so scores may differ from the
  reference binary in the last ulps — the TPU engine's documented
  tolerance).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32


# ---------------------------------------------------------------------------
# reshape-based contractions
# ---------------------------------------------------------------------------


def contract_pos(flat: jax.Array, pos: int, mask: jax.Array) -> jax.Array:
    """Contract position ``pos`` of a flat table with a length-4 mask.

    flat: [..., 4**t] over live positions 0..t-1; ``pos`` must be a live
    position index (0-based within the block).  Returns [..., 4**(t-1)].
    """
    n = flat.shape[-1]
    lo = 4 ** pos
    hi = n // (4 * lo)
    x = flat.reshape(flat.shape[:-1] + (hi, 4, lo))
    out = jnp.einsum("...hml,m->...hl", x, mask)
    return out.reshape(flat.shape[:-1] + (n // 4,))


def sep_sum_flat(flat: jax.Array, masks: jax.Array, length: int) -> jax.Array:
    """Full separable contraction: sum_id flat[id] * prod_p masks[p][digit_p].

    flat: [..., 4**W]; masks: [W, 4] (masks[p] applies to position p).
    Contracts from the highest position down so every intermediate is a
    [..., 4**t] flat block with the large extent trailing.
    """
    res = flat
    for pos in range(length - 1, -1, -1):
        # position `pos` is the top digit of the remaining block
        res = contract_pos(res, pos, masks[pos])
    return res.reshape(flat.shape[:-1])


def all_marginals(flat: jax.Array, masks: jax.Array, length: int) -> jax.Array:
    """Single-position marginals of a mask-weighted table.

    Returns marg [..., W, 4] with
      marg[..., p, a] = sum over ids with digit_p == a of
                        flat[id] * prod_{q != p} masks[q][digit_q].

    Cost ~ (16/9) * 4**W multiply-adds total via top-down prefix
    partials (contract positions W-1..t, then finish each marginal by
    contracting the remaining low block).
    """
    margs = [None] * length
    part = flat  # live positions 0..t-1
    for t in range(length, 0, -1):
        p = t - 1
        # marginal for position p: keep its axis, contract positions p-1..0
        n = part.shape[-1]
        v = part.reshape(part.shape[:-1] + (4, n // 4))
        low = v
        for q in range(p - 1, -1, -1):
            m = low.shape[-1]
            x = low.reshape(low.shape[:-2] + (4, 4, m // 4))
            low = jnp.einsum("...amq,m->...aq", x, masks[q])
        margs[p] = low.reshape(part.shape[:-1] + (4,))
        # advance the prefix: contract position p
        part = jnp.einsum("...mq,m->...q", v, masks[p])
    return jnp.stack(margs, axis=-2)


def pair_marginals(flat: jax.Array, masks: jax.Array,
                   length: int) -> jax.Array:
    """Marginals leaving position pairs (i, W-1-i) uncontracted.

    Returns pm [..., W//2, 4, 4] with
      pm[..., i, a, b] = sum over ids with digit_i == a, digit_{W-1-i} == b
                         of flat[id] * prod_{q not in {i, W-1-i}} masks[q][dq].
    Requires even ``length`` (the pipeline enforces even W,
    reference: src/Global.cpp:103-106).
    """
    assert length % 2 == 0
    out = []
    part = flat  # live positions i..W-1-i, flat little-endian over them
    for i in range(length // 2):
        t = part.shape[-1]  # 4**(W-2i)
        mid = t // 16
        b = part.reshape(part.shape[:-1] + (4, mid, 4))
        # contract the middle block (positions i+1..W-2-i), top-down
        m2 = b
        for q in range(length - 2 - i, i, -1):
            mm = m2.shape[-2]
            x = m2.reshape(m2.shape[:-3] + (4, 4, mm // 4, 4))
            m2 = jnp.einsum("...amqb,m->...aqb", x, masks[q])
        # m2: [..., 4 (top = W-1-i), 1, 4 (bottom = i)]
        pm = m2.reshape(m2.shape[:-3] + (4, 4))
        out.append(jnp.swapaxes(pm, -1, -2))  # -> (digit_i, digit_{W-1-i})
        # advance: contract the outer pair
        v = jnp.einsum("...mqb,m->...qb", b, masks[length - 1 - i])
        part = jnp.einsum("...qb,b->...q", v, masks[i])
    return jnp.stack(out, axis=-3)


# ---------------------------------------------------------------------------
# id arithmetic on flat iota (device)
# ---------------------------------------------------------------------------


def rc_ids(length: int) -> jax.Array:
    """[4**W] int32 reverse-complement ids (bit arithmetic, no gather)."""
    ids = jnp.arange(4 ** length, dtype=jnp.int32)
    rc = jnp.zeros_like(ids)
    for p in range(length):
        digit = (ids >> (2 * p)) & 3
        rc = rc | ((3 - digit) << (2 * (length - 1 - p)))
    return rc


def canonical_mask(length: int) -> jax.Array:
    ids = jnp.arange(4 ** length, dtype=jnp.int32)
    return ids <= rc_ids(length)


def rc_gather(flat: jax.Array, length: int) -> jax.Array:
    """flat'[id] = flat[revcomp(id)] via one gather (no rank-W transpose
    intermediate — see module docstring on tiling)."""
    return flat[..., rc_ids(length)]


# ---------------------------------------------------------------------------
# background probabilities (device DP)
# ---------------------------------------------------------------------------


def _rev4_perm(k_eff: int) -> np.ndarray:
    """Permutation mapping a little-endian (k_eff+1)-digit sub-id to the
    BaMM big-endian kmer id (reference layouts: src/base_pattern.h:20-29
    vs 88-107)."""
    n = k_eff + 1
    sub = np.arange(4 ** n, dtype=np.int64)
    out = np.zeros(4 ** n, dtype=np.int64)
    for j in range(n):
        out += ((sub >> (2 * j)) & 3) << (2 * (n - 1 - j))
    return out


def bg_prob_flat(v: Sequence[jax.Array], length: int, order: int) -> jax.Array:
    """Flat [4**W] f32 background probabilities for one Markov order,
    multiplied in the reference's left-to-right position order
    (reference: src/base_pattern.cpp:285-325).  Bit-equal to the host
    fold: every factor application is a single correctly-rounded f32
    multiply and XLA does not reassociate elementwise chains.

    v[j]: [4**(j+1)] conditional table in BaMM big-endian layout.
    """
    p = jnp.ones((4 ** length,), dtype=F32)
    for pos in range(length):
        k_eff = min(pos, order)
        # factor for position pos depends on the contiguous digit block
        # pos-k_eff..pos: broadcast the (host-permuted) conditional over
        # (hi, 4**(k_eff+1), lo)
        vk = jnp.asarray(v[k_eff], dtype=F32)[_rev4_perm(k_eff)]
        lo = 4 ** (pos - k_eff)
        blk = 4 ** (k_eff + 1)
        hi = 4 ** length // (blk * lo)
        p = (p.reshape(hi, blk, lo) * vk.reshape(1, blk, 1)).reshape(-1)
    return p


def aggregate_double_strand_flat(p: jax.Array, length: int) -> jax.Array:
    """p'[id] = p[id] + p[rc(id)], palindromes untouched
    (reference: src/base_pattern.cpp:268-283)."""
    rcv = rc_gather(p, length)
    ids = jnp.arange(4 ** length, dtype=jnp.int32)
    return jnp.where(ids == rc_ids(length), p, p + rcv)


# ---------------------------------------------------------------------------
# per-pattern statistics (elementwise; reference: src/base_pattern.cpp:231-265)
# ---------------------------------------------------------------------------


def zscores_flat(counts: jax.Array, expected: jax.Array) -> jax.Array:
    """z = (n - mu) / sqrt(mu) (reference: src/base_pattern.cpp:252-258).

    The reference divides in double after a double sqrt; the TPU engine
    stays in f32 (TPU has no native f64) — a documented last-ulp
    tolerance of the fast engine.  Ties between reverse-complement
    pairs stay exact either way (symmetric inputs).
    """
    num = counts.astype(F32) - expected
    return (num / jnp.sqrt(expected)).astype(F32)


def base_log_pvalues_flat(counts: jax.Array, expected: jax.Array) -> jax.Array:
    """Base-pattern log p-values (reference: src/base_pattern.cpp:231-250)."""
    n = counts.astype(F32)
    mu = expected
    frac = (1.0 - (mu / (n + 1)).astype(F32)).astype(F32)
    body = (n * jnp.log((mu / n).astype(F32)) + n - mu
            - 0.5 * jnp.log(F32(6.283) * n * frac * frac))
    out = jnp.where((n > mu) & (n > 5), body, F32(0.0))
    return jnp.where(counts == 0, jnp.inf, out).astype(F32)


# ---------------------------------------------------------------------------
# optimization scores (vectorized device mirror of utils/numerics.py)
# ---------------------------------------------------------------------------


def _entropy(p):
    p = p.astype(F32)
    return (-p * jnp.log(p) - (1.0 - p) * jnp.log(1.0 - p)).astype(F32)


def mutual_information_score(obs, exp_, n_sequences) -> jax.Array:
    """-sum_q MI/H(q) over priors {0.5, 0.1, 0.01}; 0 when obs < exp
    (reference: src/base_pattern.cpp:184-200, src/utils.h:10-37)."""
    obs = obs.astype(F32)
    exp_ = exp_.astype(F32)
    n = F32(n_sequences)
    p_obs = (1.0 - jnp.exp((-(obs / n)).astype(F32))).astype(F32)
    p_exp = (1.0 - jnp.exp((-(exp_ / n)).astype(F32))).astype(F32)
    score = jnp.zeros_like(obs)
    for q in (0.5, 0.1, 0.01):
        qf = F32(q)
        p = (p_obs * qf + p_exp * (F32(1.0) - qf)).astype(F32)
        mi = (-qf * _entropy(p_obs) - (F32(1.0) - qf) * _entropy(p_exp)
              + _entropy(p)).astype(F32)
        hq = -q * np.log(q) - (1.0 - q) * np.log(1.0 - q)
        score = (score + mi / F32(hq)).astype(F32)
    return jnp.where(obs < exp_, F32(0.0), -score).astype(F32)


def enrichment_score(obs, exp_, pseudo_expected) -> jax.Array:
    """(expected + pseudo) / observed (reference: src/base_pattern.cpp:180-182)."""
    return ((exp_.astype(F32) + F32(pseudo_expected))
            / obs.astype(F32)).astype(F32)


def iupac_zscore(obs, exp_) -> jax.Array:
    """(n - mu)/sqrt(mu) in f32 (reference: src/iupac_pattern.cpp:446
    divides in double; f32 here — TPU-engine tolerance)."""
    num = obs.astype(F32) - exp_.astype(F32)
    return (num / jnp.sqrt(exp_.astype(F32))).astype(F32)


def iupac_log_pvalue(obs, exp_, zscore, bonferroni_sum) -> jax.Array:
    """IUPAC log p-value with the per-letter Bonferroni penalty sum
    added by the caller (reference: src/iupac_pattern.cpp:453-469)."""
    mu = exp_.astype(F32)
    n = obs.astype(F32)
    frac = (F32(1.0) - (mu / (n + 1)).astype(F32)).astype(F32)
    body = (n * jnp.log((mu / n).astype(F32)) + n - mu
            - 0.5 * jnp.log(F32(6.283) * n * frac * frac))
    cond = (n > mu) & (obs > 5) & (zscore > 2)
    logp = jnp.where(cond, body.astype(F32), F32(0.0))
    logp = jnp.where(obs == 0, jnp.inf, logp)
    return (logp + bonferroni_sum.astype(F32)).astype(F32)


def optimization_scores(score_type: int, obs, exp_, n_sequences,
                        pseudo_expected, bonferroni_sum) -> jax.Array:
    """Vectorized minimized score (reference: src/iupac_pattern.cpp:648-689).
    score_type: 0 = LOGPVAL, 1 = ENRICHMENT, 2 = MUTUAL_INFO."""
    if score_type == 1:
        return enrichment_score(obs, exp_, pseudo_expected)
    if score_type == 2:
        return mutual_information_score(obs, exp_, n_sequences)
    z = iupac_zscore(obs, exp_)
    return iupac_log_pvalue(obs, exp_, z, bonferroni_sum)


def base_optimization_scores(score_type: int, obs, exp_, logp, n_sequences,
                             pseudo_expected) -> jax.Array:
    """Seed (base-pattern) scores: LOGPVAL reads the base table
    (reference: src/base_pattern.cpp:202-224)."""
    if score_type == 0:
        return logp
    if score_type == 1:
        return enrichment_score(obs, exp_, pseudo_expected)
    return mutual_information_score(obs, exp_, n_sequences)
