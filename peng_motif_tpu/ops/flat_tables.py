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

# Every contraction in this module carries an "integer sums exact in f32"
# invariant (counts ~1e3-1e7 need the full 24-bit mantissa).  On TPU the
# default matmul precision lowers f32 einsums to bf16 MXU passes, which
# silently rounds those sums — so all einsums here pin HIGHEST precision
# (full-f32 accumulation; on CPU/GPU this is a no-op).
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)


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
    out = _einsum("...hml,m->...hl", x, mask)
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
            low = _einsum("...amq,m->...aq", x, masks[q])
        margs[p] = low.reshape(part.shape[:-1] + (4,))
        # advance the prefix: contract position p
        part = _einsum("...mq,m->...q", v, masks[p])
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
            m2 = _einsum("...amqb,m->...aqb", x, masks[q])
        # m2: [..., 4 (top = W-1-i), 1, 4 (bottom = i)]
        pm = m2.reshape(m2.shape[:-3] + (4, 4))
        out.append(jnp.swapaxes(pm, -1, -2))  # -> (digit_i, digit_{W-1-i})
        # advance: contract the outer pair
        v = _einsum("...mqb,m->...qb", b, masks[length - 1 - i])
        part = _einsum("...qb,b->...q", v, masks[i])
    return jnp.stack(out, axis=-3)


# ---------------------------------------------------------------------------
# id arithmetic on flat iota (device)
# ---------------------------------------------------------------------------


def rc_ids(length: int) -> jax.Array:
    """[4**W] int32 reverse-complement ids (numpy literal — traced
    construction makes XLA constant-fold 4**W-op chains at compile
    time, see encoding.rc_ids_flat)."""
    from . import encoding  # noqa: PLC0415

    return encoding.rc_ids_flat(length)


def canonical_mask(length: int) -> jax.Array:
    from . import encoding  # noqa: PLC0415

    return encoding.canonical_mask_flat(length)


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
# optimization scores (device mirror of utils/numerics.py)
#
# The reference stores scores in ``float`` variables but C-library
# transcendentals promote to double (utils/numerics.py documents every
# promotion point, validated by byte-parity against the reference
# binary).  These device versions replicate each rounding point: f32
# elementwise steps, f64 (x64-enabled) log/exp/sqrt, rounded back to f32
# exactly where the C++ expression assigns to a float.  Decision
# comparisons in the climb are therefore f32-vs-f32, the same values the
# reference compares (up to the backend's f64 libm last-ulps and the
# tree-vs-sequential order of the f32 aggregation sums).
# ---------------------------------------------------------------------------

F64 = jnp.float64


def _f32(x):
    return jnp.asarray(x).astype(F32)


def _f64(x):
    return jnp.asarray(x).astype(F64)


def _entropy_f(p32):
    """F32(-p*log(p) - (1-p)*log(1-p)), double internally
    (reference: src/utils.h:25-27; numerics.entropy_f)."""
    pd = _f64(p32)
    return _f32(-pd * jnp.log(pd) - (1.0 - pd) * jnp.log(1.0 - pd))


def mutual_information_score(obs, exp_, n_sequences) -> jax.Array:
    """-sum_q MI/H(q) over priors {0.5, 0.1, 0.01}; 0 when obs < exp
    (reference: src/base_pattern.cpp:184-200, src/utils.h:29-37;
    promotion points per numerics.mutual_information_score)."""
    import math  # noqa: PLC0415

    obs = _f32(obs)
    exp_ = _f32(exp_)
    n = _f32(jnp.asarray(n_sequences))
    # p = F32(1.0(double) - exp(double(F32(-(obs/n)))))
    p_obs = _f32(1.0 - jnp.exp(_f64(_f32(-(obs / n)))))
    p_exp = _f32(1.0 - jnp.exp(_f64(_f32(-(exp_ / n)))))
    score = jnp.zeros(obs.shape, dtype=F32)
    for q in (0.5, 0.1, 0.01):
        qf = np.float32(q)
        one_m_q = np.float32(np.float32(1.0) - qf)
        p = _f32(_f32(p_obs * qf) + _f32(p_exp * one_m_q))
        mi = _f32(_f32(-qf * _entropy_f(p_obs))
                  - _f32(one_m_q * _entropy_f(p_exp))
                  + _entropy_f(p))
        # H(q) is a compile-time constant: double math, f32 result
        hq = np.float32(-float(qf) * math.log(float(qf))
                        - (1.0 - float(qf)) * math.log(1.0 - float(qf)))
        score = _f32(score + _f32(mi / hq))
    return jnp.where(obs < exp_, F32(0.0), _f32(-score))


def enrichment_score(obs, exp_, pseudo_expected) -> jax.Array:
    """F32((expected + pseudo) / observed)
    (reference: src/base_pattern.cpp:180-182; numerics.exp_count_fraction)."""
    return _f32(_f32(_f32(exp_) + _f32(pseudo_expected)) / _f32(obs))


def iupac_zscore(obs, exp_) -> jax.Array:
    """F32(double(F32(n - mu)) / sqrt(double(mu)))
    (reference: src/iupac_pattern.cpp:446; numerics.zscore_from_sums)."""
    num = _f32(_f32(obs) - _f32(exp_))
    return _f32(_f64(num) / jnp.sqrt(_f64(_f32(exp_))))


def iupac_log_pvalue(obs, exp_, zscore, bonferroni_sum) -> jax.Array:
    """IUPAC log p-value with the per-letter Bonferroni penalty sum
    added by the caller (reference: src/iupac_pattern.cpp:453-469;
    numerics.iupac_log_pvalue — note the all-f32 ``frac``)."""
    mu = _f32(exp_)
    n = _f32(obs)
    frac = _f32(F32(1.0) - _f32(mu / _f32(n + 1)))
    nd = _f64(n)
    ratio = _f32(mu / n)
    body = (nd * jnp.log(_f64(ratio)) + nd - _f64(mu)
            - 0.5 * jnp.log(6.283 * nd * _f64(frac) * _f64(frac)))
    cond = (n > mu) & (obs > 5) & (zscore > 2)
    logp = jnp.where(cond, _f32(body), F32(0.0))
    logp = jnp.where(obs == 0, jnp.inf, logp).astype(F32)
    return _f32(logp + _f32(bonferroni_sum))


def base_log_pvalues_ref(counts, expected) -> jax.Array:
    """Base-pattern log p-values with the reference's promotion points
    (reference: src/base_pattern.cpp:231-250; numerics.base_log_pvalue —
    the literal 1.0 makes ``frac`` a double subtraction)."""
    n32 = _f32(counts)
    mu = _f32(expected)
    frac = _f32(1.0 - _f64(_f32(mu / _f32(n32 + 1))))
    nd = _f64(n32)
    ratio = _f32(mu / n32)
    body = (nd * jnp.log(_f64(ratio)) + nd - _f64(mu)
            - 0.5 * jnp.log(6.283 * nd * _f64(frac) * _f64(frac)))
    out = jnp.where((n32 > mu) & (counts > 5), _f32(body), F32(0.0))
    return jnp.where(counts == 0, jnp.inf, out).astype(F32)


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
