"""The IUPAC hill climb: lockstep device walks + host seen-set replay.

Reference control flow (src/peng.cpp:437-541): for each selected seed,
repeatedly evaluate every single-position IUPAC mutation ("similar"
letters, src/iupac_alphabet.cpp:47-136) of the current best pattern, in
position-major order, accepting every strict improvement of the
optimization score; a global ``seen`` set kills a walk when its step's
best pattern was evaluated before, and decides final emission.

The key structural fact this module exploits: **a walk's trajectory is
independent of the seen set**.  The seen set never changes which mutant
a step picks (that is a pure running-minimum over the step's candidate
scores, src/peng.cpp:485-497); it only decides where a walk *stops*
(src/peng.cpp:504-506) and whether its endpoint is *emitted*
(src/peng.cpp:511-524).  So:

* the device runs all S walks **in parallel lockstep** — one fused
  program, ``lax.while_loop`` over steps, each step evaluating all
  S x W x 10 single-position mutants through the marginal-table
  formulation (ops/flat_tables) — sequential depth = the longest walk
  (~15 steps) instead of the sum of all walk lengths (~800);
* the host **replays** the sequential seen-set bookkeeping over the
  returned trajectories in seed order — pure integer set arithmetic,
  microseconds — truncating each walk at its kill step and reproducing
  the reference's decisions exactly.

Score arithmetic: candidate scores are computed with the reference's
exact float32-storage / float64-transcendental promotion points
(ops/flat_tables score functions mirroring utils/numerics.py) and
compared as float32, exactly as the reference compares its ``float``
scores.  The only remaining deviation from the reference binary is the
tree (vs sequential) order of the f32 aggregation sums and backend-libm
last-ulps — documented tolerance of the TPU engine.  Count sums are
exact while ltot < 2**24 (the caller asserts this and falls back
otherwise).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import flat_tables as ft
from ..alphabets import IUPAC_MASKS, IUPAC_SIMILAR, LOG_BONFERRONI

F32 = jnp.float32

# Count sums must stay exact in f32 (the walk decisions compare strict
# floats); on TPU the default matmul precision would lower these f32
# einsums to bf16 MXU passes and round them — pin full-f32 accumulation.
_einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

MAXSIM = max(len(s) for s in IUPAC_SIMILAR)  # 10 (letter N)

# [11, MAXSIM] similar-letter table, -1 padded, reference order
SIM_TABLE = np.full((len(IUPAC_SIMILAR), MAXSIM), -1, dtype=np.int32)
for _c, _sims in enumerate(IUPAC_SIMILAR):
    SIM_TABLE[_c, : len(_sims)] = _sims

MAX_STEPS = 48     # longest supported walk (score strictly decreases
                   # each step; real walks take ~15 steps at W=10)
ACC_CAP = 12       # per-step accepted-row trace slots (running-min
                   # improvements within one step's ~W*10 candidates)


class WalkTrace(NamedTuple):
    """Host-side (numpy) view of the lockstep walk run.  T = number of
    device steps executed, S = number of seed slots."""

    improved: np.ndarray         # [T, S] bool — step strictly improved
    chosen_idx: np.ndarray       # [T, S] int32 candidate index (p*MAXSIM+j)
    chosen_counts: np.ndarray    # [T, S] f32 (exact integers)
    chosen_expected: np.ndarray  # [T, S] f32
    chosen_bgp: np.ndarray       # [T, S] f32
    chosen_score: np.ndarray     # [T, S] f32
    acc_idx: np.ndarray          # [T, S, R] int32
    acc_counts: np.ndarray       # [T, S, R] f32
    acc_expected: np.ndarray     # [T, S, R] f32
    acc_score: np.ndarray        # [T, S, R] f32
    acc_n: np.ndarray            # [T, S] int32
    init_counts: np.ndarray      # [S] f32 (seed IUPAC aggregate)
    init_expected: np.ndarray    # [S] f32
    init_bgp: np.ndarray         # [S] f32
    init_score: np.ndarray       # [S] f32 (from the base tables)
    n_steps: int
    overflow: bool


class SeedOutcome(NamedTuple):
    """One seed's replayed walk: print rows + final pattern."""

    rows: List[Tuple[np.ndarray, int, float, float]]  # (digits, n, exp, score)
    emitted: bool
    final_digits: np.ndarray
    final_counts: int
    final_expected: np.float32
    final_bgp: np.float32


# ---------------------------------------------------------------------------
# device: lockstep walks
# ---------------------------------------------------------------------------


def _aggregate_full(stack: jax.Array, masks: jax.Array, length: int,
                    both: bool) -> jax.Array:
    """Aggregate of one full IUPAC mask set over the stacked tables
    (S(m) + S(m_rc) - S(m & m_rc), reference: src/iupac_pattern.cpp:410-441)."""
    s1 = ft.sep_sum_flat(stack, masks, length)
    if not both:
        return s1
    mrc = masks[::-1, ::-1]
    s2 = ft.sep_sum_flat(stack, mrc, length)
    s3 = ft.sep_sum_flat(stack, masks * mrc, length)
    return s1 + s2 - s3


def _candidate_aggregates(stack, m, cand_letters, pos_idx, length, both):
    """Aggregates for all single-position mutants via marginals.

    stack: [G, 4**W]; m: [W, 4] mother masks; cand_letters: [C] IUPAC
    codes; pos_idx: [C] mutated position.  Returns [G, C].

    A mutant differs from its mother at one position p, so its
    double-strand-deduped aggregate S(m) + S(m_rc) - S(m & m_rc)
    (reference: src/iupac_pattern.cpp:410-441) reduces to dot products
    with the mother's single-position marginals (terms 1, 2) and
    (p, W-1-p) pair marginals (term 3: the rc-mask of a single-position
    mutant differs at the *mirror* position).
    """
    masks_tbl = jnp.asarray(IUPAC_MASKS, dtype=F32)
    u = masks_tbl[cand_letters]                      # [C, 4]
    marg1 = ft.all_marginals(stack, m, length)       # [G, W, 4]
    s1 = _einsum("gca,ca->gc", marg1[:, pos_idx], u)
    if not both:
        return s1

    mrc = m[::-1, ::-1]
    marg2 = ft.all_marginals(stack, mrc, length)
    mirror = length - 1 - pos_idx                    # [C]
    uf = u[:, ::-1]                                  # flip(u)
    s2 = _einsum("gca,ca->gc", marg2[:, mirror], uf)

    pm = ft.pair_marginals(stack, m * mrc, length)   # [G, W//2, 4, 4]
    pair_idx = jnp.minimum(pos_idx, mirror)
    is_low = pos_idx < (length // 2)
    m_mirror = m[mirror]                             # [C, 4] mother at mirror
    mask_p = u * m_mirror[:, ::-1]                   # candidate-position mask
    mask_mir = m_mirror * uf                         # mirror-position mask
    pmg = pm[:, pair_idx]                            # [G, C, 4, 4]
    s3_low = _einsum("gcab,ca,cb->gc", pmg, mask_p, mask_mir)
    s3_high = _einsum("gcab,ca,cb->gc", pmg, mask_mir, mask_p)
    s3 = jnp.where(is_low[None, :], s3_low, s3_high)
    return s1 + s2 - s3


@functools.partial(
    jax.jit,
    static_argnames=(
        "length", "both", "score_type", "max_steps", "acc_cap", "wide"))
def walks_program(
    counts_flat: jax.Array,     # [4**W] int32, mirrored counts
    expected_flat: jax.Array,   # [4**W] f32
    bgp_flat: jax.Array,        # [4**W] f32 (strand-aggregated, order k)
    seed_ids: jax.Array,        # [S] int32 base-pattern ids
    seed_valid: jax.Array,      # [S] bool
    n_sequences: jax.Array,     # f32 scalar
    pseudo_expected: jax.Array, # f32 scalar
    length: int,
    both: bool,
    score_type: int,
    max_steps: int = MAX_STEPS,
    acc_cap: int = ACC_CAP,
    wide: bool = False,
):
    W = length
    C = W * MAXSIM
    S = seed_ids.shape[0]
    R = acc_cap

    # wide mode (large corpora): f32 holds integer count sums exactly
    # only below 2**24; past that the aggregation chain runs in f64
    # (TPU software floats — tables here are tiny), keeping aggregates
    # exact up to 2**53.  Score math still rounds through f32 at the
    # reference's promotion points (the C++ casts size_t counts to
    # float the same way), so walk decisions stay reference-faithful.
    AGG = jnp.float64 if wide else F32

    counts_f = counts_flat.astype(AGG)
    if both:
        canon = ft.canonical_mask(W)
        stack = jnp.stack([
            jnp.where(canon, counts_f, AGG(0)),
            jnp.where(canon, expected_flat.astype(AGG), AGG(0)),
            jnp.where(canon, bgp_flat.astype(AGG), AGG(0)),
        ])
    else:
        stack = jnp.stack([counts_f, expected_flat.astype(AGG),
                           bgp_flat.astype(AGG)])

    # hi/lo bilinear layout: flat id = hi * 4**half + lo, so the table
    # is a [G, H, L] tensor and a separable-mask aggregate is the
    # bilinear form  kron_hi^T X kron_lo  — per step, all three mask
    # sets' X-contractions batch into two MXU matmuls instead of
    # O(W^2) shrinking einsums (see _batched_eval below).
    half = W // 2
    Lb = 4 ** half
    X = stack.reshape(3, Lb, Lb)
    dig = np.stack([(np.arange(Lb) >> (2 * p)) & 3
                    for p in range(half)])               # [half, L]
    oh_np = np.zeros((half, 4, Lb),
                     dtype=np.float64 if wide else np.float32)
    for _p in range(half):
        oh_np[_p, dig[_p], np.arange(Lb)] = 1.0
    DIG = jnp.asarray(dig.astype(np.int32))
    OH = jnp.asarray(oh_np)
    POS_H = jnp.arange(half, dtype=jnp.int32)[:, None]   # [half, 1]

    sim_tbl = jnp.asarray(SIM_TABLE)
    masks_tbl = jnp.asarray(IUPAC_MASKS, dtype=AGG)
    lb = jnp.asarray(np.asarray(LOG_BONFERRONI, dtype=np.float32))
    pos_idx = jnp.repeat(jnp.arange(W, dtype=jnp.int32), MAXSIM)  # [C]
    mirror = W - 1 - pos_idx                                      # [C]
    pair_lo = jnp.minimum(pos_idx, mirror)                        # [C]
    is_low = (pos_idx < half)[None, :, None]                      # [1, C, 1]

    def bonferroni_fold(digit_mat):
        """Sequential f32 fold over positions (the reference adds the
        letter penalties one by one, src/iupac_pattern.cpp:465-468)."""
        b = jnp.zeros(digit_mat.shape[:-1], dtype=F32)
        for p in range(W):
            b = (b + lb[digit_mat[..., p]]).astype(F32)
        return b

    def _factors(rows_half):
        """[S, half, 4] per-position rows -> [S, half, L] per-index
        factors (the mask value each position contributes per block
        index).  Mask entries are exactly 0/1 so every kron / cumprod
        below is exact regardless of multiply order."""
        return rows_half[:, POS_H, DIG]

    def _loo(f):
        """Exclusive prefix x suffix products along the position axis:
        leave-one-out kron factors, [S, half, L]."""
        pre = jnp.cumprod(f, axis=1)
        suf = jnp.cumprod(f[:, ::-1], axis=1)[:, ::-1]
        pre_ex = jnp.concatenate(
            [jnp.ones_like(f[:, :1]), pre[:, :-1]], axis=1)
        suf_ex = jnp.concatenate(
            [suf[:, 1:], jnp.ones_like(f[:, :1])], axis=1)
        return pre_ex * suf_ex

    def _batched_eval(digits):
        """All C mutants of all S walks: (scores_f32, cnt, exp, bgp,
        letters), each [S, C] ([S, C, ...]).

        A mutant differs from its mother at one position p, so the
        double-strand dedup aggregate S(M) + S(M_rc) - S(M & M_rc)
        (reference: src/iupac_pattern.cpp:410-441) needs the mother's
        single-position marginals of mask sets A = M, B = M_rc (terms
        1, 2) and the (p, W-1-p) pair marginals of C = M & M_rc (term
        3: p and its mirror always straddle the hi/lo split).  All
        marginals come from two batched X-contractions plus small
        leave-one-out combines.
        """
        S_ = digits.shape[0]
        m = masks_tbl[digits]                            # [S, W, 4]
        sims = sim_tbl[digits]                           # [S, W, MAXSIM]
        cand_letters = sims.reshape(S_, -1)              # [S, C]
        valid = cand_letters >= 0
        letters = jnp.where(valid, cand_letters, 0)

        if both:
            mf = m[:, ::-1, ::-1]                        # B rows (rc set)
            mc = m * mf                                  # C rows (dedup set)
            fA_lo, fA_hi = _factors(m[:, :half]), _factors(m[:, half:])
            fB_lo, fB_hi = _factors(mf[:, :half]), _factors(mf[:, half:])
            fC_lo, fC_hi = _factors(mc[:, :half]), _factors(mc[:, half:])

            # hi-side contraction: A/B full krons + C leave-one-out
            # (reversed so slot p pairs global hi position W-1-p with
            # lo position p)
            looC_hi4 = (_loo(fC_hi)[:, ::-1, None, :]
                        * OH[None, ::-1])                # [S, half, 4, H]
            hi_cat = jnp.concatenate([
                jnp.prod(fA_hi, axis=1)[:, None],
                jnp.prod(fB_hi, axis=1)[:, None],
                looC_hi4.reshape(S_, 4 * half, Lb),
            ], axis=1)                                   # [S, 2+4*half, H]
            Zt = _einsum("ghl,skh->sgkl", X, hi_cat)

            lo_cat = jnp.stack(
                [jnp.prod(fA_lo, axis=1), jnp.prod(fB_lo, axis=1)], axis=1)
            Yt = _einsum("ghl,skl->sgkh", X, lo_cat)  # [S, 3, 2, H]

            MA = jnp.concatenate([
                _einsum("sgl,spl,pal->sgpa", Zt[:, :, 0], _loo(fA_lo), OH),
                _einsum("sgh,sph,pah->sgpa", Yt[:, :, 0], _loo(fA_hi), OH),
            ], axis=2)                                   # [S, 3, W, 4]
            MB = jnp.concatenate([
                _einsum("sgl,spl,pal->sgpa", Zt[:, :, 1], _loo(fB_lo), OH),
                _einsum("sgh,sph,pah->sgpa", Yt[:, :, 1], _loo(fB_hi), OH),
            ], axis=2)
            ZC = Zt[:, :, 2:].reshape(S_, 3, half, 4, Lb)
            looC_lo4 = _loo(fC_lo)[:, :, None, :] * OH[None]
            G = _einsum("sgpbl,spal->sgpab", ZC, looC_lo4)

            u = masks_tbl[letters]                       # [S, C, 4]
            uf = u[..., ::-1]
            sidx = jnp.arange(S_)[:, None]
            s1 = _einsum("sgca,sca->sgc", MA[:, :, pos_idx], u)
            s2 = _einsum("sgca,sca->sgc", MB[:, :, mirror], uf)
            m_mir = m[sidx, mirror[None, :]]             # [S, C, 4]
            mlo_low, mhi_low = u * m_mir[..., ::-1], m_mir * uf
            mask_lo = jnp.where(is_low, mlo_low, mhi_low)
            mask_hi = jnp.where(is_low, mhi_low, mlo_low)
            s3 = _einsum("sgcab,sca,scb->sgc",
                            G[:, :, pair_lo], mask_lo, mask_hi)
            agg = s1 + s2 - s3                           # [S, 3, C]
        else:
            fA_lo, fA_hi = _factors(m[:, :half]), _factors(m[:, half:])
            hi_cat = jnp.prod(fA_hi, axis=1)[:, None]
            Zt = _einsum("ghl,skh->sgkl", X, hi_cat)
            Yt = _einsum("ghl,skl->sgkh", X,
                            jnp.prod(fA_lo, axis=1)[:, None])
            MA = jnp.concatenate([
                _einsum("sgl,spl,pal->sgpa", Zt[:, :, 0], _loo(fA_lo), OH),
                _einsum("sgh,sph,pah->sgpa", Yt[:, :, 0], _loo(fA_hi), OH),
            ], axis=2)
            u = masks_tbl[letters]
            agg = _einsum("sgca,sca->sgc", MA[:, :, pos_idx], u)

        c_c, e_c, b_c = agg[:, 0], agg[:, 1], agg[:, 2]  # [S, C]

        if score_type == 0:
            cand_digits = jnp.broadcast_to(
                digits[:, None, :], (S_, C, W))
            cand_digits = jnp.where(
                jnp.arange(W)[None, None, :] == pos_idx[None, :, None],
                letters[..., None], cand_digits)
            bsum = bonferroni_fold(cand_digits)
        else:
            bsum = jnp.zeros((S_, C), dtype=F32)
        scores = ft.optimization_scores(
            score_type, c_c, e_c, n_sequences, pseudo_expected, bsum)
        scores = jnp.where(valid & ~jnp.isnan(scores), scores, jnp.inf)
        return scores.astype(F32), c_c, e_c, b_c, letters

    # ---- init: seed digits, base-table scores, seed IUPAC aggregates ----
    digits0 = jnp.stack(
        [(seed_ids >> (2 * p)) & 3 for p in range(W)], axis=-1
    ).astype(jnp.int32)                                  # [S, W]
    base_c = counts_flat[seed_ids]
    base_e = expected_flat[seed_ids]
    if score_type == 0:
        init_score = ft.base_log_pvalues_ref(base_c, base_e)
    else:
        init_score = ft.base_optimization_scores(
            score_type, base_c.astype(F32), base_e, None,
            n_sequences, pseudo_expected)
    init_score = init_score.astype(F32)
    init_agg = jax.vmap(
        lambda d: _aggregate_full(stack, masks_tbl[d], W, both))(digits0)
    # init_agg: [S, 3]

    zt_f = jnp.zeros((max_steps, S), dtype=F32)
    zt_a = jnp.zeros((max_steps, S), dtype=AGG)   # aggregate buffers
    zt_i = jnp.zeros((max_steps, S), dtype=jnp.int32)
    zt_b = jnp.zeros((max_steps, S), dtype=jnp.bool_)
    za_f = jnp.zeros((max_steps, S, R), dtype=F32)
    za_a = jnp.zeros((max_steps, S, R), dtype=AGG)
    za_i = jnp.zeros((max_steps, S, R), dtype=jnp.int32)

    def cond(st):
        t, _, _, _, _, _, active = st[:7]
        return (t < max_steps) & jnp.any(active)

    def body(st):
        (t, digits, best_score, bc, be, bb, active,
         improved_buf, chosen_idx_buf, chosen_cnt_buf, chosen_exp_buf,
         chosen_bgp_buf, chosen_sc_buf, acc_idx_buf, acc_cnt_buf,
         acc_exp_buf, acc_sc_buf, acc_n_buf, overflow) = st

        scores, c_c, e_c, b_c, letters = _batched_eval(digits)
        # scores: [S, C]

        # running-min accept trace (reference: src/peng.cpp:485-497;
        # strict < keeps the earliest min, same as jnp.argmin)
        incl = jax.lax.associative_scan(jnp.minimum, scores, axis=1)
        prev = jnp.minimum(
            best_score[:, None],
            jnp.concatenate(
                [jnp.full((S, 1), jnp.inf, dtype=F32), incl[:, :-1]], axis=1))
        accepted = (scores < prev) & active[:, None]
        best_idx = jnp.argmin(scores, axis=1).astype(jnp.int32)
        step_min = jnp.take_along_axis(
            scores, best_idx[:, None], axis=1)[:, 0]
        improved = (step_min < best_score) & active

        # compact accepted rows into R slots per walk
        ranks = jnp.cumsum(accepted, axis=1) - 1
        slot = jnp.where(accepted, jnp.minimum(ranks, R), R)  # R = dropped
        rows_s = jnp.arange(S, dtype=jnp.int32)[:, None]
        cand_i = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :], (S, C))
        pad = jnp.zeros((S, R + 1), dtype=F32)
        pada = jnp.zeros((S, R + 1), dtype=AGG)
        padi = jnp.zeros((S, R + 1), dtype=jnp.int32)
        a_idx = padi.at[rows_s, slot].set(cand_i)[:, :R]
        a_cnt = pada.at[rows_s, slot].set(c_c)[:, :R]
        a_exp = pada.at[rows_s, slot].set(e_c)[:, :R]
        a_sc = pad.at[rows_s, slot].set(scores)[:, :R]
        n_acc = jnp.sum(accepted, axis=1).astype(jnp.int32)
        overflow = overflow | jnp.any((n_acc > R) & active)

        # chosen mutation / state update
        ch_letter = jnp.take_along_axis(letters, best_idx[:, None], axis=1)[:, 0]
        ch_pos = pos_idx[best_idx]
        new_digits = jnp.where(
            (jnp.arange(W, dtype=jnp.int32)[None, :] == ch_pos[:, None])
            & improved[:, None],
            ch_letter[:, None], digits)
        pick = lambda arr: jnp.take_along_axis(  # noqa: E731
            arr, best_idx[:, None], axis=1)[:, 0]
        bc = jnp.where(improved, pick(c_c), bc)
        be = jnp.where(improved, pick(e_c), be)
        bb = jnp.where(improved, pick(b_c), bb)
        best_score = jnp.where(improved, step_min, best_score)

        improved_buf = improved_buf.at[t].set(improved)
        chosen_idx_buf = chosen_idx_buf.at[t].set(best_idx)
        chosen_cnt_buf = chosen_cnt_buf.at[t].set(pick(c_c))
        chosen_exp_buf = chosen_exp_buf.at[t].set(pick(e_c))
        chosen_bgp_buf = chosen_bgp_buf.at[t].set(pick(b_c))
        chosen_sc_buf = chosen_sc_buf.at[t].set(step_min)
        acc_idx_buf = acc_idx_buf.at[t].set(a_idx)
        acc_cnt_buf = acc_cnt_buf.at[t].set(a_cnt)
        acc_exp_buf = acc_exp_buf.at[t].set(a_exp)
        acc_sc_buf = acc_sc_buf.at[t].set(a_sc)
        acc_n_buf = acc_n_buf.at[t].set(jnp.where(active, n_acc, 0))

        return (t + 1, new_digits, best_score, bc, be, bb, improved,
                improved_buf, chosen_idx_buf, chosen_cnt_buf, chosen_exp_buf,
                chosen_bgp_buf, chosen_sc_buf, acc_idx_buf, acc_cnt_buf,
                acc_exp_buf, acc_sc_buf, acc_n_buf, overflow)

    st0 = (jnp.int32(0), digits0, init_score,
           init_agg[:, 0], init_agg[:, 1], init_agg[:, 2], seed_valid,
           zt_b, zt_i, zt_a, zt_a, zt_a, zt_f,
           za_i, za_a, za_a, za_f, zt_i, jnp.bool_(False))
    st = jax.lax.while_loop(cond, body, st0)
    (t_end, _, _, _, _, _, active,
     improved_buf, chosen_idx_buf, chosen_cnt_buf, chosen_exp_buf,
     chosen_bgp_buf, chosen_sc_buf, acc_idx_buf, acc_cnt_buf,
     acc_exp_buf, acc_sc_buf, acc_n_buf, overflow) = st
    overflow = overflow | jnp.any(active)  # ran out of steps mid-walk

    # Fetch-side narrowing: in wide mode the aggregation ran in f64 so
    # every count sum is an exact integer, and every DECISION (mutant
    # argmin, acceptance) is already made above in f64 — but the host
    # only ever consumes these leaves through int()/F32() casts
    # (engine_tpu._motif_from_aggregates, the climb stdout rows), so
    # the trace ships as 4-byte dtypes: counts as uint32 (exact: the
    # engine guards ltot < 2**31), floats as f32.  This keeps the trace
    # single-round-trip on tunneled backends, whose X64 rewriting
    # cannot lower the 8-byte packed-fetch bitcast (a wide trace paid
    # ~8 extra fetch round trips, ~0.4 s, before this).
    def _cnt32(x):
        return jnp.rint(x).astype(jnp.uint32) if wide else x

    def _f32(x):
        return x.astype(F32)

    return dict(
        improved=improved_buf, chosen_idx=chosen_idx_buf,
        chosen_counts=_cnt32(chosen_cnt_buf),
        chosen_expected=_f32(chosen_exp_buf),
        chosen_bgp=_f32(chosen_bgp_buf), chosen_score=chosen_sc_buf,
        acc_idx=acc_idx_buf, acc_counts=_cnt32(acc_cnt_buf),
        acc_expected=_f32(acc_exp_buf), acc_score=acc_sc_buf,
        acc_n=acc_n_buf,
        init_counts=_cnt32(init_agg[:, 0]),
        init_expected=_f32(init_agg[:, 1]),
        init_bgp=_f32(init_agg[:, 2]), init_score=init_score,
        n_steps=t_end, overflow=overflow,
    )


# stats of the last dispatched walk program (bench reads this to report
# patterns-scored/s): seeds = live walks, slots = padded lockstep width,
# steps = device steps taken, candidates_scored = semantic scoring work
# (live walks x W*MAXSIM mutants per step)
LAST_WALK_STATS: dict = {}

# walk-program compile registry: the engine's cold-start path checks
# this to decide between the device walks and the byte-exact host climb
# (compiles of this program take ~40 s on TPU; a cold process must not
# stall on it when the host climb costs ~0.2 s)
_compiled_walk_keys: set = set()


def walk_key(length: int, both: bool, score_type: int, wide: bool,
             max_seeds: int) -> tuple:
    S = max(8, 1 << (max(max_seeds, 1) - 1).bit_length())
    return (length, both, score_type, wide, S)


def mark_walk_compiled(key: tuple) -> None:
    _compiled_walk_keys.add(key)


def walk_compiled(key: tuple) -> bool:
    return key in _compiled_walk_keys


def run_walks(counts_flat, expected_flat, bgp_flat, seed_ids,
              length: int, both: bool, score_type: int, n_sequences: int,
              pseudo_expected: int, max_seeds: int,
              wide: bool = False) -> WalkTrace:
    """Host wrapper: pad seeds, dispatch once, fetch the trace.
    ``wide`` selects the f64 aggregation chain (exact integer count
    sums past 2**24, see walks_program)."""
    # power-of-two seed-slot bucket: the padded seed count is a shape,
    # and an unbucketed shape means one ~minute walks_program compile
    # per distinct corpus instead of per (W, bucket) pair
    S = max(8, 1 << (max_seeds - 1).bit_length())
    ids = np.zeros(S, dtype=np.int32)
    valid = np.zeros(S, dtype=bool)
    n = min(len(seed_ids), S)
    ids[:n] = np.asarray(seed_ids[:n], dtype=np.int32)
    valid[:n] = True

    out = walks_program(
        counts_flat, expected_flat, bgp_flat,
        jnp.asarray(ids), jnp.asarray(valid),
        jnp.float32(n_sequences), jnp.float32(pseudo_expected),
        length, both, score_type, wide=wide)
    mark_walk_compiled(walk_key(length, both, score_type, wide, max_seeds))
    # one packed transfer: the trace has 17 leaves and a tunneled
    # backend pays a full round trip per fetched buffer
    from ..utils.guarded_fetch import guarded_call  # noqa: PLC0415
    from ..utils.packed_fetch import fetch_packed  # noqa: PLC0415

    h = guarded_call(fetch_packed, out, what="climb trace")
    LAST_WALK_STATS.update(
        seeds=n, slots=S, steps=int(h["n_steps"]),
        candidates_scored=int(h["n_steps"]) * n * length * MAXSIM)
    return WalkTrace(
        improved=np.asarray(h["improved"]),
        chosen_idx=np.asarray(h["chosen_idx"]),
        chosen_counts=np.asarray(h["chosen_counts"]),
        chosen_expected=np.asarray(h["chosen_expected"]),
        chosen_bgp=np.asarray(h["chosen_bgp"]),
        chosen_score=np.asarray(h["chosen_score"]),
        acc_idx=np.asarray(h["acc_idx"]),
        acc_counts=np.asarray(h["acc_counts"]),
        acc_expected=np.asarray(h["acc_expected"]),
        acc_score=np.asarray(h["acc_score"]),
        acc_n=np.asarray(h["acc_n"]),
        init_counts=np.asarray(h["init_counts"]),
        init_expected=np.asarray(h["init_expected"]),
        init_bgp=np.asarray(h["init_bgp"]),
        init_score=np.asarray(h["init_score"]),
        n_steps=int(h["n_steps"]),
        overflow=bool(h["overflow"]),
    )


# ---------------------------------------------------------------------------
# host: seen-set replay
# ---------------------------------------------------------------------------

_POW11 = [11 ** p for p in range(32)]


def _key(digits) -> int:
    out = 0
    for p, d in enumerate(digits):
        out += int(d) * _POW11[p]
    return out


def _candidate_keys(digits, key: int, W: int):
    """All single-position mutant keys of a mother, reference order
    (src/peng.cpp:470-480): position-major, similar-letter order."""
    keys = []
    for p in range(W):
        c = int(digits[p])
        base = key - c * _POW11[p]
        for r in IUPAC_SIMILAR[c]:
            keys.append(base + r * _POW11[p])
    return keys


def replay_walks(trace: WalkTrace, seed_ids, W: int) -> List[SeedOutcome]:
    """Sequential seen-set bookkeeping over the device trajectories
    (reference: src/peng.cpp:450-541).  Returns one outcome per seed, in
    seed order, with the reference's exact kill/emit decisions."""
    seen: set = set()
    best_set: set = set()
    outcomes: List[SeedOutcome] = []

    for s, seed_id in enumerate(seed_ids):
        seed_id = int(seed_id)
        digits = np.asarray(
            [(seed_id >> (2 * p)) & 3 for p in range(W)], dtype=np.int32)
        key = _key(digits)
        rows: List[Tuple[np.ndarray, int, float, float]] = [(
            digits.copy(), int(trace.init_counts[s]),
            float(trace.init_expected[s]), float(trace.init_score[s]))]
        f_cnt = int(trace.init_counts[s])
        f_exp = np.float32(trace.init_expected[s])
        f_bgp = np.float32(trace.init_bgp[s])

        t = 0
        while True:
            # step t was evaluated by the device (the walk was active)
            cand_keys = set(_candidate_keys(digits, key, W))
            for j in range(int(trace.acc_n[t, s])):
                idx = int(trace.acc_idx[t, s, j])
                p, r = divmod(idx, MAXSIM)
                row_digits = digits.copy()
                row_digits[p] = SIM_TABLE[digits[p], r]
                rows.append((row_digits, int(trace.acc_counts[t, s, j]),
                             float(trace.acc_expected[t, s, j]),
                             float(trace.acc_score[t, s, j])))
            if not trace.improved[t, s]:
                # no improvement: every candidate enters seen, walk ends
                # (best == mother, never a candidate of its own step)
                seen |= cand_keys
                break
            idx = int(trace.chosen_idx[t, s])
            p, r = divmod(idx, MAXSIM)
            new_digits = digits.copy()
            new_digits[p] = SIM_TABLE[digits[p], r]
            new_key = key + (int(new_digits[p]) - int(digits[p])) * _POW11[p]
            f_cnt = int(trace.chosen_counts[t, s])
            f_exp = np.float32(trace.chosen_expected[t, s])
            f_bgp = np.float32(trace.chosen_bgp[t, s])
            killed = new_key in seen
            seen |= cand_keys - {new_key}
            digits, key = new_digits, new_key
            if killed:
                break
            t += 1

        emitted = key not in best_set and key not in seen
        if emitted:
            best_set.add(key)
            seen.add(key)
        outcomes.append(SeedOutcome(
            rows=rows, emitted=emitted, final_digits=digits,
            final_counts=f_cnt, final_expected=f_exp, final_bgp=f_bgp))
    return outcomes
