"""The IUPAC hill climb as a single device program.

Reference control flow (src/peng.cpp:437-541): for each selected seed,
repeatedly evaluate every single-position IUPAC mutation ("similar"
letters, src/iupac_alphabet.cpp:47-136) of the current best pattern, in
position-major order, accepting every strict improvement of the
optimization score; a global ``seen`` set kills duplicate walks.  The
reference evaluates one mutant at a time on host; the exact engine
batches each step's mutants into one native call.  Here the **entire
phase** — all seeds, all steps, all mutants, the seen-set bookkeeping —
is one jitted program: ``lax.scan`` over seeds, ``lax.while_loop`` per
walk, and a marginal-table formulation that makes one step's W x 10
mutant aggregations cost ~3 passes over the 4**W table instead of
~W x 10 (see ops/flat_tables.all_marginals).

Key device-side structures:

* mutant aggregation: a mutant differs from its mother at one position
  p, so its aggregate  S(m) + S(m_rc) - S(m & m_rc)
  (double-strand dedup, src/iupac_pattern.cpp:410-473) reduces to dot
  products with the mother's single-position marginals (terms 1, 2) and
  (p, W-1-p) pair marginals (term 3; the rc-mask of a single-position
  mutant differs at the *mirror* position).
* the ``seen`` set: patterns are identified by a split base-11 key
  (lo = digits below W//2, hi = the rest — both < 2**31, exact in
  int32); membership is a vectorized compare against a bounded buffer,
  insertion a dynamic-slice append.  Overflow sets a flag the caller
  must check (it then falls back to the exact engine).
* the print trace: accepted mutants are compacted into bounded buffers
  (seed index, pattern key, counts, expected, score) so the host can
  replay the reference's stdout rows without a per-step round trip.

Returned aggregates are f32; count sums are exact while ltot < 2**24
(the caller asserts this and falls back otherwise).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import flat_tables as ft
from ..alphabets import IUPAC_MASKS, IUPAC_SIMILAR, LOG_BONFERRONI

F32 = jnp.float32

MAXSIM = max(len(s) for s in IUPAC_SIMILAR)  # 10 (letter N)

# [11, MAXSIM] similar-letter table, -1 padded, reference order
SIM_TABLE = np.full((len(IUPAC_SIMILAR), MAXSIM), -1, dtype=np.int32)
for _c, _sims in enumerate(IUPAC_SIMILAR):
    SIM_TABLE[_c, : len(_sims)] = _sims

SEEN_CAP = 65536   # candidate-slot capacity of the seen set
TRACE_CAP = 2048   # accepted-row trace capacity


class ClimbResult(NamedTuple):
    """Host-side view of one climb run (all numpy)."""

    best_digits: np.ndarray    # [S, W] int32 IUPAC digits of final patterns
    best_counts: np.ndarray    # [S] int64
    best_expected: np.ndarray  # [S] f32
    best_bgp: np.ndarray       # [S] f32
    emitted: np.ndarray        # [S] bool
    init_counts: np.ndarray    # [S] int64 (aggregate of the seed pattern)
    init_expected: np.ndarray  # [S] f32
    init_bgp: np.ndarray       # [S] f32
    init_score: np.ndarray     # [S] f32
    acc_seed: np.ndarray       # [T] int32 seed index per accepted row
    acc_digits: np.ndarray     # [T, W] int32 accepted pattern digits
    acc_counts: np.ndarray     # [T] int64
    acc_expected: np.ndarray   # [T] f32
    acc_score: np.ndarray      # [T] f32
    n_acc: int
    overflow: bool


def _split_key(digits: jax.Array, pow11_half: jax.Array, half: int):
    """(lo, hi) int32 split base-11 key of a digit vector [..., W]."""
    lo = jnp.sum(digits[..., :half] * pow11_half[:half], axis=-1)
    hi = jnp.sum(digits[..., half:] * pow11_half[half:], axis=-1)
    return lo.astype(jnp.int32), hi.astype(jnp.int32)


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
    """
    masks_tbl = jnp.asarray(IUPAC_MASKS, dtype=F32)
    u = masks_tbl[cand_letters]                      # [C, 4]
    marg1 = ft.all_marginals(stack, m, length)       # [G, W, 4]
    s1 = jnp.einsum("gca,ca->gc", marg1[:, pos_idx], u)
    if not both:
        return s1

    mrc = m[::-1, ::-1]
    marg2 = ft.all_marginals(stack, mrc, length)
    mirror = length - 1 - pos_idx                    # [C]
    uf = u[:, ::-1]                                  # flip(u)
    s2 = jnp.einsum("gca,ca->gc", marg2[:, mirror], uf)

    pm = ft.pair_marginals(stack, m * mrc, length)   # [G, W//2, 4, 4]
    pair_idx = jnp.minimum(pos_idx, mirror)
    is_low = pos_idx < (length // 2)
    m_mirror = m[mirror]                             # [C, 4] mother mask at mirror
    mask_p = u * m_mirror[:, ::-1]                   # candidate-position mask
    mask_mir = m_mirror * uf                         # mirror-position mask
    pmg = pm[:, pair_idx]                            # [G, C, 4, 4]
    s3_low = jnp.einsum("gcab,ca,cb->gc", pmg, mask_p, mask_mir)
    s3_high = jnp.einsum("gcab,ca,cb->gc", pmg, mask_mir, mask_p)
    s3 = jnp.where(is_low[None, :], s3_low, s3_high)
    return s1 + s2 - s3


@functools.partial(
    jax.jit,
    static_argnames=("length", "both", "score_type", "seen_cap", "trace_cap"))
def climb_program(
    counts_flat: jax.Array,     # [4**W] int32, mirrored counts
    expected_flat: jax.Array,   # [4**W] f32
    bgp_flat: jax.Array,        # [4**W] f32 (strand-aggregated, order k)
    logp_flat: jax.Array,       # [4**W] f32 base log p-values (seed scores)
    seed_ids: jax.Array,        # [S] int32 base-pattern ids
    seed_valid: jax.Array,      # [S] bool
    n_sequences: jax.Array,     # f32 scalar
    pseudo_expected: jax.Array, # f32 scalar
    length: int,
    both: bool,
    score_type: int,
    seen_cap: int = SEEN_CAP,
    trace_cap: int = TRACE_CAP,
):
    W = length
    half = W // 2
    C = W * MAXSIM
    S = seed_ids.shape[0]

    counts_f = counts_flat.astype(F32)
    if both:
        canon = ft.canonical_mask(W)
        stack = jnp.stack([
            jnp.where(canon, counts_f, 0.0),
            jnp.where(canon, expected_flat, 0.0),
            jnp.where(canon, bgp_flat, 0.0),
        ])
    else:
        stack = jnp.stack([counts_f, expected_flat, bgp_flat])

    sim_tbl = jnp.asarray(SIM_TABLE)
    masks_tbl = jnp.asarray(IUPAC_MASKS, dtype=F32)
    lb = jnp.asarray(LOG_BONFERRONI)
    pow11_half = jnp.asarray(
        [11 ** (p if p < half else p - half) for p in range(W)],
        dtype=jnp.int32)
    pos_idx = jnp.repeat(jnp.arange(W, dtype=jnp.int32), MAXSIM)  # [C]

    def bonferroni_fold(digit_mat):
        """Sequential f32 fold over positions (reference adds the letter
        penalties one by one, src/iupac_pattern.cpp:465-468)."""
        b = jnp.zeros(digit_mat.shape[:-1], dtype=F32)
        for p in range(W):
            b = (b + lb[digit_mat[..., p]]).astype(F32)
        return b

    def eval_step(digits, lo, hi, best_score, seen_lo, seen_hi):
        """One walk step: evaluate all mutants of `digits`."""
        m = masks_tbl[digits]                           # [W, 4]
        sims = sim_tbl[digits]                          # [W, MAXSIM]
        cand_letters = sims.reshape(-1)                 # [C] reference order
        valid = cand_letters >= 0
        letters = jnp.where(valid, cand_letters, 0)

        agg = _candidate_aggregates(
            stack, m, letters, pos_idx, W, both)        # [3, C]
        c_c, e_c, b_c = agg[0], agg[1], agg[2]

        if score_type == 0:
            cand_digits = jnp.broadcast_to(digits, (C, W))
            cand_digits = cand_digits.at[jnp.arange(C), pos_idx].set(letters)
            bsum = bonferroni_fold(cand_digits)
        else:
            bsum = jnp.zeros((C,), dtype=F32)
        scores = ft.optimization_scores(
            score_type, c_c, e_c, n_sequences, pseudo_expected, bsum)
        scores = jnp.where(valid & ~jnp.isnan(scores), scores, jnp.inf)

        # accept set: every strict improvement over the running best
        # (reference: src/peng.cpp:470-501); final best = first argmin
        incl = jax.lax.associative_scan(jnp.minimum, scores)
        prev_min = jnp.minimum(
            best_score, jnp.concatenate([jnp.full((1,), jnp.inf), incl[:-1]]))
        accepted = scores < prev_min
        best_idx = jnp.argmin(scores)
        step_min = scores[best_idx]
        improved = step_min < best_score

        # candidate split keys (int32-exact)
        delta = (letters - digits[pos_idx]) * pow11_half[pos_idx]
        c_lo = jnp.where(pos_idx < half, lo + delta, lo).astype(jnp.int32)
        c_hi = jnp.where(pos_idx >= half, hi + delta, hi).astype(jnp.int32)

        new_lo = jnp.where(improved, c_lo[best_idx], lo)
        new_hi = jnp.where(improved, c_hi[best_idx], hi)
        new_digits = jnp.where(
            improved,
            digits.at[pos_idx[best_idx]].set(letters[best_idx]),
            digits)
        in_seen = jnp.any((seen_lo == new_lo) & (seen_hi == new_hi))

        return dict(
            improved=improved, in_seen=in_seen,
            new_digits=new_digits, new_lo=new_lo, new_hi=new_hi,
            best_idx=best_idx, step_min=step_min,
            c_lo=c_lo, c_hi=c_hi, valid=valid,
            accepted=accepted, counts=c_c, expected=e_c, bgp=b_c,
            scores=scores,
        )

    def seed_body(carry, seed):
        (seen_lo, seen_hi, n_seen,
         acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
         overflow) = carry
        seed_id, s_valid, seed_idx = seed

        digits0 = jnp.stack(
            [(seed_id >> (2 * p)) & 3 for p in range(W)]).astype(jnp.int32)
        lo0, hi0 = _split_key(digits0, pow11_half, half)

        # seed score from the base tables (reference: src/peng.cpp:452-456)
        base_c = counts_flat[seed_id]
        base_e = expected_flat[seed_id]
        base_lp = logp_flat[seed_id]
        init_score = ft.base_optimization_scores(
            score_type, base_c[None].astype(F32), base_e[None],
            base_lp[None], n_sequences, pseudo_expected)[0]

        m0 = masks_tbl[digits0]
        init_agg = _aggregate_full(stack, m0, W, both)   # [3]

        def cond(st):
            return st[0]

        def body(st):
            (_, digits, lo, hi, bc, be, bb, bscore,
             seen_lo, seen_hi, n_seen,
             acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
             overflow) = st
            ev = eval_step(digits, lo, hi, bscore, seen_lo, seen_hi)

            # trace accepted rows (compacted append, drop-on-overflow)
            ranks = jnp.cumsum(ev["accepted"]) - 1
            slot = jnp.where(ev["accepted"], n_acc + ranks, trace_cap)
            cand_digits = jnp.broadcast_to(digits, (C, W)).at[
                jnp.arange(C), pos_idx].set(
                    jnp.where(ev["valid"], sim_tbl[digits].reshape(-1), 0))
            acc_seed = acc_seed.at[slot].set(seed_idx, mode="drop")
            acc_dig = acc_dig.at[slot].set(cand_digits, mode="drop")
            acc_cnt = acc_cnt.at[slot].set(ev["counts"], mode="drop")
            acc_exp = acc_exp.at[slot].set(ev["expected"], mode="drop")
            acc_sc = acc_sc.at[slot].set(ev["scores"], mode="drop")
            n_new = jnp.sum(ev["accepted"]).astype(jnp.int32)
            overflow = overflow | (n_acc + n_new > trace_cap)
            n_acc = jnp.minimum(n_acc + n_new, trace_cap)

            # seen-set update: insert every evaluated candidate except
            # the (possibly new) best (reference: src/peng.cpp:504-508)
            keep = ev["valid"] & ~((ev["c_lo"] == ev["new_lo"])
                                   & (ev["c_hi"] == ev["new_hi"]))
            ins_lo = jnp.where(keep, ev["c_lo"], -1)
            ins_hi = jnp.where(keep, ev["c_hi"], -1)
            overflow = overflow | (n_seen + C > seen_cap)
            start = jnp.minimum(n_seen, seen_cap - C)
            seen_lo = jax.lax.dynamic_update_slice(seen_lo, ins_lo, (start,))
            seen_hi = jax.lax.dynamic_update_slice(seen_hi, ins_hi, (start,))
            n_seen = jnp.minimum(n_seen + C, seen_cap)

            cont = ev["improved"] & ~ev["in_seen"]
            bi = ev["best_idx"]
            bc = jnp.where(ev["improved"], ev["counts"][bi], bc)
            be = jnp.where(ev["improved"], ev["expected"][bi], be)
            bb = jnp.where(ev["improved"], ev["bgp"][bi], bb)
            bscore = jnp.where(ev["improved"], ev["step_min"], bscore)
            return (cont, ev["new_digits"], ev["new_lo"], ev["new_hi"],
                    bc, be, bb, bscore, seen_lo, seen_hi, n_seen,
                    acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
                    overflow)

        st0 = (s_valid, digits0, lo0, hi0,
               init_agg[0], init_agg[1], init_agg[2], init_score,
               seen_lo, seen_hi, n_seen,
               acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
               overflow)
        st = jax.lax.while_loop(cond, body, st0)
        (_, digits, lo, hi, bc, be, bb, bscore,
         seen_lo, seen_hi, n_seen,
         acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc, overflow) = st

        # emit unless the final pattern is already known
        # (reference: src/peng.cpp:511-524; seen is a superset of the
        # emitted set, so one membership test suffices)
        in_seen = jnp.any((seen_lo == lo) & (seen_hi == hi))
        emitted = s_valid & ~in_seen
        start = jnp.minimum(n_seen, seen_cap - 1)
        seen_lo = jax.lax.dynamic_update_slice(
            seen_lo, jnp.where(emitted, lo, -1)[None], (start,))
        seen_hi = jax.lax.dynamic_update_slice(
            seen_hi, jnp.where(emitted, hi, -1)[None], (start,))
        overflow = overflow | (n_seen + 1 > seen_cap)
        n_seen = jnp.minimum(n_seen + 1, seen_cap)

        out = (digits, bc, be, bb, bscore, emitted,
               init_agg[0], init_agg[1], init_agg[2], init_score)
        carry = (seen_lo, seen_hi, n_seen,
                 acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
                 overflow)
        return carry, out

    init_carry = (
        jnp.full((seen_cap,), -1, dtype=jnp.int32),
        jnp.full((seen_cap,), -1, dtype=jnp.int32),
        jnp.int32(0),
        jnp.zeros((trace_cap,), dtype=jnp.int32),
        jnp.zeros((trace_cap, W), dtype=jnp.int32),
        jnp.zeros((trace_cap,), dtype=F32),
        jnp.zeros((trace_cap,), dtype=F32),
        jnp.zeros((trace_cap,), dtype=F32),
        jnp.int32(0),
        jnp.bool_(False),
    )
    seeds = (seed_ids.astype(jnp.int32), seed_valid,
             jnp.arange(S, dtype=jnp.int32))
    carry, outs = jax.lax.scan(seed_body, init_carry, seeds)
    (_, _, _, acc_seed, acc_dig, acc_cnt, acc_exp, acc_sc, n_acc,
     overflow) = carry
    (digits, bc, be, bb, bscore, emitted,
     ic, ie, ib, iscore) = outs
    return dict(
        best_digits=digits, best_counts=bc, best_expected=be, best_bgp=bb,
        best_score=bscore, emitted=emitted,
        init_counts=ic, init_expected=ie, init_bgp=ib, init_score=iscore,
        acc_seed=acc_seed, acc_digits=acc_dig, acc_counts=acc_cnt,
        acc_expected=acc_exp, acc_score=acc_sc, n_acc=n_acc,
        overflow=overflow,
    )


def run_climb(counts_flat, expected_flat, bgp_flat, logp_flat, seed_ids,
              length: int, both: bool, score_type: int, n_sequences: int,
              pseudo_expected: int, max_seeds: int) -> ClimbResult:
    """Host wrapper: pad seeds, dispatch once, fetch the small outputs."""
    S = max_seeds
    ids = np.zeros(S, dtype=np.int32)
    valid = np.zeros(S, dtype=bool)
    n = min(len(seed_ids), S)
    ids[:n] = np.asarray(seed_ids[:n], dtype=np.int32)
    valid[:n] = True

    out = climb_program(
        counts_flat, expected_flat, bgp_flat, logp_flat,
        jnp.asarray(ids), jnp.asarray(valid),
        jnp.float32(n_sequences), jnp.float32(pseudo_expected),
        length, both, score_type)
    h = jax.device_get(out)
    return ClimbResult(
        best_digits=np.asarray(h["best_digits"]),
        best_counts=np.asarray(h["best_counts"], dtype=np.float64).astype(
            np.int64),
        best_expected=np.asarray(h["best_expected"]),
        best_bgp=np.asarray(h["best_bgp"]),
        emitted=np.asarray(h["emitted"]),
        init_counts=np.asarray(h["init_counts"], dtype=np.float64).astype(
            np.int64),
        init_expected=np.asarray(h["init_expected"]),
        init_bgp=np.asarray(h["init_bgp"]),
        init_score=np.asarray(h["init_score"]),
        acc_seed=np.asarray(h["acc_seed"]),
        acc_digits=np.asarray(h["acc_digits"]),
        acc_counts=np.asarray(h["acc_counts"], dtype=np.float64).astype(
            np.int64),
        acc_expected=np.asarray(h["acc_expected"]),
        acc_score=np.asarray(h["acc_score"]),
        n_acc=int(h["n_acc"]),
        overflow=bool(h["overflow"]),
    )
