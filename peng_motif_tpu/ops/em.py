"""Tensorized saturated EM over the full 4**W count table.

The reference's EM (reference: src/peng.cpp:48-197) recomputes, per
iteration and per motif, odds[id] = prod_p pwm[p][c_p] / bg[id] for all
4**W ids with a recursive tree walk, then accumulates responsibilities
r[id] = count[id] * s / (1 + s / odds[id]) into a new PWM.  On TPU:

* odds is a product of W broadcasted PWM rows over the rank-W table;
* the PWM update new_pwm[p] = sum of r over every axis except
  axis_of_pos(p) — W axis-reductions;
* motifs batch with vmap; the count and background tables are fixed
  so they are laid out once in device memory.

Iteration control mirrors the reference exactly: loop while
(change > min_threshold) and (iterations < max_iterations), where change
is the L1 difference of the *normalized* new PWM vs the previous one
(src/peng.cpp:104-144); the returned PWM is the last computed one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import encoding


def _pwm_product(pwm: jax.Array, length: int) -> jax.Array:
    """prod_p pwm[p][c_p] as a rank-W tensor."""
    res = jnp.ones((4,) * length, dtype=jnp.float32)
    for pos in range(length):
        axis = encoding.axis_of_pos(length, pos)
        shape = (1,) * axis + (4,) + (1,) * (length - axis - 1)
        res = res * pwm[pos].reshape(shape)
    return res


def _axis_sums(r: jax.Array, length: int) -> jax.Array:
    """[W, 4] row p = sum of r over all axes except axis_of_pos(p)."""
    rows = []
    for pos in range(length):
        axis = encoding.axis_of_pos(length, pos)
        axes = tuple(a for a in range(length) if a != axis)
        rows.append(jnp.sum(r, axis=axes))
    return jnp.stack(rows)


@functools.partial(jax.jit, static_argnames=("length", "max_iterations"))
def em_optimize_flat(
    pwms: jax.Array,
    counts_flat: jax.Array,
    bg_flat: jax.Array,
    saturation_factor,
    min_threshold,
    max_iterations: int,
    length: int,
):
    """Flat-layout EM for the TPU engine (same iteration semantics as
    :func:`em_optimize`; reference: src/peng.cpp:48-178).

    Works on [4**W] flat tables — rank-W tensors tile on TPU as (8, 128)
    over the trailing dims, a 32x physical blow-up the flat layout
    avoids.  The per-position responsibility sums are the all-ones-mask
    marginals of the responsibility table (ops/flat_tables).

    Args:
      pwms: [M, W, 4] f32; counts_flat/bg_flat: [4**W] f32 (mirrored
      counts; strand-aggregated bg of the optimization order).
    Returns (final pwms [M, W, 4], iterations [M]).
    """
    from . import flat_tables as ft  # noqa: PLC0415

    s = jnp.float32(saturation_factor)
    thr = jnp.float32(min_threshold)
    counts_s = counts_flat.astype(jnp.float32) * s
    ones = jnp.ones((length, 4), dtype=jnp.float32)
    n = 4 ** length

    def one_motif(pwm0):
        def cond(carry):
            _, change, it = carry
            return (change > thr) & (it < max_iterations)

        def body(carry):
            old_pwm, _, it = carry
            # prob[id] = prod_p pwm[p][digit_p]: the same left-to-right
            # f32 multiply chain as the reference's recursive descent
            # (src/peng.cpp:180-197) — bit-equal per entry
            prob = jnp.ones((n,), dtype=jnp.float32)
            for pos in range(length):
                lo = 4 ** pos
                prob = (prob.reshape(n // (4 * lo), 4, lo)
                        * old_pwm[pos].reshape(1, 4, 1)).reshape(-1)
            # the reference's exact op order (src/peng.cpp:118-127):
            # odds = prob/bg, then count*s / (1 + s/odds)
            odds = prob / bg_flat
            r = counts_s / (1.0 + s / odds)
            new_pwm = ft.all_marginals(r, ones, length)  # [W, 4]
            # normalize_pwm sums each row sequentially
            # (src/iupac_pattern.cpp:291-303)
            rs = (((new_pwm[:, 0] + new_pwm[:, 1]) + new_pwm[:, 2])
                  + new_pwm[:, 3])
            new_pwm = new_pwm / rs[:, None]
            # change: sequential f32 fold in (p, a) order (src/peng.cpp:131-137)
            d = jnp.abs(new_pwm - old_pwm).reshape(-1)
            change = jnp.zeros((), dtype=jnp.float32)
            for i in range(4 * length):
                change = change + d[i]
            return new_pwm, change, it + 1

        init = (pwm0, jnp.float32(length), jnp.int32(0))
        final_pwm, _, iters = jax.lax.while_loop(cond, body, init)
        return final_pwm, iters

    return jax.vmap(one_motif)(pwms.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("length", "max_iterations"))
def em_optimize(
    pwms: jax.Array,
    counts_t: jax.Array,
    bg_t: jax.Array,
    saturation_factor: float,
    min_threshold: float,
    max_iterations: int,
    length: int,
):
    """Run saturated EM on a batch of PWMs.

    Args:
      pwms: [M, W, 4] float32 initial PWMs.
      counts_t: rank-W float32 count tensor (mirrored counts, both ids).
      bg_t: rank-W float32 background probabilities (strand-aggregated).
      saturation_factor, min_threshold, max_iterations: see
        src/peng.cpp:48-144 (defaults 1e4, 0.08, 10).
      length: pattern length W.

    Returns:
      final pwms [M, W, 4], iterations used [M].
    """
    s = jnp.float32(saturation_factor)
    thr = jnp.float32(min_threshold)
    counts_s = counts_t * s  # hoisted: count * s is iteration-invariant

    def one_motif(pwm0):
        def cond(carry):
            _, change, it = carry
            return (change > thr) & (it < max_iterations)

        def body(carry):
            old_pwm, _, it = carry
            odds = _pwm_product(old_pwm, length) / bg_t
            r = counts_s / (1.0 + s / odds)
            new_pwm = _axis_sums(r, length)
            new_pwm = new_pwm / jnp.sum(new_pwm, axis=1, keepdims=True)
            change = jnp.sum(jnp.abs(new_pwm - old_pwm))
            return new_pwm, change, it + 1

        init = (pwm0, jnp.float32(length), jnp.int32(0))
        final_pwm, _, iters = jax.lax.while_loop(cond, body, init)
        return final_pwm, iters

    return jax.vmap(one_motif)(pwms.astype(jnp.float32))
