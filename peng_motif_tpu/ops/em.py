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
