"""Elementwise per-pattern statistics over the 4**W table.

Mirrors reference: src/base_pattern.cpp:231-265 (expected counts, log
p-values, z-scores) as fused elementwise device ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def expected_counts(bg_prob: jax.Array, ltot_f32: jax.Array) -> jax.Array:
    """expected[id] = bg_prob[id] * ltot (reference: src/base_pattern.cpp:260-265;
    the reference converts the size_t window count to float too)."""
    return bg_prob * ltot_f32.astype(jnp.float32)


@jax.jit
def zscores(counts: jax.Array, expected: jax.Array) -> jax.Array:
    """z = (observed - expected) / sqrt(expected)
    (reference: src/base_pattern.cpp:252-258)."""
    return (counts.astype(jnp.float32) - expected) / jnp.sqrt(expected)


@jax.jit
def log_pvalues(counts: jax.Array, expected: jax.Array) -> jax.Array:
    """Stirling-approximated upper-tail log p-value per pattern
    (reference: src/base_pattern.cpp:231-250).

    counts == 0            -> +inf
    counts <= mu or <= 5   -> 0
    else n*log(mu/n) + n - mu - 0.5*log(6.283*n*frac^2), frac = 1 - mu/(n+1)
    """
    n = counts.astype(jnp.float32)
    mu = expected
    frac = 1.0 - mu / (n + 1.0)
    body = n * jnp.log(mu / n) + n - mu - 0.5 * jnp.log(
        jnp.float32(6.283) * n * frac * frac)
    out = jnp.where((n > mu) & (n > 5), body, 0.0)
    return jnp.where(counts == 0, jnp.inf, out)
