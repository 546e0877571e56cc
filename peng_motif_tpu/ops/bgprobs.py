"""Background probability tables as a per-position dynamic program.

The reference fills the 4**W background-probability table with a recursive
4-ary tree walk per Markov order (reference: src/base_pattern.cpp:285-325):

    P(pattern) = prod_{l=0}^{W-1} v[min(l,k)][ letters max(0,l-k)..l ]

Here the recursion becomes W broadcasted multiplies of the rank-W table by
small conditional-probability tensors — a data-parallel DP with no
recursion, ideal for the TPU VPU and fully fusable by XLA.

Axis convention: see ops/encoding.py (tensor axis a = position W-1-a).
The BaMM conditional table v[k] is big-endian over its (k+1)-mer
(earliest letter has factor 4**k, reference: src/base_pattern.h:88-103),
so v[k] reshaped row-major to (4,)*(k+1) has axes ordered
(earliest..latest) = *descending* tensor-axis order; reversing those axes
aligns it with the canonical layout.

Double-strand aggregation (reference: src/base_pattern.cpp:268-283):
non-palindromic entries hold p(fwd) + p(revcomp); palindromes stay as-is.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from . import encoding


@functools.partial(jax.jit, static_argnames=("length", "order"))
def bg_prob_table(v: Sequence[jax.Array], length: int, order: int) -> jax.Array:
    """Build the rank-W background probability tensor for one Markov order.

    Args:
      v: conditional tables; v[j] has shape [4**(j+1)] (big-endian BaMM
         layout), for j = 0..order.
      length: pattern length W.
      order: Markov order k used for this table.

    Returns:
      rank-W float32 tensor P with P[id] = background probability.
    """
    prob = jnp.ones((4,) * length, dtype=jnp.float32)
    for pos in range(length):
        k_eff = min(pos, order)
        lo, hi = pos - k_eff, pos  # positions covered by this conditional
        cond = v[k_eff].reshape((4,) * (k_eff + 1)).astype(jnp.float32)
        # reshaped axes run earliest->latest position = descending tensor
        # axis; reverse to ascending-axis (latest->earliest) order.
        cond = jnp.transpose(cond, tuple(reversed(range(k_eff + 1))))
        # broadcast over the remaining axes: target axes are
        # axis_of_pos(hi) .. axis_of_pos(lo) (contiguous).
        a_hi = encoding.axis_of_pos(length, hi)
        shape = (1,) * a_hi + (4,) * (k_eff + 1) + (1,) * (length - a_hi - k_eff - 1)
        prob = prob * cond.reshape(shape)
    return prob


@jax.jit
def aggregate_double_strand(prob: jax.Array) -> jax.Array:
    """Sum forward + reverse-complement probabilities at both ids;
    palindromes untouched (reference: src/base_pattern.cpp:268-283)."""
    length = prob.ndim
    ids = encoding.pattern_ids_tensor(length)
    rc_ids = encoding.rc_permute(ids)
    return jnp.where(ids == rc_ids, prob, prob + encoding.rc_permute(prob))
