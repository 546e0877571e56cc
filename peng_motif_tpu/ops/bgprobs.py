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


# host float32 path ---------------------------------------------------------
#
# The bg tables seed every float statistic downstream (expected counts,
# z-scores, p-values, EM odds); byte-parity with the reference binary
# requires each entry to be the product of the same float32-rounded
# multiply chain.  XLA preserves elementwise float semantics, but its
# fusion choices (e.g. rematerializing a permuted read as a different
# chain) are not contractual across program boundaries — so the parity-
# critical tables are built here on host, where the operation order is
# explicit, and the device keeps only the integer counting.

import numpy as np  # noqa: E402

_rev4_cache: dict = {}
_ids_cache: dict = {}
_rc_id_cache: dict = {}


def _rev4_table(k_eff: int) -> np.ndarray:
    """Reverse-base4 permutation of (k_eff+1)-digit numbers: converts a
    pattern-id little-endian sub-word into the BaMM big-endian kmer id
    (reference id layouts: src/base_pattern.h:20-29 vs 88-107)."""
    if k_eff not in _rev4_cache:
        n = k_eff + 1
        sub = np.arange(4 ** n, dtype=np.int32)
        out = np.zeros(4 ** n, dtype=np.int32)
        for j in range(n):
            out += ((sub >> (2 * j)) & 3) << (2 * (n - 1 - j))
        _rev4_cache[k_eff] = out
    return _rev4_cache[k_eff]


def _np_ids(length: int) -> np.ndarray:
    if length not in _ids_cache:
        _ids_cache[length] = np.arange(4 ** length, dtype=np.int32)
    return _ids_cache[length]


def np_rc_ids(length: int) -> np.ndarray:
    """rc(id) = base4-reverse of the per-digit complement
    (reference: src/base_pattern.cpp:119-144)."""
    if length not in _rc_id_cache:
        comp = (~_np_ids(length)) & np.int32(4 ** length - 1)
        out = np.zeros(4 ** length, dtype=np.int32)
        for p in range(length):
            out |= ((comp >> np.int32(2 * p)) & np.int32(3)) << np.int32(
                2 * (length - 1 - p))
        _rc_id_cache[length] = out
    return _rc_id_cache[length]


def host_bg_prob_flat(v, length: int, order: int) -> np.ndarray:
    """float32 background probabilities, multiplied in the reference's
    left-to-right position order (reference: src/base_pattern.cpp:285-325
    rounds after every factor)."""
    ids = _np_ids(length)
    p = np.ones(4 ** length, dtype=np.float32)
    for pos in range(length):
        k_eff = min(pos, order)
        vk = np.asarray(v[k_eff], dtype=np.float32)
        sub = (ids >> np.int32(2 * (pos - k_eff))) & np.int32(
            4 ** (k_eff + 1) - 1)
        p *= vk[_rev4_table(k_eff)[sub]]
    return p


def host_aggregate_double_strand_flat(p: np.ndarray,
                                      length: int) -> np.ndarray:
    """In the reference's in-place walk both strands' slots end up with
    p[min] + p[max] (src/base_pattern.cpp:268-283); a single correctly-
    rounded float32 add is order-independent, so one vectorized pass
    reproduces it."""
    rc = np_rc_ids(length)
    rc_vals = p[rc]
    ids = np.arange(p.shape[0], dtype=rc.dtype)
    return np.where(ids == rc, p, p + rc_vals).astype(np.float32)
