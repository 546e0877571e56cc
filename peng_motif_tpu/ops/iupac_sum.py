"""Batched IUPAC-pattern aggregation as separable mask contractions.

The reference expands every IUPAC pattern into its matching base k-mers
with an explicit stack walk, sorts them, and sums table entries over
distinct canonical ids (reference: src/iupac_pattern.cpp:331-473,
806-833).  On TPU the same quantity is a dense contraction:

An IUPAC pattern is a per-position 0/1 mask m_p over ACGT.  Its match
indicator over all 4**W ids factorizes as M[id] = prod_p m_p[c_p], and
the reverse-complement match indicator factorizes too:
Mrc[id] = prod_p m'_p[c_p] with m'_p[c] = m_{W-1-p}[3-c] (mask matrix
flipped along both axes).  "Sum of x over *distinct* canonical matching
ids" (double-strand dedup, src/iupac_pattern.cpp:364, 819-831) is then

    sum_id  x[id] * canon[id] * (M or Mrc)[id]
  = S(m) + S(m') - S(m & m')          with S separable per axis,

three chained axis contractions of the canonical-masked table — exact,
gather-free, and batchable over all hill-climb candidates with vmap.
Single-strand aggregation is the single term S(m) over the raw table.

Counts are contracted in int32 (exact); float tables in float32 with
HIGHEST precision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import encoding
from ..alphabets import IUPAC_MASKS, iupac_id_to_digits


def masks_from_iupac_digits(digits) -> np.ndarray:
    """[W, 4] int32 0/1 mask matrix for an IUPAC digit vector."""
    return IUPAC_MASKS[np.asarray(digits, dtype=np.int64)]


def masks_from_iupac_id(pattern_id: int, length: int) -> np.ndarray:
    return masks_from_iupac_digits(iupac_id_to_digits(pattern_id, length))


def _sep_sum(table: jax.Array, masks: jax.Array) -> jax.Array:
    """Full contraction of a rank-W table with one mask vector per axis.

    masks: [W, 4] with masks[p] applying to pattern position p
    (tensor axis W-1-p).
    """
    length = table.ndim
    res = table
    for pos in range(length - 1, -1, -1):
        # leading axis of res is axis_of_pos == 0 <=> position length-1,
        # so contract positions from high to low.
        res = jnp.tensordot(masks[pos], res, axes=(0, 0),
                            precision=jax.lax.Precision.HIGHEST)
    return res


@functools.partial(jax.jit, static_argnames=("both_strands",))
def aggregate_batch(
    counts_t: jax.Array,
    float_tables: jax.Array,
    masks: jax.Array,
    both_strands: bool = True,
):
    """Aggregate count + float tables over a batch of IUPAC masks.

    Args:
      counts_t: rank-W int32 count tensor.  In both_strands mode this must
        already be masked to canonical ids (counts * canon).
      float_tables: [F] + (4,)*W float32 stack (e.g. expected counts and
        background probabilities), canonical-masked in both_strands mode.
      masks: [B, W, 4] int32 0/1 candidate masks.
      both_strands: distinct-canonical dedup vs plain sum.

    Returns:
      counts_sum [B] int32, float_sums [B, F] float32.
    """

    def one(mask):
        m = mask
        if both_strands:
            mrc = m[::-1, ::-1]
            mand = m * mrc
            c = (_sep_sum(counts_t, m) + _sep_sum(counts_t, mrc)
                 - _sep_sum(counts_t, mand))
            mf, mrcf, mandf = (x.astype(jnp.float32) for x in (m, mrc, mand))
            f = (_float_sums(float_tables, mf) + _float_sums(float_tables, mrcf)
                 - _float_sums(float_tables, mandf))
        else:
            c = _sep_sum(counts_t, m)
            f = _float_sums(float_tables, m.astype(jnp.float32))
        return c, f

    return jax.vmap(one)(masks)


def _float_sums(tables: jax.Array, mask: jax.Array) -> jax.Array:
    """Contract [F] + (4,)*W float tables with one mask set -> [F]."""
    length = tables.ndim - 1
    res = tables
    for pos in range(length - 1, -1, -1):
        res = jnp.tensordot(mask[pos], res, axes=(0, 1),
                            precision=jax.lax.Precision.HIGHEST)
    return res
