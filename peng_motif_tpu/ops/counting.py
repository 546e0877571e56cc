"""k-mer counting with exact non-overlap dedup semantics.

Replaces the reference's sequential rolling-hash scan
(reference: src/base_pattern.cpp:331-441) with a TPU formulation:

1. All window ids / reverse complements / validity are computed as dense
   vector ops over the [B, L] code array (``ops.encoding.window_ids``).
2. The reference's non-overlap rule — a window is counted only if the last
   *counted* occurrence of the same canonical pattern ended at least W
   positions earlier (src/base_pattern.cpp:362-366 via last_match_pos) —
   is sequential per pattern.  Because the reference inserts a W-position
   gap between sequences (src/base_pattern.cpp:382), blocking can never
   cross a sequence boundary, so sequences are independent and the rule
   reduces to: "was a window with the same canonical id counted at any of
   the previous W-1 window positions of this sequence?".  We carry exactly
   that: a ring of the last W-1 (canonical id, counted?) pairs per
   sequence inside one ``lax.scan``, vmapped over the whole batch.
3. Accepted windows scatter-add into the 4**W count table; in BOTH_STRANDS
   mode counts are mirrored to reverse-complement ids afterwards
   (src/base_pattern.cpp:386-392) via the flip/transpose rc permutation.

``ltot`` counts *all* valid windows, including ones rejected by the
non-overlap rule (src/base_pattern.cpp:367).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import encoding


@functools.partial(jax.jit, static_argnames=("length", "both_strands"))
def count_patterns(codes: jax.Array, length: int, both_strands: bool = True):
    """Count non-overlapping pattern occurrences over a sequence batch.

    Args:
      codes: [B, L] BaMM codes (0 = N / padding).
      length: pattern length W.
      both_strands: canonicalize ids to min(id, revcomp) and mirror counts.

    Returns:
      counts: [4**W] int32 count table (mirrored to rc ids when
        both_strands), ltot: int64 total number of valid windows.
    """
    fwd, rc, valid = encoding.window_ids(codes, length)
    cids = jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands else (
        jnp.where(valid, fwd, -1))

    counted = _dedup_scan(cids, length)

    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = jnp.zeros(4 ** length, dtype=jnp.int32).at[flat_ids].add(flat_inc)

    if both_strands:
        tens = encoding.to_tensor(counts, length)
        canon = encoding.canonical_mask(length)
        tens = jnp.where(canon, tens, encoding.rc_permute(tens))
        counts = encoding.to_flat(tens)

    ltot = valid.astype(jnp.int32).sum()
    return counts, ltot


def _dedup_scan(cids: jax.Array, length: int) -> jax.Array:
    """Per-sequence exact non-overlap dedup.

    cids: [B, NW] canonical ids, -1 for invalid windows.
    Returns counted: [B, NW] bool.
    """
    B = cids.shape[0]
    hist = length - 1  # windows closer than W positions can block

    if hist == 0:
        return cids >= 0

    def step(carry, cid_col):
        ring_id, ring_cnt = carry  # [B, hist] int32, bool
        blocked = jnp.any(ring_cnt & (ring_id == cid_col[:, None]), axis=1)
        counted = (cid_col >= 0) & ~blocked
        ring_id = jnp.concatenate([ring_id[:, 1:], cid_col[:, None]], axis=1)
        ring_cnt = jnp.concatenate([ring_cnt[:, 1:], counted[:, None]], axis=1)
        return (ring_id, ring_cnt), counted

    # derive the init carry from the input so its sharding/varying type
    # matches under shard_map (a fresh constant carry is 'unvarying' and
    # rejected inside manual-collective regions)
    zero_col = cids[:, :1] * 0
    init = (jnp.tile(zero_col - 2, (1, hist)),
            jnp.tile(zero_col == 1, (1, hist)))
    _, counted_t = jax.lax.scan(step, init, cids.T)
    return counted_t.T
