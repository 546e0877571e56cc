"""Device-side pattern-id tensor conventions.

The whole TPU pipeline treats the ``4**W`` pattern table as a rank-W
tensor of shape ``(4,) * W``.  The flat index equals the PEnG little-endian
pattern id (reference: src/base_pattern.h:20-29), which fixes the axis
convention:

    flat id = sum_p c_p * 4**p      (position p has factor 4**p)
    tensor T[c_{W-1}, ..., c_1, c_0] = flat[id]

so **tensor axis a corresponds to pattern position W-1-a** (row-major
reshape puts the most-significant digit first).  Use :func:`axis_of_pos`.

Under this convention the reverse-complement id permutation
(reference: src/base_pattern.cpp:119-144) is *not* a gather: reversing the
position order is an axis transpose, complementing each letter (c -> 3-c)
is an axis flip.  ``rc_permute`` is therefore pure layout manipulation that
XLA fuses for free — the TPU-native replacement for the reference's
half-pattern reverse-complement lookup tables.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def axis_of_pos(length: int, pos: int) -> int:
    """Tensor axis carrying pattern position ``pos``."""
    return length - 1 - pos


def to_tensor(flat: jax.Array, length: int) -> jax.Array:
    """Reshape a flat [4**W] table to the canonical rank-W tensor."""
    return flat.reshape((4,) * length)


def to_flat(tensor: jax.Array) -> jax.Array:
    return tensor.reshape(-1)


def rc_permute(tensor: jax.Array) -> jax.Array:
    """Given T[id] (rank-W), return T'[id] = T[revcomp(id)].

    revcomp reverses position order (axis transpose) and complements each
    letter c -> 3-c (axis flip).  Equivalent to the reference's
    getFastRevCompId-indexed lookup (src/base_pattern.cpp:137-144) but as a
    zero-FLOP layout transform.
    """
    ndim = tensor.ndim
    flipped = tensor[(slice(None, None, -1),) * ndim]
    return jnp.transpose(flipped, tuple(reversed(range(ndim))))


def pattern_ids_tensor(length: int) -> jax.Array:
    """Rank-W tensor whose entry at index id is id itself (int32)."""
    return to_tensor(jnp.arange(4 ** length, dtype=jnp.int32), length)


def rc_ids_tensor(length: int) -> jax.Array:
    """Rank-W tensor of reverse-complement ids (int32)."""
    return rc_permute(pattern_ids_tensor(length))


@functools.lru_cache(maxsize=None)
def _np_rc_ids(length: int) -> np.ndarray:
    ids = np.arange(4 ** length, dtype=np.int64)
    rc = np.zeros_like(ids)
    for p in range(length):
        digit = (ids >> (2 * p)) & 3
        rc |= (3 - digit) << (2 * (length - 1 - p))
    return rc.astype(np.int32)


@functools.lru_cache(maxsize=None)
def _np_canonical_mask(length: int) -> np.ndarray:
    ids = np.arange(4 ** length, dtype=np.int64)
    return ids <= _np_rc_ids(length)


@functools.lru_cache(maxsize=None)
def _np_canonical_idx(length: int) -> np.ndarray:
    return np.flatnonzero(_np_canonical_mask(length)).astype(np.int32)


def rc_ids_flat(length: int) -> jax.Array:
    """Flat [4**W] int32 array of reverse-complement ids — no rank-W
    intermediate (rank-W tensors tile on TPU as T(4,128), padding the
    trailing (4, 4) dims 32x).  Built in numpy and embedded as a
    program literal: computing it with traced ops makes XLA constant-
    fold a 4**W-op chain through its (slow) HLO evaluator at compile
    time — measured ~77 s of the w10 count-program compile."""
    return jnp.asarray(_np_rc_ids(length))


def canonical_mask_flat(length: int) -> jax.Array:
    """Flat [4**W] bool mask: id <= revcomp(id) (numpy literal, see
    rc_ids_flat)."""
    return jnp.asarray(_np_canonical_mask(length))


def canonical_idx_flat(length: int) -> jax.Array:
    """Ascending ids with id <= revcomp(id) ([(4**W + pal)/2] int32
    literal) — replaces in-graph ``jnp.nonzero(canonical_mask)``,
    which XLA would also constant-fold slowly."""
    return jnp.asarray(_np_canonical_idx(length))


def canonical_mask(length: int) -> jax.Array:
    """Boolean rank-W tensor: id <= revcomp(id).

    Canonical representatives for double-strand dedup
    (reference: src/base_pattern.cpp:362-364 uses min(id, revcomp)).
    """
    ids = pattern_ids_tensor(length)
    return ids <= rc_permute(ids)


def window_ids(codes: jax.Array, length: int):
    """Compute per-window pattern ids for a batch of encoded sequences.

    Args:
      codes: [B, L] uint8/int32 BaMM codes (0 = N/undefined/padding).
      length: pattern length W.

    Returns:
      (fwd_ids, rc_ids, valid): each [B, L - W + 1]; ids are int32 PEnG
      little-endian pattern ids; ``valid`` marks windows made entirely of
      defined bases (the reference skips windows containing code 0,
      src/base_pattern.cpp:350-353).
    """
    codes = codes.astype(jnp.int32)
    n_win = codes.shape[-1] - length + 1
    fwd = jnp.zeros(codes.shape[:-1] + (n_win,), dtype=jnp.int32)
    rc = jnp.zeros_like(fwd)
    valid = jnp.ones(fwd.shape, dtype=jnp.bool_)
    for p in range(length):
        c = jax.lax.dynamic_slice_in_dim(codes, p, n_win, axis=-1)
        valid = valid & (c > 0)
        fwd = fwd + (c - 1) * (4 ** p)
        rc = rc + (4 - c) * (4 ** (length - 1 - p))
    # clamp invalid windows to id 0 so downstream scatters stay in range
    fwd = jnp.where(valid, fwd, 0)
    rc = jnp.where(valid, rc, 0)
    return fwd, rc, valid


# numpy mirrors (host-side golden path used by tests) -----------------------


def np_rc_permute(table: np.ndarray, length: int) -> np.ndarray:
    t = table.reshape((4,) * length)
    t = t[(slice(None, None, -1),) * length]
    return np.transpose(t, tuple(reversed(range(length)))).reshape(-1)
