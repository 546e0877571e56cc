"""Fetch a pytree of device arrays as ONE transfer.

Tunneled backends pay a full round trip per fetched buffer (~10 ms
each); a 17-leaf trace fetch costs ~0.2 s of pure latency.  The pack
program bitcasts every leaf to uint32 words and concatenates, so the
host pays exactly one round trip and reslices locally.

Word layout per leaf (C order): itemsize <= 4 dtypes widen/bitcast to
one word per element; 8-byte dtypes bitcast to two words per element in
memory order (lax.bitcast_convert_type minor-dim split == little-endian
word order, pinned by tests/test_packed_fetch.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _leaf_to_u32(x: jax.Array) -> jax.Array:
    if x.dtype == jnp.bool_:
        x = x.astype(jnp.uint32)
    if x.dtype.itemsize < 4:
        x = x.astype(jnp.uint32)
    if x.dtype.itemsize > 4 or x.dtype != jnp.uint32:
        x = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return x.reshape(-1)


@jax.jit
def _pack_leaves(leaves):
    return jnp.concatenate([_leaf_to_u32(x) for x in leaves])


def _words(shape, dtype) -> int:
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    return n * (dtype.itemsize // 4 if dtype.itemsize > 4 else 1)


def fetch_packed(tree):
    """device_get an arbitrary pytree of device arrays with (almost)
    one host<->device round trip; returns the same pytree of numpy
    arrays.  8-byte dtypes (the wide-mode f64/i64 trace leaves) fetch
    unpacked — the tunneled backend's X64-rewriting pass cannot lower
    their bitcast — so they cost one transfer each; everything else
    shares a single packed blob."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    pack_idx = [i for i, x in enumerate(leaves)
                if np.dtype(x.dtype).itemsize <= 4]
    wide_idx = [i for i in range(len(leaves)) if i not in set(pack_idx)]
    out = [None] * len(leaves)
    if wide_idx:
        wides = jax.device_get([leaves[i] for i in wide_idx])
        for i, w in zip(wide_idx, wides):
            out[i] = np.asarray(w)
    if pack_idx:
        packable = [leaves[i] for i in pack_idx]
        metas = [(tuple(x.shape), np.dtype(x.dtype)) for x in packable]
        flat = np.ascontiguousarray(
            jax.device_get(_pack_leaves(packable)), dtype=np.uint32)
        off = 0
        for i, (shape, dt) in zip(pack_idx, metas):
            w = _words(shape, dt)
            chunk = flat[off : off + w]
            off += w
            if dt == np.bool_:
                arr = chunk.astype(bool)
            elif dt.itemsize < 4:
                # device widened each element to one u32 word by VALUE
                # (astype); a view() would reinterpret the word bytes and
                # yield 2x/4x too many elements.  astype undoes the value
                # cast (uint32 -> signed wraps modulo 2**bits, matching
                # the device-side promotion).
                arr = chunk.astype(dt)
            elif dt != np.uint32:
                arr = chunk.view(dt)
            else:
                arr = chunk
            out[i] = arr.reshape(shape).copy()
    return jax.tree_util.tree_unflatten(treedef, out)
