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
    """device_get an arbitrary pytree of device arrays with a single
    host<->device round trip; returns the same pytree of numpy
    arrays."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    metas = [(tuple(x.shape), np.dtype(x.dtype)) for x in leaves]
    flat = np.ascontiguousarray(
        jax.device_get(_pack_leaves(leaves)), dtype=np.uint32)
    out = []
    off = 0
    for shape, dt in metas:
        w = _words(shape, dt)
        chunk = flat[off : off + w]
        off += w
        if dt == np.bool_:
            arr = chunk.astype(bool)
        elif dt.itemsize > 4 or dt != np.uint32:
            arr = chunk.view(dt)
        else:
            arr = chunk
        out.append(arr.reshape(shape).copy())
    return jax.tree_util.tree_unflatten(treedef, out)
