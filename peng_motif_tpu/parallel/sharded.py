"""Sharded counting: data-parallel scan + one psum.

Replaces the reference's single-process OpenMP loops
(reference: src/base_pattern.cpp:289,331-441; SURVEY.md section 2 C20)
with shard_map over a 1-D device mesh: each device counts its shard of
sequences with the exact dedup scan, then count tables and the valid-
window total all-reduce over ICI.  Counting is the only phase that reads
sequences, so this single collective is the pipeline's entire
communication surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import encoding
from ..ops.counting import host_row_recount, naive_dedup


def _pad_batch(codes: np.ndarray, n_shards: int) -> np.ndarray:
    b = codes.shape[0]
    padded_b = ((b + n_shards - 1) // n_shards) * n_shards
    if padded_b == b:
        return codes
    out = np.zeros((padded_b,) + codes.shape[1:], dtype=codes.dtype)
    out[:b] = codes
    return out


def count_patterns_sharded(
    codes: np.ndarray, length: int, both_strands: bool, mesh: Mesh
):
    """Count patterns with sequences sharded across ``mesh``'s data axis.

    Per-shard results are exact (the dedup rule never crosses sequence
    boundaries, see ops/counting.py): each shard evaluates the
    vectorized naive rule + suspicion certificate, tables psum over the
    mesh, and the (rare) suspicious rows are exactly re-counted on host
    and applied as a sparse delta before the rc mirror — reproducing the
    serial table bit-for-bit.
    """
    n_shards = mesh.devices.size
    codes = _pad_batch(np.asarray(codes), n_shards)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(), P(), P("data")),
    )
    def shard_count(shard_codes):
        fwd, rc, valid = encoding.window_ids(shard_codes, length)
        if both_strands:
            cids = jnp.where(valid, jnp.minimum(fwd, rc), -1)
        else:
            cids = jnp.where(valid, fwd, -1)
        counted, suspicious = naive_dedup(cids, length)
        flat_ids = jnp.where(counted, cids, 0).reshape(-1)
        flat_inc = counted.reshape(-1).astype(jnp.int32)
        local = jnp.zeros(4 ** length, dtype=jnp.int32).at[flat_ids].add(flat_inc)
        local_ltot = valid.astype(jnp.int32).sum()
        return (
            jax.lax.psum(local, "data"),
            jax.lax.psum(local_ltot, "data"),
            suspicious,
        )

    arr = jax.device_put(
        jnp.asarray(codes), NamedSharding(mesh, P("data", None))
    )
    counts, ltot, suspicious = jax.jit(shard_count)(arr)

    susp_np = np.asarray(suspicious)
    if susp_np.any():
        counts_np = np.asarray(counts).astype(np.int64)
        delta: dict = {}
        for r in np.flatnonzero(susp_np):
            for cid, dv in host_row_recount(
                codes[r], length, both_strands
            ).items():
                delta[cid] = delta.get(cid, 0) + dv
        for cid, dv in delta.items():
            counts_np[cid] += dv
        counts = jnp.asarray(counts_np.astype(np.int32))

    if both_strands:
        tens = encoding.to_tensor(counts, length)
        canon = encoding.canonical_mask(length)
        tens = jnp.where(canon, tens, encoding.rc_permute(tens))
        counts = encoding.to_flat(tens)
    return counts, ltot


def count_bg_kmers_sharded(
    codes: np.ndarray, order: int, mesh: Mesh
):
    """Sharded (k+1)-mer counting for the background model: per-shard
    count vectors + psum (device path for large corpora; the host numpy
    path in models/background.py is the semantics oracle)."""
    n_shards = mesh.devices.size
    codes = _pad_batch(np.asarray(codes), n_shards)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=tuple(P() for _ in range(order + 1)),
    )
    def shard_count(shard_codes):
        outs = []
        for k in range(order + 1):
            y, ok = _bg_window_values(shard_codes, k)
            flat_y = jnp.where(ok, y, 0).reshape(-1)
            inc = ok.reshape(-1).astype(jnp.int32)
            tab = jnp.zeros(4 ** (k + 1), dtype=jnp.int32).at[flat_y].add(inc)
            outs.append(jax.lax.psum(tab, "data"))
        return tuple(outs)

    arr = jax.device_put(
        jnp.asarray(codes), NamedSharding(mesh, P("data", None))
    )
    return [np.asarray(t, dtype=np.int64) for t in jax.jit(shard_count)(arr)]


def _bg_window_values(codes: jax.Array, k: int):
    """Device version of the background (k+1)-mer window rule including the
    reference N-quirk (see models/background.py docstring).  Padding zeros
    count as Ns, and positions beyond each sequence end contribute v == 0
    windows — callers must subtract pad contributions or pad by whole
    sequences (count_bg_kmers_sharded pads with empty sequences, whose
    windows all have v == 0 at y == 0; exactness restored by subtracting
    the pad-row window count).
    """
    codes = codes.astype(jnp.int32)
    B, L = codes.shape
    is_n = (codes == 0).astype(jnp.int32)
    csum = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(is_n, axis=1)], axis=1
    )
    idx = jnp.arange(L)
    lo = jnp.maximum(idx - 8, 0)
    any_n9 = (csum[:, idx + 1] - csum[:, lo]) > 0
    v = jnp.zeros((B, L), dtype=jnp.int32)
    for j in range(k + 1):
        shifted = jnp.pad(codes, ((0, 0), (j, 0)))[:, :L]
        v = v + jnp.where(shifted > 0, (shifted - 1) * (4 ** j), 0)
    pos_ok = idx >= k
    ok = pos_ok[None, :] & ((~any_n9) | (v == 0))
    # windows fully inside padding are all-N with v==0: they'd be counted
    # as y=0 under the quirk, but the reference never sees padding.
    # Exclude windows whose *current* position is padding beyond the last
    # real base: a window ending on a pad zero with v==0 arises only from
    # all-N/pad content; the reference counts real all-N windows at y=0,
    # so keep N-windows but drop pure trailing padding.
    in_seq = _within_sequence(codes)
    ok = ok & in_seq
    return v, ok


def _within_sequence(codes: jax.Array) -> jax.Array:
    """True up to the last non-zero code of each row (real sequence extent,
    treating trailing zeros as padding)."""
    L = codes.shape[1]
    nonzero = codes > 0
    idx = jnp.arange(L)
    last = jnp.max(jnp.where(nonzero, idx[None, :], -1), axis=1)
    return idx[None, :] <= last[:, None]
