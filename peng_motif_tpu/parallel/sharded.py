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
from ..ops.pallas_hist import histogram
from ..ops.counting import naive_dedup


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

    Same transfer-minimal design as the single-device CountJob
    (ops/counting.py): the packed 2-bit buffer shards over the data
    axis, each shard counts its sequences with the vectorized exact
    dedup + suspicion certificate, the per-shard tables all-reduce with
    one integer ``psum`` over ICI, and only the canonical-id compaction
    leaves the device; the rc mirror and the (rare) suspicious-row
    fix-up run on host — reproducing the serial table bit-for-bit.

    Returns (counts_np int32 [4**W] host table, ltot int).
    """
    from ..ops.counting import (  # noqa: PLC0415
        _apply_fixup_rows, pack_codes,
    )

    n_shards = mesh.devices.size
    codes = _pad_batch(np.ascontiguousarray(codes, dtype=np.uint8), n_shards)
    seq_len = codes.shape[1]
    packed = pack_codes(codes)

    arr = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P("data", None))
    )
    vals, max_count, ltot, suspicious = jax.device_get(
        _batch_shard_program(mesh, seq_len, length, both_strands)(arr))
    if int(max_count) > np.iinfo(np.uint16).max:
        # overflow fallback: refetch the replicated full table as int32
        vals = np.asarray(_sharded_counts_i32(
            arr, seq_len, length, both_strands, mesh))

    if both_strands:
        from ..native import mirror_canonical_native  # noqa: PLC0415

        counts_np = mirror_canonical_native(vals, length)
        if counts_np is None:
            counts_np = _np_mirror(vals, length)
    else:
        counts_np = vals.astype(np.int32)

    susp_np = np.asarray(suspicious)
    if susp_np.any():
        counts64 = counts_np.astype(np.int64)
        _apply_fixup_rows(
            counts64, codes[np.flatnonzero(susp_np)], length, both_strands)
        counts_np = counts64.astype(np.int32)
    return counts_np, int(ltot)


def count_device_full_sharded(
    codes: np.ndarray, length: int, both_strands: bool, mesh: Mesh
):
    """Sharded counterpart of ops.counting.count_device_full for the TPU
    engine's mesh path (round-2 verdict next #5): the packed 2-bit
    buffer shards over the data axis, each shard counts its rows, and
    one integer ``psum`` replicates the full mirrored table across the
    mesh — where it stays resident for the replicated-table phases 2-4
    (stats, climb, PWM, EM), which are table-local and need no further
    communication (SURVEY.md section 5).

    Returns (counts_dev replicated [4**W] int32 resident,
    vals_u16 [n_canonical] uint16, max_count, ltot, suspicious [B_pad],
    codes_padded) — same contract as count_device_full plus the padded
    host codes (suspicious indexes into the padded batch).
    """
    from ..ops.counting import pack_codes  # noqa: PLC0415

    n_shards = mesh.devices.size
    codes = _pad_batch(np.ascontiguousarray(codes, dtype=np.uint8), n_shards)
    seq_len = codes.shape[1]
    packed = pack_codes(codes)

    arr = jax.device_put(
        jnp.asarray(packed), NamedSharding(mesh, P("data", None)))
    counts_dev, vals_u16, max_c, ltot, susp = _full_shard_program(
        mesh, seq_len, length, both_strands)(arr)
    return counts_dev, vals_u16, max_c, ltot, susp, codes


@functools.lru_cache(maxsize=64)
def _full_shard_program(mesh: Mesh, seq_len: int, length: int,
                        both_strands: bool):
    """Compiled resident-table sharded count program, cached on its
    static key (see _stream_shard_program for why)."""
    from ..ops.counting import _unpack_codes, scan_skip_mask  # noqa: PLC0415

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(), P(), P(), P(), P("data")),
        check_vma=False,
    )
    def shard_count(shard_buf):
        shard_codes = _unpack_codes(shard_buf, seq_len)
        fwd, rc, valid = encoding.window_ids(shard_codes, length)
        valid = valid & ~scan_skip_mask(shard_codes, valid, length)
        if both_strands:
            cids = jnp.where(valid, jnp.minimum(fwd, rc), -1)
        else:
            cids = jnp.where(valid, fwd, -1)
        counted, suspicious = naive_dedup(cids, length)
        flat_ids = jnp.where(counted, cids, 0).reshape(-1)
        flat_inc = counted.reshape(-1).astype(jnp.int32)
        local = histogram(flat_ids, flat_inc, 4 ** length)
        counts = jax.lax.psum(local, "data")
        ltot = jax.lax.psum(valid.astype(jnp.int64).sum(), "data")
        if both_strands:
            canon = encoding.canonical_mask_flat(length)
            canon_idx = encoding.canonical_idx_flat(length)
            vals = counts[canon_idx]
            rc_ids = encoding.rc_ids_flat(length)
            counts = jnp.where(canon, counts, counts[rc_ids])
        else:
            vals = counts
        return counts, vals.astype(jnp.uint16), vals.max(), ltot, suspicious

    return jax.jit(shard_count)


@functools.lru_cache(maxsize=64)
def _batch_shard_program(mesh: Mesh, seq_len: int, length: int,
                         both_strands: bool):
    """Compiled sharded batch-count program, cached on its static key
    (a per-call shard_map closure re-jits — retrace + server recompile
    — every run; see _stream_shard_program)."""
    from ..ops.counting import _unpack_codes, scan_skip_mask  # noqa: PLC0415

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(), P(), P(), P("data")),
        # pallas_call (MXU histogram) reports no vma; the outputs are
        # psum-replicated by construction
        check_vma=False,
    )
    def shard_count(shard_buf):
        shard_codes = _unpack_codes(shard_buf, seq_len)
        fwd, rc, valid = encoding.window_ids(shard_codes, length)
        valid = valid & ~scan_skip_mask(shard_codes, valid, length)
        if both_strands:
            cids = jnp.where(valid, jnp.minimum(fwd, rc), -1)
        else:
            cids = jnp.where(valid, fwd, -1)
        counted, suspicious = naive_dedup(cids, length)
        flat_ids = jnp.where(counted, cids, 0).reshape(-1)
        flat_inc = counted.reshape(-1).astype(jnp.int32)
        local = histogram(flat_ids, flat_inc, 4 ** length)
        local_ltot = valid.astype(jnp.int64).sum()
        counts = jax.lax.psum(local, "data")
        ltot = jax.lax.psum(local_ltot, "data")
        if both_strands:
            canon = encoding.canonical_mask_flat(length)
            canon_idx = encoding.canonical_idx_flat(length)
            vals = counts[canon_idx]
        else:
            vals = counts
        return vals.astype(jnp.uint16), vals.max(), ltot, suspicious

    return jax.jit(shard_count)


def stream_count_sharded(
    sequences, length: int, both_strands: bool, mesh: Mesh,
    flat_codes: np.ndarray | None = None, bg_order: int = -1,
    n_undefined=None,
):
    """Stream counting (ops/stream_count.py) with chunks sharded over
    the mesh's data axis: each device scans its slice of the gap-packed
    stream — a single long contig shards with exact 2(W-1)-window halo
    overlap (SURVEY.md section 5's long-context rule) — and one integer
    psum replicates the mirrored table for the table-local phases.
    ``bg_order >= 0`` additionally psums the fused background histogram
    (ops/stream_count.stream_bg_counts) over the same collective.
    Uniform N-free corpora take the 2-bit wire (-33% upload bytes; each
    shard reconstructs validity from its global chunk offset via
    ``axis_index``), same as the single-device fused path.

    Returns (counts_dev replicated resident, vals_u16, max_c, ltot,
    suspicious [m_pad], bg (device, or None), stream, layout).
    """
    from ..ops.stream_count import (  # noqa: PLC0415
        build_stream, chunked_packed, chunked_packed2, row_nbytes,
        row_nbytes2, wire2_eligible,
    )

    n_shards = mesh.devices.size
    stream, lay = build_stream(sequences, length, flat_codes=flat_codes)
    per = -(-lay.m_pad // n_shards)
    if per > 65536:
        # per-shard chunk counts above the slab threshold must
        # align to the slab (see _accumulated_local_counts)
        per = -(-per // 16384) * 16384
    m_pad = per * n_shards
    lay = lay._replace(m_pad=m_pad)

    with_bg = bg_order >= 0
    if n_undefined is None and flat_codes is not None:
        n_undefined = int(np.count_nonzero(flat_codes == 0))
    if n_undefined is not None and wire2_eligible(lay, n_undefined):
        arr = jax.device_put(
            jnp.asarray(chunked_packed2(stream, lay)),
            NamedSharding(mesh, P("data")))
        meta = jnp.asarray(
            [int(lay.lengths[0]), lay.stream_len], jnp.int32)
        counts_dev, vals, max_c, ltot, susp, bg = _stream_shard_program2(
            mesh, row_nbytes2(lay.row), lay.row, lay.ctx, length,
            both_strands, bg_order, per)(arr, meta)
    else:
        arr = jax.device_put(
            jnp.asarray(chunked_packed(stream, lay)),
            NamedSharding(mesh, P("data")))
        counts_dev, vals, max_c, ltot, susp, bg = _stream_shard_program(
            mesh, row_nbytes(lay.row), lay.row, lay.ctx, length,
            both_strands, bg_order)(arr)
    return (counts_dev, vals, max_c, ltot, susp,
            bg if with_bg else None, stream, lay)


@functools.lru_cache(maxsize=64)
def _stream_shard_program2(mesh: Mesh, nb: int, row: int, ctx: int,
                           length: int, both_strands: bool, bg_order: int,
                           per: int):
    """2-bit-wire variant of :func:`_stream_shard_program`: ``meta``
    carries (seq_len, stream_len) as traced scalars (one program per
    layout bucket), and every shard offsets its chunk indices by
    ``axis_index * per`` so the arithmetic validity rule sees global
    stream positions."""
    from ..ops.stream_count import (  # noqa: PLC0415
        _accumulated_local_counts, _unpack_codes2, stream_compact,
    )

    with_bg = bg_order >= 0

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P()),
        out_specs=(P(), P(), P(), P(), P("data"), P()),
        check_vma=False,
    )
    def shard_count(shard_flat, meta):
        base = jax.lax.axis_index("data").astype(jnp.int32) * per
        seq_len, stream_len = meta[0], meta[1]

        def codes_fn(sl, g0):
            return _unpack_codes2(sl, row, base + g0,
                                  row - length + 1 - ctx, ctx, length,
                                  seq_len, stream_len)

        local, local_ltot, susp, local_bg = _accumulated_local_counts(
            shard_flat.reshape(-1, nb), row, ctx, length,
            both_strands, bg_order, codes_fn=codes_fn)
        counts = jax.lax.psum(local, "data")
        ltot = jax.lax.psum(local_ltot, "data")
        bg = jax.lax.psum(local_bg, "data") if with_bg else (
            jnp.zeros((), dtype=jnp.int32))
        counts, vals, max_c = stream_compact(counts, length, both_strands)
        return counts, vals, max_c, ltot, susp, bg

    return jax.jit(shard_count)


@functools.lru_cache(maxsize=64)
def _stream_shard_program(mesh: Mesh, nb: int, row: int, ctx: int,
                          length: int, both_strands: bool, bg_order: int):
    """Compiled sharded stream-count program, cached on its static key:
    re-creating the shard_map closure per call re-jitted (retrace +
    server-side recompile) EVERY run — measured 6.5 s of a 7.3 s warm
    mesh-of-1 wall at 51.2 Mbases."""
    from ..ops.stream_count import (  # noqa: PLC0415
        _accumulated_local_counts, stream_compact,
    )

    with_bg = bg_order >= 0

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P(), P(), P(), P(), P("data"), P()),
        check_vma=False,
    )
    def shard_count(shard_flat):
        # flat upload (chunk-aligned shards: m_pad % n_shards == 0); a
        # 2-D put pays a per-shape layout-program compile the 1-D put
        # does not.  Slab-accumulated: a giant per-shard chunk count
        # would otherwise exceed HBM (see _accumulated_local_counts).
        local, local_ltot, susp, local_bg = _accumulated_local_counts(
            shard_flat.reshape(-1, nb), row, ctx, length,
            both_strands, bg_order)
        counts = jax.lax.psum(local, "data")
        ltot = jax.lax.psum(local_ltot, "data")  # int64 (see stream_count)
        bg = jax.lax.psum(local_bg, "data") if with_bg else (
            jnp.zeros((), dtype=jnp.int32))
        counts, vals, max_c = stream_compact(counts, length, both_strands)
        return counts, vals, max_c, ltot, susp, bg

    return jax.jit(shard_count)


def _sharded_counts_i32(arr, seq_len, length, both_strands, mesh):
    return _i32_shard_program(mesh, seq_len, length, both_strands)(arr)


@functools.lru_cache(maxsize=64)
def _i32_shard_program(mesh: Mesh, seq_len: int, length: int,
                       both_strands: bool):
    """Compiled uint16-overflow refetch program, cached on its static
    key (see _stream_shard_program for why)."""
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("data", None), out_specs=P(),
        check_vma=False,
    )
    def shard_count(shard_buf):
        from ..ops.counting import _unpack_codes, scan_skip_mask  # noqa: PLC0415
        shard_codes = _unpack_codes(shard_buf, seq_len)
        fwd, rc, valid = encoding.window_ids(shard_codes, length)
        valid = valid & ~scan_skip_mask(shard_codes, valid, length)
        cids = (jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands
                else jnp.where(valid, fwd, -1))
        counted, _ = naive_dedup(cids, length)
        flat_ids = jnp.where(counted, cids, 0).reshape(-1)
        flat_inc = counted.reshape(-1).astype(jnp.int32)
        local = histogram(flat_ids, flat_inc, 4 ** length)
        counts = jax.lax.psum(local, "data")
        if both_strands:
            canon = encoding.canonical_mask_flat(length)
            canon_idx = encoding.canonical_idx_flat(length)
            return counts[canon_idx]
        return counts

    return jax.jit(shard_count)


def _np_mirror(vals: np.ndarray, length: int) -> np.ndarray:
    ids = np.arange(4 ** length, dtype=np.int64)
    rc = encoding.np_rc_permute(ids, length)
    canon = np.flatnonzero(ids <= rc)
    full = np.zeros(4 ** length, dtype=np.int32)
    full[canon] = vals
    full[rc[canon]] = vals
    return full


def count_bg_kmers_sharded(
    codes: np.ndarray, order: int, mesh: Mesh,
    lengths: np.ndarray,
):
    """Sharded (k+1)-mer counting for the background model: per-shard
    count vectors + psum (device path for large corpora; the host numpy
    path in models/background.py is the semantics oracle).

    ``lengths`` (required) gives the true per-row sequence lengths; the
    reference counts every in-sequence window including trailing-N ones
    at y == 0 (src/shared/BackgroundModel.cpp counting loop, i < L), so
    the extent cannot be inferred from the codes (trailing Ns encode as
    0, same as padding)."""
    n_shards = mesh.devices.size
    codes = _pad_batch(np.asarray(codes), n_shards)
    lens = np.zeros(codes.shape[0], dtype=np.int32)
    lens[: len(lengths)] = np.asarray(lengths)
    lens = lens.astype(np.int32)

    sh = NamedSharding(mesh, P("data", None))
    arr = jax.device_put(jnp.asarray(codes), sh)
    lens_dev = jax.device_put(
        jnp.asarray(lens), NamedSharding(mesh, P("data"))
    )
    return [
        np.asarray(t, dtype=np.int64)
        for t in _bg_shard_program(mesh, order)(arr, lens_dev)
    ]


@functools.lru_cache(maxsize=64)
def _bg_shard_program(mesh: Mesh, order: int):
    """Compiled sharded bg (k+1)-mer program, cached on its static key
    (see _stream_shard_program for why)."""
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data", None), P("data")),
        out_specs=tuple(P() for _ in range(order + 1)),
    )
    def shard_count(shard_codes, shard_lens):
        in_seq = (
            jnp.arange(shard_codes.shape[1])[None, :] < shard_lens[:, None]
        )
        outs = []
        for k in range(order + 1):
            y, ok = _bg_window_values(shard_codes, k)
            ok = ok & in_seq
            flat_y = jnp.where(ok, y, 0).reshape(-1)
            inc = ok.reshape(-1).astype(jnp.int32)
            tab = jnp.zeros(4 ** (k + 1), dtype=jnp.int32).at[flat_y].add(inc)
            outs.append(jax.lax.psum(tab, "data"))
        return tuple(outs)

    return jax.jit(shard_count)


def _bg_window_values(codes: jax.Array, k: int):
    """Device version of the background (k+1)-mer window rule including the
    reference N-quirk (see models/background.py docstring).  Padding zeros
    count as Ns, and positions beyond each sequence end would contribute
    v == 0 windows — the caller must mask ``ok`` down to each row's true
    extent (count_bg_kmers_sharded's ``in_seq`` from the lengths vector).
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
    # windows fully inside trailing padding are all-N with v==0: they'd
    # be counted as y=0 under the quirk, but the reference never sees
    # padding — the caller masks ok down to each row's true extent
    # (count_bg_kmers_sharded's in_seq from the lengths vector).
    return v, ok
