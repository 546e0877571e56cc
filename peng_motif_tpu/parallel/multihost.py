"""Multi-host (multi-process) distribution over DCN.

Replaces the reference's single-process OpenMP ceiling
(reference: src/main.cpp:28-30) with jax.distributed: N processes, each
with its own accelerators, form one global data mesh; the gap-packed
chunk stream (ops/stream_count.py) shards across all global devices,
per-shard tables all-reduce with one integer psum riding ICI within a
host and DCN across hosts, and the background (k+1)-mer vectors
all-reduce the same way.  Counting is the only corpus-wide phase, so
these two collectives are the entire cross-host communication surface
(SURVEY.md section 5); the table-local phases 2-4 then run on process
0's local devices only.

Every process parses the input FASTA (it needs the global stream
layout, which depends on all sequence lengths); the *scans* are what
shard.  Process 0 writes all output; other processes exit after the
collectives.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import numpy as np


def init_multihost(coordinator: str, num_processes: int, process_id: int,
                   timeout_s: int | None = None):
    """jax.distributed.initialize wrapper (idempotent per process).

    ``timeout_s`` (default 300, env PENG_MULTIHOST_TIMEOUT) bounds the
    coordination-service connect: a process that never shows up (crash
    before init) fails every peer with a clean error instead of an
    indefinite hang.  Mid-run dropouts surface through the coordination
    service's heartbeat on the next collective.
    """
    import os

    import jax

    if timeout_s is None:
        timeout_s = int(os.environ.get("PENG_MULTIHOST_TIMEOUT", "300"))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_s,
    )


def global_data_mesh():
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("data",))


def _local_block(mesh, per: int):
    """Contiguous [lo, hi) row range owned by this process's devices."""
    import jax

    dev_list = list(mesh.devices.flat)
    pid = jax.process_index()
    local_ids = [i for i, d in enumerate(dev_list)
                 if d.process_index == pid]
    lo = min(local_ids) * per
    hi = (max(local_ids) + 1) * per
    return lo, hi


def _stream_segment_rows(input_path: str, lay, lo: int, hi: int
                         ) -> np.ndarray:
    """Chunk rows [lo, hi) built from only the sequences overlapping
    this process's stream span — the worker-process path that avoids
    parsing (and holding) the whole corpus (round-3 verdict missing #4).
    Decodes via io.fasta.read_fasta_ranges (identical encoding LUT to
    the full parse)."""
    from ..io.fasta import read_fasta_ranges

    core, ctx, row = lay.core, lay.ctx, lay.row
    span_lo = lo * core - ctx
    span_hi = (hi - 1) * core - ctx + row
    seg = np.zeros(span_hi - span_lo, dtype=np.uint8)
    starts, lens = lay.seq_starts, lay.lengths
    a = int(np.searchsorted(starts + lens, max(span_lo, 0), side="right"))
    b = int(np.searchsorted(starts, min(span_hi, lay.stream_len),
                            side="left"))
    if b > a:
        decoded = read_fasta_ranges(input_path, [(a, b)])
        for k in range(a, b):
            s = decoded[k]
            st = int(starts[k])
            s0, s1 = max(st, span_lo), min(st + len(s), span_hi)
            if s1 > s0:
                seg[s0 - span_lo : s1 - span_lo] = s[s0 - st : s1 - st]
    rows = np.lib.stride_tricks.as_strided(
        seg, shape=(hi - lo, row), strides=(core, 1))
    return np.ascontiguousarray(rows)


def multihost_stream_counts(sequences: Sequence[np.ndarray] | None,
                            length: int, both: bool,
                            flat_codes: np.ndarray | None = None,
                            input_path: str | None = None,
                            lengths: np.ndarray | None = None):
    """Count the full corpus across all hosts.

    Process 0 passes the parsed ``sequences`` and receives the exact
    mirrored host table and ltot.  Worker processes pass
    ``sequences=None`` with ``input_path`` + ``lengths`` (from
    io.fasta.read_fasta_lengths): they decode only the sequences their
    chunk shard touches, participate in every collective (count psum,
    suspicion all_gather, and the int32 overflow refetch), and receive
    (None, ltot) — the mirror/fix-up runs on process 0 only, which is
    the only process that continues past counting.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.counting import _unpack_codes, pack_codes
    from ..ops.stream_count import (
        _accumulated_local_counts,
        build_stream,
        chunk_rows,
        make_layout,
        stream_compact,
        stream_fixup_pairs,
    )
    from ..native import mirror_canonical_native

    mesh = global_data_mesh()
    n_dev = mesh.devices.size
    if sequences is not None:
        stream, lay = build_stream(sequences, length, flat_codes=flat_codes)
    else:
        stream = None
        lay = make_layout(np.asarray(lengths, dtype=np.int64), length)
    per = -(-lay.m_pad // n_dev)
    if per > 65536:
        # per-shard chunk counts above the slab threshold must
        # align to the slab (see _accumulated_local_counts)
        per = -(-per // 16384) * 16384
    m_pad = per * n_dev
    lay = lay._replace(m_pad=m_pad)
    per = m_pad // n_dev
    lo, hi = _local_block(mesh, per)
    if stream is not None:
        rows = chunk_rows(stream, lay)[lo:hi]
    else:
        rows = _stream_segment_rows(input_path, lay, lo, hi)
    # flat 1-D upload (chunk-aligned shards): a 2-D put pays a
    # per-shape layout-program compile on tunneled backends
    local_packed = pack_codes(rows)
    nb = local_packed.shape[1]
    local_flat = local_packed.reshape(-1)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P("data"),
        out_specs=(P(), P(), P(), P()),
        # the all_gather'd suspicion vector is replicated by
        # construction; the static VMA check cannot see that
        check_vma=False,
    )
    def shard_count(shard_flat):
        local, local_ltot, susp, _ = _accumulated_local_counts(
            shard_flat.reshape(-1, nb), lay.row, lay.ctx, length, both)
        counts = jax.lax.psum(local, "data")
        ltot = jax.lax.psum(local_ltot, "data")
        # replicate the suspicion flags so every process can run the
        # deterministic host fix-up (a [m_pad] bool broadcast, tiny)
        susp_all = jax.lax.all_gather(susp, "data").reshape(-1)
        _, vals, max_c = stream_compact(counts, length, both)
        return vals, max_c, ltot, susp_all

    sharding = NamedSharding(mesh, P("data"))
    arr = jax.make_array_from_process_local_data(sharding, local_flat)
    vals, max_c, ltot, susp = jax.device_get(jax.jit(shard_count)(arr))
    if int(max_c) > np.iinfo(np.uint16).max:
        # u16 overflow (repeat-heavy corpus, e.g. poly-A at w8 in a real
        # genome): re-fetch the canonical slice in int32 through the
        # same collective (single-host twin: engine_tpu.py
        # _compact_counts_i32; reference counts in size_t,
        # src/base_pattern.cpp:29-57)
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("data"), out_specs=P())
        def shard_count_i32(shard_flat):
            local, _, _, _ = _accumulated_local_counts(
                shard_flat.reshape(-1, nb), lay.row, lay.ctx, length, both)
            counts = jax.lax.psum(local, "data")
            if both:
                from ..ops import encoding  # noqa: PLC0415

                return counts[encoding.canonical_idx_flat(length)]
            return counts

        vals = jax.device_get(jax.jit(shard_count_i32)(arr))

    if sequences is None:
        # worker: collectives done (including any refetch); the table
        # and fix-up are process 0's job
        return None, int(ltot)

    if both:
        counts_np = mirror_canonical_native(vals, length)
        if counts_np is None:
            from ..ops.counting import (
                _np_canonical_mask_flat, _np_revcomp_id)

            counts_np = np.zeros(4 ** length, dtype=np.int32)
            canon = np.flatnonzero(_np_canonical_mask_flat(length))
            counts_np[canon] = vals
            rcs = np.array([_np_revcomp_id(int(i), length) for i in canon],
                           dtype=np.int64)
            counts_np[rcs] = vals
    else:
        counts_np = vals.astype(np.int32)
    ids, dvs, ltot_delta = stream_fixup_pairs(stream, lay, susp, both)
    np.add.at(counts_np, ids, dvs)
    return counts_np, int(ltot) + ltot_delta


def multihost_bg_counts(sequences: Sequence[np.ndarray] | None, order: int,
                        input_path: str | None = None,
                        n_total: int | None = None) -> List[np.ndarray]:
    """Background (k+1)-mer counts across hosts: each process scans a
    contiguous block of the sequences with the threaded native counter,
    one psum over DCN merges the vectors.  Worker mode
    (``sequences=None`` + ``input_path``/``n_total``): decode only this
    process's block (io.fasta.read_fasta_ranges)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.background import count_kmers

    mesh = global_data_mesh()
    n_dev = mesh.devices.size
    pid, n_proc = jax.process_index(), jax.process_count()
    n = n_total if sequences is None else len(sequences)
    lo_s, hi_s = pid * n // n_proc, (pid + 1) * n // n_proc
    if sequences is None:
        from ..io.fasta import read_fasta_ranges

        decoded = read_fasta_ranges(input_path, [(lo_s, hi_s)])
        shard = [decoded[i] for i in range(lo_s, hi_s)]
    else:
        shard = list(sequences[lo_s:hi_s])
    local = count_kmers(shard, order)
    total = sum(4 ** (k + 1) for k in range(order + 1))
    flat = np.concatenate([c.astype(np.int64) for c in local])
    # one vector per local device: the process's counts on its first
    # device, zeros elsewhere; psum over the device axis = global sum
    n_local = len(jax.local_devices())
    block = np.zeros((n_local, total), dtype=np.int64)
    block[0] = flat

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P("data", None), out_specs=P())
    def allreduce(x):
        return jax.lax.psum(x.sum(axis=0), "data")

    sharding = NamedSharding(mesh, P("data", None))
    arr = jax.make_array_from_process_local_data(sharding, block)
    out = np.asarray(jax.device_get(jax.jit(allreduce)(arr)))
    res, off = [], 0
    for k in range(order + 1):
        n = 4 ** (k + 1)
        res.append(out[off : off + n].copy())
        off += n
    return res
