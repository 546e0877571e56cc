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


def init_multihost(coordinator: str, num_processes: int, process_id: int):
    """jax.distributed.initialize wrapper (idempotent per process)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
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


def multihost_stream_counts(sequences: Sequence[np.ndarray], length: int,
                            both: bool,
                            flat_codes: np.ndarray | None = None):
    """Count the full corpus across all hosts.

    Every process calls this with the SAME sequences; returns the exact
    mirrored host table and ltot, identical on every process (the
    deterministic fix-up runs redundantly everywhere).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.counting import _unpack_codes, pack_codes
    from ..ops.stream_count import (
        _accumulated_local_counts,
        build_stream,
        chunk_rows,
        stream_compact,
        stream_fixup_pairs,
    )
    from ..native import mirror_canonical_native

    mesh = global_data_mesh()
    n_dev = mesh.devices.size
    stream, lay = build_stream(sequences, length, flat_codes=flat_codes)
    per = -(-lay.m_pad // n_dev)
    if per > 65536:
        # per-shard chunk counts above the slab threshold must
        # align to the slab (see _accumulated_local_counts)
        per = -(-per // 16384) * 16384
    m_pad = per * n_dev
    lay = lay._replace(m_pad=m_pad)
    rows = chunk_rows(stream, lay)
    per = m_pad // n_dev
    lo, hi = _local_block(mesh, per)
    # flat 1-D upload (chunk-aligned shards): a 2-D put pays a
    # per-shape layout-program compile on tunneled backends
    local_packed = pack_codes(rows[lo:hi])
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


def multihost_bg_counts(sequences: Sequence[np.ndarray], order: int
                        ) -> List[np.ndarray]:
    """Background (k+1)-mer counts across hosts: each process scans a
    round-robin shard of the sequences with the threaded native
    counter, one psum over DCN merges the vectors."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models.background import count_kmers

    mesh = global_data_mesh()
    n_dev = mesh.devices.size
    pid, n_proc = jax.process_index(), jax.process_count()
    shard = [s for i, s in enumerate(sequences) if i % n_proc == pid]
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
