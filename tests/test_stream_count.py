"""Stream-counting oracle tests: the gap-packed chunked layout must
reproduce the reference scan exactly for ragged corpora, long contigs,
N-heavy rows, tandem repeats, and adversarial seam constructions."""

import numpy as np
import pytest

from peng_motif_tpu.ops.counting import reference_scan_row
from peng_motif_tpu.ops.stream_count import (
    ROW,
    StreamCountJob,
    build_stream,
    chunk_rows,
    make_layout,
)


def _oracle(seqs, W, both):
    counts: dict = {}
    ltot = 0
    for s in seqs:
        c, lt = reference_scan_row(np.asarray(s, dtype=np.uint8), W, both)
        for k, v in c.items():
            counts[k] = counts.get(k, 0) + v
        ltot += lt
    return counts, ltot


def _check(seqs, W, both):
    job = StreamCountJob(seqs, W, both)
    got, got_ltot = job.finish()
    want, want_ltot = _oracle(seqs, W, both)
    assert got_ltot == want_ltot
    full = np.zeros(4 ** W, dtype=np.int64)
    for k, v in want.items():
        full[k] += v
        if both:
            from peng_motif_tpu.ops.counting import _np_revcomp_id

            rk = _np_revcomp_id(k, W)
            if rk != k:
                full[rk] += v
    np.testing.assert_array_equal(got, full)


@pytest.mark.parametrize("both", [True, False], ids=["both", "plus"])
def test_ragged_random(both):
    rng = np.random.default_rng(0)
    seqs = [rng.integers(1, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(3, 900, size=40)]
    _check(seqs, 8, both)


@pytest.mark.parametrize("both", [True, False], ids=["both", "plus"])
def test_ragged_with_ns(both):
    rng = np.random.default_rng(1)
    seqs = []
    for n in rng.integers(3, 700, size=30):
        s = rng.integers(1, 5, size=int(n)).astype(np.uint8)
        s[rng.random(int(n)) < 0.08] = 0
        seqs.append(s)
    _check(seqs, 6, both)


def test_tandem_repeats_cross_chunks():
    # AT repeated across several chunk widths: dense same-pattern chains
    # with gaps < W on both strands (dedup suspicion machinery)
    seqs = [np.tile(np.array([1, 4], dtype=np.uint8), 3 * ROW),
            np.tile(np.array([1, 2, 3], dtype=np.uint8), ROW)]
    _check(seqs, 6, True)
    _check(seqs, 6, False)


def test_long_contig_chunked():
    # one contig spanning many chunks, sprinkled Ns (post-N skip rule at
    # seams), low-entropy stretches (blocking chains)
    rng = np.random.default_rng(2)
    s = rng.integers(1, 5, size=200_000).astype(np.uint8)
    s[rng.random(200_000) < 0.01] = 0
    s[5_000:5_200] = np.tile(np.array([2, 2, 1, 2], dtype=np.uint8), 50)
    _check([s], 8, True)


def test_seam_ambiguity_parity_chain():
    # an N every W+1 bases: the post-N-skip parity chain crosses every
    # chunk seam (the zero-padded recurrence would misstate run parity
    # without the ambiguity certificate)
    W = 6
    d = W + 1
    rng = np.random.default_rng(3)
    s = rng.integers(1, 5, size=4 * ROW).astype(np.uint8)
    s[d - 1 :: d] = 0
    _check([s], W, True)
    _check([s], W, False)


def test_sequence_boundaries_at_seams():
    # many short sequences so gaps land inside chunk seam regions
    rng = np.random.default_rng(4)
    seqs = [rng.integers(1, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(6, 40, size=200)]
    _check(seqs, 6, True)


def test_short_and_degenerate_rows():
    seqs = [np.array([1, 2, 3], dtype=np.uint8),          # shorter than W
            np.array([], dtype=np.uint8),                  # empty
            np.array([1, 2, 3, 4, 1, 2, 3, 4], dtype=np.uint8)]
    _check(seqs, 8, True)


def test_matches_padded_batch_path():
    # byte-parity with the existing CountJob device table on MafK
    import os

    from conftest import GOLDEN_DIR
    from peng_motif_tpu.io.fasta import load_sequence_set
    from peng_motif_tpu.ops.counting import CountJob

    ss = load_sequence_set(os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta"))
    for both in (True, False):
        want, want_ltot = CountJob(ss.padded(), 8, both).finish()
        job = StreamCountJob(ss.sequences, 8, both,
                             flat_codes=getattr(ss, "_flat_codes", None))
        got, got_ltot = job.finish()
        assert got_ltot == want_ltot
        np.testing.assert_array_equal(got, want)


def test_layout_geometry():
    lay = make_layout([300, 5, 700], 8, row=128)
    assert lay.ctx == 14
    assert lay.core == 128 - 8 + 1 - 14
    # gaps of exactly W zeros between sequences
    stream, lay2 = build_stream(
        [np.ones(300, np.uint8), np.ones(5, np.uint8) * 2,
         np.ones(700, np.uint8) * 3], 8, row=128)
    # W-1 trailing zeros complete background end-position coverage
    assert lay2.stream_len == 300 + 8 + 5 + 8 + 700 + 7
    assert (stream[300:308] == 0).all()
    assert (stream[308:313] == 2).all()
    assert (stream[-7:] == 0).all()
    rows = chunk_rows(stream, lay2)
    assert rows.shape == (lay2.m_pad, 128)
    # chunk c core starts at stream position c*core; its row begins ctx
    # bases earlier
    c = 2
    lo = c * lay2.core - lay2.ctx
    np.testing.assert_array_equal(rows[c], np.pad(
        stream, (lay2.ctx, 10 * lay2.row))[lo + lay2.ctx : lo + lay2.ctx
                                           + lay2.row])


def test_long_contig_sharded_mesh():
    """A single contig sharded across the virtual 8-device mesh: the
    chunks carry exact 2(W-1)-window halos over the shard boundaries
    (SURVEY section 5's long-context rule)."""
    import jax
    from jax.sharding import Mesh
    from peng_motif_tpu.parallel.sharded import stream_count_sharded
    from peng_motif_tpu.ops.stream_count import stream_fixup_pairs

    rng = np.random.default_rng(7)
    s = rng.integers(1, 5, size=60_000).astype(np.uint8)
    s[rng.random(60_000) < 0.01] = 0
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("data",))
    W, both = 8, True
    counts_dev, vals, max_c, ltot, susp, _bg, stream, lay = \
        stream_count_sharded(
        [s], W, both, mesh)
    from peng_motif_tpu.ops.counting import _np_canonical_mask_flat
    vals_np, susp_np, ltot = (np.asarray(vals), np.asarray(susp), int(ltot))
    got = np.zeros(4 ** W, dtype=np.int64)
    canon = np.flatnonzero(_np_canonical_mask_flat(W))
    got[canon] = vals_np
    from peng_motif_tpu.ops.counting import _np_revcomp_id
    rcs = np.array([_np_revcomp_id(int(i), W) for i in canon])
    got[rcs] = vals_np
    ids, dvs, ltot_d = stream_fixup_pairs(stream, lay, susp_np, both)
    np.add.at(got, ids, dvs)
    want, want_ltot = _oracle([s], W, both)
    full = np.zeros(4 ** W, dtype=np.int64)
    for k, v in want.items():
        full[k] += v
        rk = _np_revcomp_id(k, W)
        if rk != k:
            full[rk] += v
    np.testing.assert_array_equal(got, full)
    assert ltot + ltot_d == want_ltot
    # resident replicated table matches too
    np.testing.assert_array_equal(
        np.asarray(counts_dev) + np.zeros(1, np.int64), got - _apply_ids(
            ids, dvs, W))


def _apply_ids(ids, dvs, W):
    d = np.zeros(4 ** W, dtype=np.int64)
    np.add.at(d, ids, dvs)
    return d


@pytest.mark.parametrize("both", [True, False], ids=["both", "plus"])
def test_native_fixup_matches_python_twin(both):
    """stream_fixup_native must reproduce the Python twin's sparse delta
    and ltot correction on repeat/N-heavy adversarial streams (the twin
    is the reference-semantics oracle; the native path is what runs)."""
    from peng_motif_tpu.native import stream_fixup_delta_native
    from peng_motif_tpu.ops.stream_count import stream_fixup_delta

    if stream_fixup_delta_native(
            np.zeros(1, np.uint8), np.zeros(1, np.int64),
            np.zeros(1, np.int64), np.zeros(0, np.int64),
            4, 64, 51, 6, both) is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    W = 8
    seqs = []
    for n in rng.integers(3, 2000, size=25):
        s = rng.integers(1, 5, size=int(n)).astype(np.uint8)
        s[rng.random(int(n)) < 0.05] = 0
        # tandem repeats to force dedup suspicion across chunk seams
        if int(n) > 40:
            unit = rng.integers(1, 5, size=4).astype(np.uint8)
            p = int(rng.integers(0, int(n) - 36))
            s[p : p + 36] = np.tile(unit, 9)
        seqs.append(s)
    stream, lay = build_stream(seqs, W, row=128)
    # mark every chunk suspicious: exercises the full replay path
    susp = np.ones(lay.m_pad, dtype=bool)
    want_delta, want_ltot = stream_fixup_delta(stream, lay, susp, both)
    got = stream_fixup_delta_native(
        stream, lay.seq_starts, lay.lengths,
        np.flatnonzero(susp[: lay.m]), W, lay.row, lay.core, lay.ctx, both)
    assert got is not None
    ids, dvs, got_ltot = got
    got_delta = {int(i): int(d) for i, d in zip(ids, dvs)}
    assert got_delta == want_delta
    assert got_ltot == want_ltot


def test_chunked_packed_matches_python_twin():
    """Fused native chunk+pack must equal pack_codes(chunk_rows(...))."""
    from peng_motif_tpu.ops.counting import pack_codes
    from peng_motif_tpu.ops.stream_count import chunked_packed

    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(3, 3000, size=30)]
    stream, lay = build_stream(seqs, 8, row=128)
    want = pack_codes(chunk_rows(stream, lay)).reshape(-1)
    got = chunked_packed(stream, lay)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("both", [True, False], ids=["both", "plus"])
def test_slab_accumulation_matches_single_pass(both, monkeypatch):
    """The slabbed count accumulation (chunk counts above _SLAB_MIN run
    as a fori_loop over fixed slabs to bound device memory) must equal
    the single-pass program bit-for-bit."""
    import jax.numpy as jnp
    from peng_motif_tpu.ops import stream_count as sc

    rng = np.random.default_rng(17)
    W = 8
    seqs = [rng.integers(0, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(3, 2000, size=40)]
    stream, lay = build_stream(seqs, W, row=128)
    # force a slab-aligned m_pad and a tiny slab so the loop runs
    slab = 32
    m_pad = -(-lay.m_pad // slab) * slab
    lay = lay._replace(m_pad=m_pad)
    buf = jnp.asarray(sc.chunked_packed(stream, lay))
    want = sc.stream_count_device_fused(buf, lay.row, lay.ctx, W, both)
    monkeypatch.setattr(sc, "_SLAB", slab)
    monkeypatch.setattr(sc, "_SLAB_MIN", slab)
    sc.stream_count_device_fused._clear_cache()
    got = sc.stream_count_device_fused(buf, lay.row, lay.ctx, W, both)
    sc.stream_count_device_fused._clear_cache()  # drop patched trace
    np.testing.assert_array_equal(np.asarray(want[0]), np.asarray(got[0]))
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))


def test_wire2_matches_mask_wire():
    """The 2-bit wire (no N-mask bytes; validity reconstructed on
    device from (seq_len, stream_len)) must produce the identical
    resident table and fetch blob as the 3-bit wire on a uniform
    N-free corpus — including suspicion bits (tandem repeats) and the
    fused background histogram."""
    import jax
    import jax.numpy as jnp

    from peng_motif_tpu.ops import stream_count as sc

    rng = np.random.default_rng(5)
    L, W = 173, 8
    seqs = [rng.integers(1, 5, size=L).astype(np.uint8) for _ in range(900)]
    # tandem repeats inside a uniform-length sequence: suspicion bits
    rep = np.tile(np.array([1, 2, 3, 4, 1, 2], np.uint8), 40)[:L]
    seqs.append(np.ascontiguousarray(rep))
    stream, lay = sc.build_stream(seqs, W)
    assert sc.wire2_eligible(lay, 0)
    buf3 = jnp.asarray(sc.chunked_packed(stream, lay))
    counts3, blob3 = sc.stream_count_device_fused(
        buf3, lay.row, lay.ctx, W, True, 2)
    buf2 = jnp.asarray(sc.chunked_packed2(stream, lay))
    assert buf2.size < buf3.size
    meta = jnp.asarray([L, lay.stream_len], jnp.int32)
    counts2, blob2 = sc.stream_count_device_fused2(
        buf2, meta, lay.row, lay.ctx, W, True, 2)
    np.testing.assert_array_equal(np.asarray(counts2), np.asarray(counts3))
    np.testing.assert_array_equal(np.asarray(blob2), np.asarray(blob3))
    # overflow-refetch twin
    i32_2 = sc._stream_counts2_i32(buf2, meta, lay.row, lay.ctx, W, True)
    i32_3 = sc._stream_counts_i32(buf3, lay.row, lay.ctx, W, True)
    np.testing.assert_array_equal(np.asarray(i32_2), np.asarray(i32_3))


def test_wire2_python_pack_matches_native():
    from peng_motif_tpu.native import chunk_pack_stream2_native
    from peng_motif_tpu.ops import stream_count as sc

    rng = np.random.default_rng(6)
    seqs = [rng.integers(1, 5, size=97).astype(np.uint8) for _ in range(50)]
    stream, lay = sc.build_stream(seqs, 8, row=128)
    native = chunk_pack_stream2_native(
        stream, lay.m_pad, lay.row, lay.core, lay.ctx)
    if native is None:
        import pytest
        pytest.skip("native library unavailable")
    rows = sc.chunk_rows(stream, lay)
    b2 = (rows.astype(np.int16) - 1).astype(np.uint8) & np.uint8(3)
    b2 = b2.reshape(lay.m_pad, -1, 4)
    want = (b2[:, :, 0] | (b2[:, :, 1] << 2) | (b2[:, :, 2] << 4)
            | (b2[:, :, 3] << 6)).reshape(-1)
    np.testing.assert_array_equal(native, want)


def test_wire2_eligibility_gates():
    from peng_motif_tpu.ops import stream_count as sc

    rng = np.random.default_rng(7)
    uni = [rng.integers(1, 5, size=64).astype(np.uint8) for _ in range(4)]
    _, lay = sc.build_stream(uni, 8)
    assert sc.wire2_eligible(lay, 0)
    assert not sc.wire2_eligible(lay, 3)        # Ns present
    ragged = uni + [rng.integers(1, 5, size=32).astype(np.uint8)]
    _, lay_r = sc.build_stream(ragged, 8)
    assert not sc.wire2_eligible(lay_r, 0)      # non-uniform lengths
