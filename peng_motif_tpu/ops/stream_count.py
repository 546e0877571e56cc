"""Stream counting: gap-packed corpus, fixed-width halo chunks.

The reference scans one logical stream: sequences back to back, with a
W-position bookkeeping gap between them so the non-overlap rule never
crosses a boundary (reference: src/base_pattern.cpp:331-393, gap rule
at :382).  This module makes that stream the *device layout*:

    stream  = seq_0 ++ 0^W ++ seq_1 ++ 0^W ++ ... ++ seq_{n-1}
    chunk c = stream[c*C - ctx : c*C + C + W - 1]     (left zero-pad)

Every stream window start s belongs to exactly one chunk (c = s // C,
the chunk's *core*); the first ``ctx = 2(W-1)`` windows of each chunk
are *context only* — they reproduce the true left neighborhood so the
core's validity / post-N-skip / non-overlap decisions match the
unchunked scan, but produce no counts.  The W zeros of an inter-sequence
gap make every boundary-spanning window invalid and keep both the
blocking rule (window-start distance across a gap >= W) and the post-N
skip rule (the skip predecessor window always overlaps the gap) from
leaking across sequences — exactly the reference's fresh-start
semantics per sequence.

Why this layout (vs the [N, Lmax] padded batch):

* **ragged inputs** never densify: total device bytes are O(total
  bases), not O(N * Lmax);
* **long contigs split** transparently — a single 100 Mbase contig
  becomes ordinary chunks (round-2 verdict next #8), and sharding
  chunks over a mesh shards the contig with exact halo overlap
  (SURVEY.md section 5);
* **shape stability**: the device program sees [M, ROW] with ROW fixed
  and M drawn from a small bucket ladder, so XLA compiles a handful of
  programs for *any* corpus instead of one per (N, Lmax).

Exactness: within a chunk the decisions are computed from true stream
bases, so they equal the unchunked vectorized decisions except in two
certified-rare cases, both flagged per chunk and repaired by the host
fix-up (:func:`stream_fixup`):

1. dedup suspicion — same-pattern chains with gaps < W (the existing
   ``naive_dedup`` certificate);
2. seam ambiguity — a post-N-skip parity chain (an N every W+1 bases)
   reaching the chunk's left edge, where the closed-form recurrence's
   zero-padding (ops/counting.scan_skip_mask) may misstate the run
   parity.  Trigger: the first in-row evaluable element of any
   stride-(W+1) chain has a == 1 (see ``_skip_and_ambiguity``).
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import encoding
from .pallas_hist import histogram
from .counting import (
    _n_canonical,
    _np_revcomp_id,
    _unpack_codes,
    naive_dedup,
    pack_codes,
)

ROW = 512  # fixed chunk width in bases


class StreamLayout(NamedTuple):
    W: int
    row: int            # chunk width in bases (ROW)
    ctx: int            # context windows per chunk = 2(W-1)
    core: int           # core windows per chunk C = row - W + 1 - ctx
    n_windows: int      # stream window count S - W + 1 (>= 0)
    stream_len: int     # S
    m: int              # number of real chunks
    m_pad: int          # padded chunk count (shape bucket)
    seq_starts: np.ndarray  # [n] stream offset of each sequence
    lengths: np.ndarray     # [n] sequence lengths


def _bucket(m: int) -> int:
    """Shape ladder for the chunk count: powers of two up to 8192, then
    multiples of 4096, then multiples of the slab size (the count
    program processes > _SLAB_MIN chunks in _SLAB-chunk slabs, see
    _accumulated_local_counts; padding chunks are all-zero and fully
    invalid)."""
    if m <= 0:
        return 1
    if m <= 8192:
        return 1 << (m - 1).bit_length()
    if m <= 65536:
        return ((m + 4095) // 4096) * 4096
    return ((m + 16383) // 16384) * 16384


def make_layout(lengths: Sequence[int], W: int, row: int = ROW
                ) -> StreamLayout:
    lengths = np.asarray(lengths, dtype=np.int64)
    ctx = 2 * (W - 1)
    core = row - W + 1 - ctx
    assert core > 0, "row too small for this W"
    n = lengths.shape[0]
    gaps = W * max(n - 1, 0)
    # W-1 trailing zeros: every *position* of the stream (not just every
    # W-window start) then lies in exactly one chunk core, so the fused
    # background (k+1)-mer histogram (stream_local_counts bg_order) covers
    # the tail of the last sequence.  The extra windows contain zeros and
    # are invalid, so W-mer counts and ltot are unchanged.
    S = int(lengths.sum()) + gaps + (W - 1 if n else 0)
    seq_starts = np.zeros(n, dtype=np.int64)
    if n:
        seq_starts[1:] = np.cumsum(lengths[:-1] + W)
    n_win = max(S - W + 1, 0)
    m = max(-(-n_win // core), 1)
    return StreamLayout(W, row, ctx, core, n_win, S, m, _bucket(m),
                        seq_starts, lengths)


def build_stream(sequences: Sequence[np.ndarray], W: int,
                 flat_codes: np.ndarray | None = None,
                 row: int = ROW) -> tuple[np.ndarray, StreamLayout]:
    """Concatenate sequences with W-zero gaps.  ``flat_codes`` (the
    contiguous parse buffer) enables a threaded native fill; the
    fallback is a per-sequence slice-copy loop (memcpy per row — a
    single fancy-index scatter is ~100x slower at 50 Mbases)."""
    lengths = np.asarray([len(s) for s in sequences], dtype=np.int64)
    lay = make_layout(lengths, W, row)
    stream = np.zeros(lay.stream_len, dtype=np.uint8)
    if flat_codes is not None and flat_codes.shape[0] == int(lengths.sum()):
        from ..native import build_stream_fill_native  # noqa: PLC0415

        if build_stream_fill_native(flat_codes, lengths, W, stream):
            return stream, lay
    for st, s in zip(lay.seq_starts, sequences):
        stream[st : st + len(s)] = np.asarray(s, dtype=np.uint8)
    return stream, lay


def chunked_packed(stream: np.ndarray, lay: StreamLayout) -> np.ndarray:
    """Flat packed chunk buffer [m_pad * row_nbytes(row)] uint8, ready
    for the 1-D upload: fused native chunk+pack (one threaded pass, no
    [m_pad, row] intermediate); Python twin as fallback."""
    from ..native import chunk_pack_stream_native  # noqa: PLC0415

    out = chunk_pack_stream_native(
        stream, lay.m_pad, lay.row, lay.core, lay.ctx)
    if out is not None:
        return out
    from .counting import pack_codes  # noqa: PLC0415

    return pack_codes(chunk_rows(stream, lay)).reshape(-1)


def chunk_rows(stream: np.ndarray, lay: StreamLayout) -> np.ndarray:
    """[m_pad, row] uint8 chunk matrix (left context + core + W-1 tail);
    rows past ``m`` are all-zero padding (fully invalid)."""
    need = lay.ctx + (lay.m_pad - 1) * lay.core + lay.row
    padded = np.zeros(need, dtype=np.uint8)
    padded[lay.ctx : lay.ctx + lay.stream_len] = stream
    view = np.lib.stride_tricks.as_strided(
        padded, shape=(lay.m_pad, lay.row),
        strides=(lay.core * padded.strides[0], padded.strides[0]))
    return np.ascontiguousarray(view)


# ---------------------------------------------------------------------------
# device program
# ---------------------------------------------------------------------------


def _skip_and_ambiguity(codes: jax.Array, valid: jax.Array, length: int):
    """Chunked post-N-skip mask plus the per-row seam-ambiguity flag.

    Same closed form as ops.counting.scan_skip_mask (log-depth cummax
    over stride-(W+1) chains with zero-padded chain heads); a row is
    *ambiguous* when any chain's first in-row evaluable element
    (x in [d, 2d)) has a == 1 — its run may extend into the previous
    chunk, so the zero-padded parity may be wrong.  Rows where every
    such element has a == 0 are provably exact (each chain's run is
    bounded by an in-row true zero).
    """
    n_win = valid.shape[1]
    d = length + 1
    is_n = codes == 0
    b = valid.shape[0]
    if n_win <= d:
        return jnp.zeros_like(valid), jnp.zeros(b, dtype=jnp.bool_)
    a = jnp.pad(is_n[:, d - 1 : n_win - 1] & valid[:, : n_win - d],
                ((0, 0), (d, 0)))
    m = -(-n_win // d)
    a_p = jnp.pad(a, ((0, 0), (0, m * d - n_win))).reshape(b, m, d)
    j = jnp.arange(m, dtype=jnp.int32)[None, :, None]
    last_zero = jax.lax.cummax(jnp.where(a_p, jnp.int32(-1), j), axis=1)
    run = j - last_zero
    skip = a_p & ((run & 1) == 1)
    if m > 1:
        # a chain's zero-padded head can misstate the run parity only
        # if its element-0 value a[r] = isN(r-1) & valid(r-d) could be
        # 1: for r >= 1 the isN(r-1) factor is in-row, so a clean base
        # there *proves* a[r] == 0 and bounds the run — without this
        # refinement every inter-sequence gap landing in [d, 2d) of a
        # chunk flagged it suspicious (~25% of chunks on short-read
        # corpora, each paying the exact host fix-up)
        head_unbounded = jnp.concatenate(
            [jnp.ones((b, 1), dtype=jnp.bool_), is_n[:, : d - 1]], axis=1)
        ambiguous = (a_p[:, 1, :] & head_unbounded).any(axis=1)
    else:
        ambiguous = jnp.zeros(b, dtype=jnp.bool_)
    return skip.reshape(b, m * d)[:, :n_win], ambiguous


def bg_nbins(bg_order: int) -> int:
    """Combined (lane-aligned) bin count of the fused background
    histogram: orders 0..bg_order concatenated at offsets
    ``bg_offset(k)``, padded to a multiple of 128."""
    raw = sum(4 ** (k + 1) for k in range(bg_order + 1))
    return -(-raw // 128) * 128


def bg_offset(k: int) -> int:
    return sum(4 ** (j + 1) for j in range(k))


def stream_bg_counts(codes: jax.Array, ctx: int, core: int, bg_order: int):
    """Fused background (k+1)-mer histogram over the chunk batch.

    Device rule (see models/background.bg_device_corrections for the
    host-side completion): a window *ending* at core position q counts
    for every order k iff the 9 stream positions q-8..q are all defined
    (non-zero) — the reference's fixed 9-position N-lookback
    (src/shared/Sequence.cpp:28-33, BackgroundModel.cpp:73-81) evaluated
    over the gap-packed stream, where inter-sequence gap zeros and the
    chunk-0 left padding read as Ns.  The rule therefore (a) never
    counts a window crossing a sequence boundary, (b) misses windows
    ending at in-sequence positions <= 7 and the reference's
    "tainted but value 0" quirk windows — both repaired exactly by the
    host corrections.  Requires ctx >= 8 (callers gate on W >= 6).

    Returns one int32 vector of length :func:`bg_nbins` holding the
    order-k counts at offset :func:`bg_offset`; every count is an exact
    integer (same histogram machinery as the W-mer table).
    """
    assert ctx >= 8, "bg lookback needs 8 context positions"
    b, row = codes.shape
    pos = codes > 0
    clean = pos
    for j in range(1, 9):
        clean = clean & jnp.pad(pos[:, :-j], ((0, 0), (j, 0)))
    q = jnp.arange(row, dtype=jnp.int32)
    core_pos = (q >= ctx) & (q < ctx + core)
    counted = clean & core_pos[None, :]
    nonneg = jnp.maximum(codes.astype(jnp.int32) - 1, 0)
    nbins = bg_nbins(bg_order)
    ids_k = []
    vk = nonneg
    for k in range(bg_order + 1):
        if k > 0:
            vk = vk + jnp.pad(nonneg[:, :-k], ((0, 0), (k, 0))) * (4 ** k)
        ids_k.append(vk + jnp.int32(bg_offset(k)))
    flat_ids = jnp.stack(ids_k).reshape(-1)
    flat_inc = jnp.broadcast_to(
        counted, (bg_order + 1, b, row)).reshape(-1).astype(jnp.int32)
    return histogram(flat_ids, flat_inc, nbins)


def stream_local_counts(codes: jax.Array, ctx: int, length: int,
                        both_strands: bool, bg_order: int = -1):
    """Per-chunk-batch raw counting: (counts [4**W] int32 un-mirrored,
    ltot, suspicious [rows], bg) — ``bg`` is the fused background
    histogram (:func:`stream_bg_counts`) when ``bg_order >= 0``, else
    None.  The shard-mapped mesh path psums these before the canonical
    compaction."""
    fwd, rc, valid = encoding.window_ids(codes, length)
    skip, ambiguous = _skip_and_ambiguity(codes, valid, length)
    processed = valid & ~skip
    core_win = jnp.arange(valid.shape[1]) >= ctx
    cids = jnp.where(processed, jnp.minimum(fwd, rc), -1) if both_strands \
        else jnp.where(processed, fwd, -1)
    counted, susp = naive_dedup(cids, length)
    counted = counted & core_win[None, :]
    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = histogram(flat_ids, flat_inc, 4 ** length)
    # int64: an int32 sum would wrap at 2**31 processed windows and
    # the engine's ltot guard could never fire
    ltot = (processed & core_win[None, :]).astype(jnp.int64).sum()
    bg = None
    if bg_order >= 0:
        core = codes.shape[1] - length + 1 - ctx
        bg = stream_bg_counts(codes, ctx, core, bg_order)
    return counts, ltot, susp | ambiguous, bg


def stream_compact(counts: jax.Array, length: int, both_strands: bool):
    """(resident mirrored counts, compact canonical vals u16, max)."""
    if both_strands:
        canon = encoding.canonical_mask_flat(length)
        canon_idx = encoding.canonical_idx_flat(length)
        vals = counts[canon_idx]
        rc_ids = encoding.rc_ids_flat(length)
        counts = jnp.where(canon, counts, counts[rc_ids])
    else:
        vals = counts
    return counts, vals.astype(jnp.uint16), vals.max()


def row_nbytes(row: int) -> int:
    """Packed bytes per chunk row (2-bit codes + 1-bit N mask)."""
    return (row + 3) // 4 + (row + 7) // 8


# ---------------------------------------------------------------------------
# wire2: 2-bit-only transfer format
#
# The host->device link is the large-corpus bottleneck (~15-20 MB/s
# effective through the tunnel relay, measured 2026-08-21 — NOT the
# ~260 MB/s an enqueue-timed put suggests; block_until_ready does not
# actually block on that backend).  For the common case — no undefined
# bases, uniform sequence lengths (ChIP-seq peak sets, the bench
# corpora) — the 1-bit N-mask third of the wire bytes is redundant:
# every invalid position (inter-sequence gap zeros, chunk-0 left
# padding, stream tail, bucket padding chunks) is arithmetically
# derivable from (seq_len, stream_len), because seq k starts at
# k * (seq_len + W).  The device reconstructs codes==0 exactly, so all
# downstream decision logic (validity, post-N skip, dedup, fused bg
# lookback) is unchanged.
# ---------------------------------------------------------------------------


def row_nbytes2(row: int) -> int:
    """Packed bytes per chunk row on the 2-bit wire."""
    return (row + 3) // 4


def wire2_eligible(lay: StreamLayout, n_undefined) -> bool:
    """2-bit wire: no Ns, uniform lengths, int32-safe positions."""
    return (n_undefined == 0
            and lay.lengths.size > 0
            and int(lay.lengths.min()) == int(lay.lengths.max())
            and lay.stream_len < (1 << 31) - (1 << 16))


def chunked_packed2(stream: np.ndarray, lay: StreamLayout) -> np.ndarray:
    """Flat 2-bit packed chunk buffer [m_pad * row_nbytes2(row)] uint8
    (native threaded pass; numpy twin as fallback).  Gap/padding
    positions pack as garbage 2-bit values — the device masks them via
    the arithmetic validity rule, never reading them."""
    from ..native import chunk_pack_stream2_native  # noqa: PLC0415

    out = chunk_pack_stream2_native(
        stream, lay.m_pad, lay.row, lay.core, lay.ctx)
    if out is not None:
        return out
    rows = chunk_rows(stream, lay)
    b2 = (rows.astype(np.int16) - 1).astype(np.uint8) & np.uint8(3)
    b, length = b2.shape
    pad4 = (-length) % 4
    if pad4:
        b2 = np.pad(b2, ((0, 0), (0, pad4)))
    b2 = b2.reshape(b, -1, 4)
    packed = (b2[:, :, 0] | (b2[:, :, 1] << 2) | (b2[:, :, 2] << 4)
              | (b2[:, :, 3] << 6))
    return np.ascontiguousarray(packed).reshape(-1)


def _unpack_codes2(buf2d, row: int, g0, core: int, ctx: int, length: int,
                   seq_len, stream_len):
    """Codes (0 = invalid, 1..4 = ACGT) from the 2-bit wire.

    ``g0``: global chunk index of row 0 (traced; the slab loop passes
    k * _SLAB).  ``seq_len``/``stream_len``: traced int32 scalars, so
    one compiled program serves every uniform corpus of a layout
    bucket.  Validity: stream position p = (g0 + i) * core - ctx + j
    is a real base iff 0 <= p < stream_len and p mod (seq_len + W)
    < seq_len (sequence k occupies [k * (seq_len + W), ... + seq_len)).
    """
    b = buf2d.shape[0]
    shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    vals = ((buf2d[:, :, None] >> shifts) & 3).reshape(b, -1)[:, :row]
    i = jnp.arange(b, dtype=jnp.int32)[:, None]
    j = jnp.arange(row, dtype=jnp.int32)[None, :]
    p = (g0.astype(jnp.int32) + i) * jnp.int32(core) - jnp.int32(ctx) + j
    period = seq_len.astype(jnp.int32) + jnp.int32(length)
    r = jnp.where(p >= 0, p, 0) % period
    valid = ((p >= 0) & (p < stream_len.astype(jnp.int32))
             & (r < seq_len.astype(jnp.int32)))
    return jnp.where(valid, vals.astype(jnp.int32) + 1, 0)


# chunk-axis slab: above this many chunks the count program processes
# the stream in fixed-size slabs inside a fori_loop, so peak device
# memory is one slab's intermediates (unpacked codes + window ids +
# masks are ~40 bytes/base; a 150-Mbase corpus in one shot exceeds HBM
# and silently spills through the host link — measured 88 s for a scan
# that takes ~2 s slabbed)
_SLAB = 16384
_SLAB_MIN = 65536


def _accumulated_local_counts(buf2d, row: int, ctx: int, length: int,
                              both_strands: bool, bg_order: int = -1,
                              codes_fn=None):
    """(counts [4**W] int32 un-mirrored, ltot int64, susp [m_pad], bg):
    single pass for small chunk counts, slab fori_loop otherwise.  ``bg``
    is the fused background histogram when ``bg_order >= 0``, else
    None.  ``codes_fn(slab_buf, first_chunk_idx) -> codes`` decodes the
    wire format (default: the 2-bit + N-mask unpack)."""
    if codes_fn is None:
        def codes_fn(sl, g0):
            return _unpack_codes(sl, row)
    m_pad = buf2d.shape[0]
    if m_pad <= _SLAB_MIN:
        codes = codes_fn(buf2d, jnp.int32(0))
        return stream_local_counts(codes, ctx, length, both_strands,
                                   bg_order)
    assert m_pad % _SLAB == 0, "bucket ladder must align to _SLAB"
    with_bg = bg_order >= 0

    def body(k, st):
        counts, ltot, susp, bg = st
        sl = jax.lax.dynamic_slice_in_dim(buf2d, k * _SLAB, _SLAB, axis=0)
        codes = codes_fn(sl, (k * _SLAB).astype(jnp.int32))
        c, lt, sp, b = stream_local_counts(codes, ctx, length, both_strands,
                                           bg_order)
        susp = jax.lax.dynamic_update_slice_in_dim(susp, sp, k * _SLAB, 0)
        return counts + c, ltot + lt, susp, (bg + b if with_bg else bg)

    init = (jnp.zeros(4 ** length, dtype=jnp.int32), jnp.int64(0),
            jnp.zeros(m_pad, dtype=jnp.bool_),
            jnp.zeros(bg_nbins(bg_order), dtype=jnp.int32) if with_bg
            else jnp.zeros((), dtype=jnp.int32))
    counts, ltot, susp, bg = jax.lax.fori_loop(
        0, m_pad // _SLAB, body, init)
    return counts, ltot, susp, (bg if with_bg else None)


@functools.partial(
    jax.jit, static_argnames=("row", "ctx", "length", "both_strands"))
def stream_count_device(buf, row: int, ctx: int, length: int,
                        both_strands: bool):
    """Counting over the chunked stream.  Returns (counts resident
    [4**W] int32 mirrored, vals compact u16, max_count, ltot,
    suspicious [m_pad]) — the count_device_full contract on the stream
    layout.

    ``buf`` may be the flat 1-D packed buffer: callers upload 1-D and
    the jitted program reshapes on device, because a 2-D host->device
    put pays a per-shape layout-program compile (~10 s for a 100k-chunk
    corpus on the tunneled backend) that the 1-D put does not."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, row_nbytes(row))
    counts, ltot, suspicious, _ = _accumulated_local_counts(
        buf, row, ctx, length, both_strands)
    counts, vals, max_c = stream_compact(counts, length, both_strands)
    return counts, vals, max_c, ltot, suspicious


def _susp_to_words(susp):
    """Bitpack a bool suspicion vector, 32 chunks per uint32 word."""
    m = susp.shape[0]
    m32 = -(-m // 32) * 32
    sp = jnp.pad(susp.astype(jnp.uint32), (0, m32 - m)).reshape(-1, 32)
    return (sp << jnp.arange(32, dtype=jnp.uint32)[None, :]).sum(
        axis=1, dtype=jnp.uint32)


def _pack_fetch_blob_words(vals_u16, max_c, ltot, susp_words, bg=None):
    """Blob layout from pre-packed suspicion words (see
    :func:`_pack_fetch_blob`)."""
    nv = vals_u16.shape[0]
    vp = jnp.pad(vals_u16.astype(jnp.uint32), (0, nv % 2))
    vals_words = vp[0::2] | (vp[1::2] << 16)
    head = jnp.stack([
        # clamp: ltot >= 2**31 must still be visible to the host guard
        jnp.minimum(ltot, (1 << 32) - 1).astype(jnp.uint32),
        max_c.astype(jnp.uint32)])
    parts = [head, susp_words]
    if bg is not None:
        parts.append(bg.astype(jnp.uint32))
    parts.append(vals_words)
    return jnp.concatenate(parts)


def _pack_fetch_blob(vals_u16, max_c, ltot, susp, bg=None):
    """One uint32 vector holding every non-resident output: [ltot,
    max_count, susp bitpacked (32 chunks/word), bg counts (int32-as-u32,
    when fused bg counting is on), vals (2 u16/word)].
    The tunneled backend pays a full round trip *per fetched array*
    (~0.2-1 s each); one blob makes the post-count sync a single fetch."""
    return _pack_fetch_blob_words(
        vals_u16, max_c, ltot, _susp_to_words(susp), bg)


def split_fetch_blob(blob_np: np.ndarray, m: int, n_canonical: int,
                     bg_order: int = -1):
    """Host inverse of :func:`_pack_fetch_blob`: (ltot, max_count,
    susp bool [m], vals uint16 [n_canonical], bg int64 [bg_nbins] or
    None)."""
    blob_np = np.ascontiguousarray(blob_np, dtype=np.uint32)
    ltot, max_c = int(blob_np[0]), int(blob_np[1])
    nw = -(-m // 32)
    susp = np.unpackbits(
        blob_np[2 : 2 + nw].view(np.uint8), bitorder="little")[:m].astype(
        bool)
    off = 2 + nw
    bg = None
    if bg_order >= 0:
        nb = bg_nbins(bg_order)
        bg = blob_np[off : off + nb].astype(np.int64)
        off += nb
    vals = blob_np[off:].view(np.uint16)[:n_canonical]
    return ltot, max_c, susp, vals, bg


@functools.partial(
    jax.jit,
    static_argnames=("row", "ctx", "length", "both_strands", "bg_order"))
def stream_count_device_fused(buf, row: int, ctx: int, length: int,
                              both_strands: bool, bg_order: int = -1):
    """:func:`stream_count_device` with all non-resident outputs packed
    into a single uint32 fetch blob (see :func:`_pack_fetch_blob`), and
    optionally the fused background histogram (``bg_order >= 0``).
    Returns (counts resident [4**W] int32 mirrored, blob uint32)."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, row_nbytes(row))
    counts, ltot, suspicious, bg = _accumulated_local_counts(
        buf, row, ctx, length, both_strands, bg_order)
    counts, vals, max_c = stream_compact(counts, length, both_strands)
    return counts, _pack_fetch_blob(vals, max_c, ltot, suspicious, bg)


@functools.partial(
    jax.jit,
    static_argnames=("row", "ctx", "length", "both_strands", "bg_order"))
def stream_count_device_fused2(buf, meta, row: int, ctx: int, length: int,
                               both_strands: bool, bg_order: int = -1):
    """:func:`stream_count_device_fused` on the 2-bit wire (see the
    wire2 section above): ``meta`` is an int32 [2] device scalar pair
    (seq_len, stream_len) — traced, so one compiled program serves
    every uniform corpus in a layout bucket."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, row_nbytes2(row))
    seq_len, stream_len = meta[0], meta[1]

    def codes_fn(sl, g0):
        return _unpack_codes2(sl, row, g0, row - length + 1 - ctx, ctx,
                              length, seq_len, stream_len)

    counts, ltot, suspicious, bg = _accumulated_local_counts(
        buf, row, ctx, length, both_strands, bg_order, codes_fn=codes_fn)
    counts, vals, max_c = stream_compact(counts, length, both_strands)
    return counts, _pack_fetch_blob(vals, max_c, ltot, suspicious, bg)


@functools.partial(
    jax.jit, static_argnames=("row", "ctx", "length", "both_strands"))
def _stream_counts2_i32(buf, meta, row: int, ctx: int, length: int,
                        both_strands: bool):
    """uint16-overflow refetch on the 2-bit wire: canonical int32."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, row_nbytes2(row))
    seq_len, stream_len = meta[0], meta[1]

    def codes_fn(sl, g0):
        return _unpack_codes2(sl, row, g0, row - length + 1 - ctx, ctx,
                              length, seq_len, stream_len)

    counts, _, _, _ = _accumulated_local_counts(
        buf, row, ctx, length, both_strands, codes_fn=codes_fn)
    if both_strands:
        return counts[encoding.canonical_idx_flat(length)]
    return counts


# ---------------------------------------------------------------------------
# host twin + fix-up
# ---------------------------------------------------------------------------


def _np_window_ids(row: np.ndarray, W: int, both: bool):
    """(cid, valid) numpy twin of window_ids + canonicalization."""
    c = row.astype(np.int64)
    n_win = c.shape[0] - W + 1
    valid = np.ones(n_win, dtype=bool)
    fwd = np.zeros(n_win, dtype=np.int64)
    rcv = np.zeros(n_win, dtype=np.int64)
    for p in range(W):
        cc = c[p : p + n_win]
        valid &= cc > 0
        fwd += (cc - 1) * (4 ** p)
        rcv += (4 - cc) * (4 ** (W - 1 - p))
    cid = np.minimum(fwd, rcv) if both else fwd
    return np.where(valid, cid, -1), valid


def _np_chunk_decisions(row: np.ndarray, ctx: int, W: int, both: bool):
    """Numpy twin of stream_count_device's per-chunk decision: returns
    (counted mask over core windows, cid per window) exactly as the
    device computes them (including the zero-padded skip-chain heads)."""
    d = W + 1
    cid, valid = _np_window_ids(row, W, both)
    n_win = valid.shape[0]
    is_n = row == 0
    skip = np.zeros(n_win, dtype=bool)
    for s in range(d, n_win):
        a = is_n[s - 1] and valid[s - d]
        skip[s] = a and not skip[s - d]
    processed = valid & ~skip
    cids = np.where(processed, cid, -1)
    blocked = np.zeros(n_win, dtype=bool)
    for dd in range(1, min(W, n_win)):
        eq = (cids[dd:] == cids[:-dd]) & (cids[dd:] >= 0) & (cids[:-dd] >= 0)
        blocked[dd:] |= eq
    counted = (cids >= 0) & ~blocked
    counted[:ctx] = False
    return counted, cids


def _np_exact_row(row: np.ndarray, W: int, both: bool):
    """Exact greedy counted mask for one fresh sequence, via the
    processed-window semantics (reference scan automaton,
    src/base_pattern.cpp:331-393)."""
    from .counting import _row_cids_processed  # noqa: PLC0415

    cid = _row_cids_processed(row, W, both)
    n_win = cid.shape[0]
    counted = np.zeros(n_win, dtype=bool)
    last: dict = {}
    for j in range(n_win):
        i = int(cid[j])
        if i < 0:
            continue
        if i not in last or j - last[i] >= W:
            counted[j] = True
            last[i] = j
    return counted, cid


def stream_fixup_delta(stream: np.ndarray, lay: StreamLayout,
                       susp: np.ndarray, both: bool):
    """(delta, ltot_delta): sparse {canonical_id: count delta} plus the
    processed-window (ltot) correction, turning the device's chunked
    decisions into the exact scan for every sequence touched by a
    suspicious chunk.  ltot can deviate only through the seam-ambiguous
    skip parity (dedup suspicion never changes which windows are
    *processed*, only which are counted)."""
    W, C, ctx = lay.W, lay.core, lay.ctx
    susp_chunks = np.flatnonzero(susp[: lay.m])
    if susp_chunks.size == 0 or lay.seq_starts.size == 0:
        return {}, 0
    seq_starts = lay.seq_starts
    seq_ends = seq_starts + lay.lengths

    # sequences overlapping a suspicious chunk's influence region
    affected: set = set()
    for c in susp_chunks:
        lo = c * C - ctx
        hi = c * C + C + W - 1
        i0 = np.searchsorted(seq_ends, lo, side="right")
        i1 = np.searchsorted(seq_starts, hi, side="left")
        affected.update(range(int(i0), int(i1)))

    # replicate device decisions for every chunk overlapping an
    # affected sequence
    chunk_cache: dict = {}

    def chunk_decisions(c: int):
        if c not in chunk_cache:
            lo = c * C - ctx
            row = np.zeros(lay.row, dtype=np.uint8)
            s0, s1 = max(lo, 0), min(lo + lay.row, lay.stream_len)
            if s1 > s0:
                row[s0 - lo : s1 - lo] = stream[s0:s1]
            chunk_cache[c] = _np_chunk_decisions(row, ctx, W, both)
        return chunk_cache[c]

    delta: dict = {}
    ltot_delta = 0
    for k in sorted(affected):
        st, ln = int(seq_starts[k]), int(lay.lengths[k])
        if ln < W:
            continue
        seq = stream[st : st + ln]
        exact_counted, cid = _np_exact_row(seq, W, both)
        for j in range(ln - W + 1):
            s = st + j                      # stream window start
            c = s // C
            local = s - c * C + ctx
            dev_counted, dev_cid = chunk_decisions(c)
            dv = int(exact_counted[j]) - int(dev_counted[local])
            if dv:
                delta_id = int(cid[j]) if cid[j] >= 0 else int(
                    dev_cid[local])
                delta[delta_id] = delta.get(delta_id, 0) + dv
            ltot_delta += int(cid[j] >= 0) - int(dev_cid[local] >= 0)
    return {k: v for k, v in delta.items() if v}, ltot_delta


def stream_fixup_pairs(stream: np.ndarray, lay: StreamLayout,
                       susp: np.ndarray, both: bool,
                       pad_to: int = 1024):
    """(ids, deltas, ltot_delta) padded for a static-shape device
    scatter-add, with reverse-complement mirror ids included (the
    fixup_delta_pairs contract of ops.counting).  ``pad_to`` is 1024 so
    ONE stats_program shape serves every ordinary corpus (a smaller
    default bucketed per-corpus and recompiled stats mid-run — a ~6 s
    cold-start stall on remote backends); the scatter cost of the
    padding is negligible.  Native fast path
    (pengnative.cpp stream_fixup_native — the Python twin walks every
    affected window in interpreter loops, ~10 ms per suspicious chunk,
    and repeats make suspicion common in real genomes); Python twin
    as fallback and test oracle."""
    from ..native import stream_fixup_delta_native  # noqa: PLC0415

    susp_chunks = np.flatnonzero(np.asarray(susp[: lay.m]))
    native = None
    if susp_chunks.size and lay.seq_starts.size:
        native = stream_fixup_delta_native(
            stream, lay.seq_starts, lay.lengths, susp_chunks,
            lay.W, lay.row, lay.core, lay.ctx, both)
    if native is not None:
        ids_arr, dv_arr, ltot_delta = native
        delta = dict(zip(ids_arr.tolist(), dv_arr.tolist()))
    else:
        delta, ltot_delta = stream_fixup_delta(stream, lay, susp, both)
    ids, dvs = [], []
    for cid, dv in delta.items():
        ids.append(cid)
        dvs.append(dv)
        if both:
            rcid = _np_revcomp_id(cid, lay.W)
            if rcid != cid:
                ids.append(rcid)
                dvs.append(dv)
    n = max(pad_to, 1 << (len(ids) - 1).bit_length()) if ids else pad_to
    out_ids = np.zeros(n, dtype=np.int32)
    out_dv = np.zeros(n, dtype=np.int32)
    out_ids[: len(ids)] = ids
    out_dv[: len(dvs)] = dvs
    return out_ids, out_dv, ltot_delta


# ---------------------------------------------------------------------------
# one-call host API
# ---------------------------------------------------------------------------


class StreamCountJob:
    """Pack + upload + dispatch stream counting; ``finish`` returns the
    exact mirrored host table and ltot (CountJob contract)."""

    def __init__(self, sequences: Sequence[np.ndarray], length: int,
                 both_strands: bool,
                 flat_codes: np.ndarray | None = None):
        self._length = length
        self._both = both_strands
        self._stream, self._lay = build_stream(
            sequences, length, flat_codes=flat_codes)
        self._empty = self._lay.n_windows <= 0
        if self._empty:
            return
        self._buf = jnp.asarray(chunked_packed(self._stream, self._lay))
        out = stream_count_device(
            self._buf, self._lay.row, self._lay.ctx, length, both_strands)
        self._counts_dev, self._vals, self._max, self._ltot, self._susp = out

    @property
    def layout(self) -> StreamLayout:
        return self._lay

    def finish(self):
        from ..native import mirror_canonical_native  # noqa: PLC0415
        from .counting import _np_canonical_mask_flat  # noqa: PLC0415

        W, both = self._length, self._both
        if self._empty:
            return np.zeros(4 ** W, dtype=np.int32), 0
        vals, max_count, ltot, susp = jax.device_get(
            (self._vals, self._max, self._ltot, self._susp))
        if int(max_count) > np.iinfo(np.uint16).max:
            vals = np.asarray(_stream_counts_i32(
                self._buf, self._lay.row, self._lay.ctx, W, both))
        if both:
            counts_np = mirror_canonical_native(vals, W)
            if counts_np is None:
                full = np.zeros(4 ** W, dtype=np.int32)
                canon = np.flatnonzero(_np_canonical_mask_flat(W))
                full[canon] = vals
                rcs = np.array([_np_revcomp_id(int(i), W) for i in canon],
                               dtype=np.int64)
                full[rcs] = vals
                counts_np = full
        else:
            counts_np = vals.astype(np.int32)
        ids, dvs, ltot_delta = stream_fixup_pairs(
            self._stream, self._lay, susp, both)
        np.add.at(counts_np, ids, dvs)
        return counts_np, int(ltot) + ltot_delta


@functools.partial(
    jax.jit, static_argnames=("row", "ctx", "length", "both_strands"))
def _stream_counts_i32(buf, row: int, ctx: int, length: int,
                       both_strands: bool):
    """uint16-overflow refetch: canonical int32 values."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, row_nbytes(row))
    counts, _, _, _ = _accumulated_local_counts(
        buf, row, ctx, length, both_strands)
    if both_strands:
        return counts[encoding.canonical_idx_flat(length)]
    return counts
