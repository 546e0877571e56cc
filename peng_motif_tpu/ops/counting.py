"""k-mer counting with exact non-overlap dedup semantics.

Replaces the reference's sequential rolling-hash scan
(reference: src/base_pattern.cpp:331-441) with a TPU formulation:

1. All window ids / reverse complements / validity are computed as dense
   vector ops over the [B, L] code array (``ops.encoding.window_ids``).
2. The reference's non-overlap rule — a window is counted only if no
   window with the same canonical pattern was *counted* at any of the
   previous W-1 window positions of the same sequence
   (src/base_pattern.cpp:362-366 via last_match_pos; the reference
   inserts a W-position gap between sequences at base_pattern.cpp:382,
   so blocking never crosses a sequence boundary) — is evaluated in two
   fully vectorized pieces:

   * the *naive* rule "no same-id window in the previous W-1 positions
     at all" (W-1 shifted equality compares, no sequential ops).  For a
     window whose blocker is itself unblocked this equals the exact
     rule (induction: an unblocked window is always counted).
   * a *suspicion* flag for rows containing a window whose blocker is
     itself blocked — the only place naive and exact can diverge
     (same-pattern occurrence chains with gaps < W, i.e. tandem
     repeats).  Suspicious rows (rare in genomic data) are re-counted
     exactly on host and the difference is applied as a sparse delta.

   This keeps the device program free of ``lax.scan``/``while`` (which
   de-rails both XLA pipelining and remote-backend execution) while
   remaining bit-exact vs the reference for every input.
3. Accepted windows scatter-add into the 4**W count table; in
   BOTH_STRANDS mode counts are mirrored to reverse-complement ids
   afterwards (src/base_pattern.cpp:386-392) via the flip/transpose rc
   permutation.

``ltot`` counts *all* valid windows, including ones rejected by the
non-overlap rule (src/base_pattern.cpp:367).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import encoding
from .pallas_hist import histogram


def _host_count_max_bases() -> int:
    """Inputs at or below this many bases count on host (see CountJob).

    Default: everything.  The batch device path materializes the whole
    [N, L] window machinery in one program — measured no faster than
    the threaded native scan on realistic corpora and an HBM OOM at
    ~1 Gbase — while the TPU *engine* counts through the slabbed
    stream path and is unaffected by this knob.  The env override
    exists so tests (and unusual deployments) can still force the
    batch device path."""
    return int(os.environ.get("PENG_COUNT_HOST_MAX_BASES", 1 << 62))


def scan_skip_mask(codes: jax.Array, valid: jax.Array, length: int):
    """Windows the reference scan never evaluates.

    The reference's streaming scan (src/base_pattern.cpp:360-382), on
    hitting an N at position q right after a processed window, advances
    the next window start to q+2 — so the (otherwise clean) window
    starting at q+1 is neither counted nor included in ltot.  A window
    start s is skipped iff seq[s-1] is an N *and* the window starting
    s-W-1 was processed (i.e. the N broke a streaming run):

        skip(s) = isN(s-1) & clean(s-W-1) & !skip(s-W-1)

    a stride-(W+1) recurrence.  Along each stride-d chain the recurrence
    ``skip = a & !skip_prev`` has the closed form "a(s), and the run of
    consecutive a's (along the chain) ending at s has odd length", so it
    evaluates as one log-depth cummax over the chain axis — O(log L)
    compile-time ops instead of the O(L/W) shift fixpoint that made
    long-row programs unbuildable.
    Returns the skip mask [B, NW]; processed = valid & ~skip.
    """
    n_win = valid.shape[1]
    d = length + 1
    is_n = codes == 0
    if n_win <= d:
        return jnp.zeros_like(valid)
    # a[s] = isN[s-1] & valid[s-d]  for s in [d, n_win)
    a = jnp.pad(is_n[:, d - 1 : n_win - 1] & valid[:, : n_win - d],
                ((0, 0), (d, 0)))
    b = a.shape[0]
    m = -(-n_win // d)
    a_p = jnp.pad(a, ((0, 0), (0, m * d - n_win))).reshape(b, m, d)
    j = jnp.arange(m, dtype=jnp.int32)[None, :, None]
    last_zero = jax.lax.cummax(jnp.where(a_p, jnp.int32(-1), j), axis=1)
    run = j - last_zero
    skip = a_p & ((run & 1) == 1)
    return skip.reshape(b, m * d)[:, :n_win]


def naive_dedup(cids: jax.Array, length: int):
    """Vectorized dedup approximation + exactness certificate.

    cids: [B, NW] canonical ids, -1 for invalid windows.
    Returns (counted [B, NW] bool, suspicious_rows [B] bool).  Rows with
    ``suspicious_rows == False`` are provably exact; others need the
    host-side greedy fix-up (:func:`host_row_recount`).
    """
    n_win = cids.shape[1]
    valid = cids >= 0
    blocked = jnp.zeros_like(valid)
    max_d = min(length, n_win)
    for d in range(1, max_d):
        eq = (cids[:, d:] == cids[:, :-d]) & valid[:, d:] & valid[:, :-d]
        blocked = blocked | jnp.pad(eq, ((0, 0), (d, 0)))
    counted = valid & ~blocked
    suspicious = jnp.zeros(cids.shape[0], dtype=jnp.bool_)
    for d in range(1, max_d):
        eq = (cids[:, d:] == cids[:, :-d]) & valid[:, d:] & valid[:, :-d]
        suspicious = suspicious | (eq & blocked[:, :-d]).any(axis=1)
    return counted, suspicious


@functools.partial(jax.jit, static_argnames=("length", "both_strands"))
def _count_device(codes: jax.Array, length: int, both_strands: bool):
    fwd, rc, valid = encoding.window_ids(codes, length)
    valid = valid & ~scan_skip_mask(codes.astype(jnp.int32), valid, length)
    cids = jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands else (
        jnp.where(valid, fwd, -1))

    counted, suspicious = naive_dedup(cids, length)

    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = histogram(flat_ids, flat_inc, 4 ** length)

    if both_strands:
        canon = encoding.canonical_mask_flat(length)
        rc_ids = encoding.rc_ids_flat(length)
        counts = jnp.where(canon, counts, counts[rc_ids])

    ltot = valid.astype(jnp.int64).sum()
    return counts, ltot, suspicious


def count_patterns_device(codes: jax.Array, length: int,
                          both_strands: bool = True):
    """Jit-traceable counting (naive dedup only, no host fix-up): exact
    whenever no row carries a same-pattern occurrence chain with gaps
    < W.  Use :func:`count_patterns` for the guaranteed-exact result."""
    counts, ltot, _ = _count_device(codes, length, both_strands)
    return counts, ltot


def _n_canonical(length: int) -> int:
    """Number of ids with id <= revcomp(id): (4^W + #palindromes) / 2;
    palindromes exist only for even W (middle base would have to equal
    its own complement)."""
    pal = 4 ** (length // 2) if length % 2 == 0 else 0
    return (4 ** length + pal) // 2


def pack_codes(codes_np: np.ndarray) -> np.ndarray:
    """Host-side transfer compression: one [B, ceil(L/4) + ceil(L/8)]
    uint8 buffer holding 2-bit base codes (4 per byte) followed by a
    1-bit N mask — 2.67x fewer bytes and a single transfer over the
    host->device link vs raw uint8 codes (the link, not the scan, bounds
    counting throughput on tunneled/PCIe-attached accelerators).
    Native fast path; vectorized numpy fallback."""
    from ..native import pack_codes_fused_native  # noqa: PLC0415

    c = np.ascontiguousarray(codes_np, dtype=np.uint8)
    out = pack_codes_fused_native(c)
    if out is not None:
        return out
    b, length = c.shape
    n = c == 0
    b2 = (c - np.uint8(1)) & np.uint8(3)
    pad4 = (-length) % 4
    if pad4:
        b2 = np.pad(b2, ((0, 0), (0, pad4)))
    b2 = b2.reshape(b, -1, 4)
    packed = (b2[:, :, 0] | (b2[:, :, 1] << 2) | (b2[:, :, 2] << 4)
              | (b2[:, :, 3] << 6))
    nmask = np.packbits(n, axis=1, bitorder="little")
    return np.concatenate([packed, nmask], axis=1)


def _unpack_codes(buf: jax.Array, length: int):
    c4 = (length + 3) // 4
    packed = buf[:, :c4]
    nmask = buf[:, c4:]
    shifts = jnp.arange(0, 8, 2, dtype=jnp.uint8)
    c = ((packed[:, :, None] >> shifts) & 3).reshape(
        packed.shape[0], -1)[:, :length]
    bit = jnp.arange(8, dtype=jnp.uint8)
    nm = ((nmask[:, :, None] >> bit) & 1).reshape(
        nmask.shape[0], -1)[:, :length]
    return jnp.where(nm == 1, 0, c.astype(jnp.int32) + 1)


def _packed_nbytes(seq_len: int) -> int:
    """Packed bytes per row (2-bit codes + 1-bit N mask)."""
    return (seq_len + 3) // 4 + (seq_len + 7) // 8


@functools.partial(
    jax.jit, static_argnames=("seq_len", "length", "both_strands"))
def _count_device_packed(buf, seq_len: int, length: int,
                         both_strands: bool):
    """Counting from packed codes with a transfer-minimal result layout:
    in BOTH_STRANDS mode every window scatters to its canonical id, so
    only the (4^W + 4^(W/2))/2 canonical entries leave the device (as
    uint16 + a max-count scalar for overflow fallback); the mirror step
    (reference: src/base_pattern.cpp:386-392) runs on host.
    """
    if buf.ndim == 1:
        # 1-D upload: a 2-D put pays a per-shape layout-program compile
        buf = buf.reshape(-1, _packed_nbytes(seq_len))
    codes = _unpack_codes(buf, seq_len)
    fwd, rc, valid = encoding.window_ids(codes, length)
    valid = valid & ~scan_skip_mask(codes, valid, length)
    cids = jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands else (
        jnp.where(valid, fwd, -1))

    counted, suspicious = naive_dedup(cids, length)

    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = histogram(flat_ids, flat_inc, 4 ** length)
    ltot = valid.astype(jnp.int64).sum()

    if both_strands:
        canon = encoding.canonical_mask_flat(length)
        canon_idx = encoding.canonical_idx_flat(length)
        vals = counts[canon_idx]
    else:
        vals = counts
    max_count = vals.max()
    return vals.astype(jnp.uint16), max_count, ltot, suspicious


@functools.partial(
    jax.jit, static_argnames=("seq_len", "length", "both_strands"))
def _count_device_packed_i32(buf, seq_len: int, length: int,
                             both_strands: bool):
    """Overflow fallback: same program, int32 canonical values."""
    if buf.ndim == 1:
        buf = buf.reshape(-1, _packed_nbytes(seq_len))
    codes = _unpack_codes(buf, seq_len)
    fwd, rc, valid = encoding.window_ids(codes, length)
    valid = valid & ~scan_skip_mask(codes, valid, length)
    cids = jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands else (
        jnp.where(valid, fwd, -1))
    counted, _ = naive_dedup(cids, length)
    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = histogram(flat_ids, flat_inc, 4 ** length)
    if both_strands:
        return counts[encoding.canonical_idx_flat(length)]
    return counts


@functools.partial(
    jax.jit, static_argnames=("seq_len", "length", "both_strands"))
def count_device_full(buf, seq_len: int, length: int, both_strands: bool):
    """Device counting for the TPU engine: the full (mirrored) count
    table stays resident on device; a canonical-compacted uint16 copy,
    ``ltot`` and the suspicion certificate leave — the compact copy
    feeds the host's byte-exact seed selection (the z-score sort must
    reproduce libstdc++ tie placement, which requires the host table;
    reference scan: src/base_pattern.cpp:331-441, sort 443-458).

    Returns (counts [4**W] int32 mirrored+resident, compact uint16,
    max_count, ltot int32, suspicious [B]).
    """
    if buf.ndim == 1:
        buf = buf.reshape(-1, _packed_nbytes(seq_len))
    codes = _unpack_codes(buf, seq_len)
    fwd, rc, valid = encoding.window_ids(codes, length)
    valid = valid & ~scan_skip_mask(codes, valid, length)
    cids = jnp.where(valid, jnp.minimum(fwd, rc), -1) if both_strands else (
        jnp.where(valid, fwd, -1))
    counted, suspicious = naive_dedup(cids, length)
    flat_ids = jnp.where(counted, cids, 0).reshape(-1)
    flat_inc = counted.reshape(-1).astype(jnp.int32)
    counts = histogram(flat_ids, flat_inc, 4 ** length)
    if both_strands:
        canon = encoding.canonical_mask_flat(length)
        canon_idx = encoding.canonical_idx_flat(length)
        vals = counts[canon_idx]
        rc_ids = encoding.rc_ids_flat(length)
        counts = jnp.where(canon, counts, counts[rc_ids])
    else:
        vals = counts
    ltot = valid.astype(jnp.int64).sum()
    return counts, vals.astype(jnp.uint16), vals.max(), ltot, suspicious


def fixup_delta_pairs(codes_np: np.ndarray, susp_np: np.ndarray, length: int,
                      both_strands: bool, pad_to: int = 64):
    """Sparse (ids, deltas) correction for suspicious rows, with mirror
    ids included, padded for a static-shape device scatter-add.
    Returns (ids [>=pad_to] int32, deltas [same] int32)."""
    from ..native import dedup_fixup_rows_native  # noqa: PLC0415

    rows = codes_np[np.flatnonzero(susp_np)]
    native = dedup_fixup_rows_native(rows, length, both_strands) \
        if rows.size else (np.zeros(0, np.int64), np.zeros(0, np.int32))
    delta: dict = {}
    if native is not None:
        n_ids, n_dv = native
        for cid, dv in zip(n_ids.tolist(), n_dv.tolist()):
            delta[cid] = delta.get(cid, 0) + dv
    else:
        for row in rows:
            for cid, dv in host_row_recount(row, length, both_strands).items():
                delta[cid] = delta.get(cid, 0) + dv
    ids, dvs = [], []
    for cid, dv in delta.items():
        if dv == 0:
            continue
        ids.append(cid)
        dvs.append(dv)
        if both_strands:
            rcid = _np_revcomp_id(cid, length)
            if rcid != cid:
                ids.append(rcid)
                dvs.append(dv)
    n = max(pad_to, 1 << (len(ids) - 1).bit_length()) if ids else pad_to
    out_ids = np.zeros(n, dtype=np.int32)
    out_dv = np.zeros(n, dtype=np.int32)
    out_ids[: len(ids)] = ids
    out_dv[: len(dvs)] = dvs
    return out_ids, out_dv


class CountJob:
    """Asynchronously dispatched device counting.

    Construction packs + uploads the codes and dispatches the count
    program; the caller overlaps host work (background tables) with
    device execution and calls :meth:`finish` for the exact, mirrored
    host table.  This is the pipeline's only host<->device round trip
    (reference equivalent: the single rolling scan,
    src/base_pattern.cpp:331-441).
    """

    def __init__(self, codes_np: np.ndarray, length: int, both_strands: bool):
        self._codes_np = np.ascontiguousarray(codes_np, dtype=np.uint8)
        self._length = length
        self._both = both_strands
        self._seq_len = self._codes_np.shape[1]
        self._host_thread = None
        self._host_result = None
        # degenerate inputs (no sequences / all shorter than W): no
        # windows exist; the reference runs through with an empty table
        # (src/base_pattern.cpp:331-441 simply finds no valid windows)
        self._empty = (self._codes_np.shape[0] == 0
                       or self._seq_len < length)
        if self._empty:
            return
        # adaptive dispatch: a (possibly tunneled) accelerator pays tens
        # of ms of dispatch + transfer latency, which dominates small
        # inputs; those take the threaded host scan (identical table and
        # ltot, cross-validated in tests/test_counting.py).  Large
        # corpora amortize the transfer and go to the device — but only
        # when the "device" is a real accelerator: the XLA:CPU count
        # program is ~10x slower than the threaded native scan, so on a
        # CPU backend every size stays on host.  Set
        # PENG_COUNT_HOST_MAX_BASES=0 to force the device path.
        # consult the backend only when the size gate would actually
        # send work to the device: jax.default_backend() initializes
        # the backend, and on a wedged tunnel that call can hang — a
        # pure-host run must never touch it
        if (self._codes_np.size <= _host_count_max_bases() or
                (_host_count_max_bases() > 0
                 and jax.default_backend() == "cpu")):
            from ..native import (  # noqa: PLC0415
                count_rows_exact_native, get_lib)

            if get_lib() is not None:
                import threading  # noqa: PLC0415

                result = [None]

                def _run():
                    result[0] = count_rows_exact_native(
                        self._codes_np, length, both_strands)

                self._host_result = result
                # ctypes releases the GIL: the caller's background-table
                # build overlaps with the scan, as on the device path
                self._host_thread = threading.Thread(
                    target=_run, daemon=True)
                self._host_thread.start()
                return
        self._buf_dev = jnp.asarray(pack_codes(self._codes_np).reshape(-1))
        self._vals, self._max, self._ltot, self._susp = _count_device_packed(
            self._buf_dev, self._seq_len, length, both_strands)

    def finish(self):
        """Block on the device result; returns (counts_np int32 [4**W],
        ltot int) with exact non-overlap semantics."""
        from ..native import mirror_canonical_native  # noqa: PLC0415

        if self._host_thread is not None:
            self._host_thread.join()
            return self._host_result[0]

        if self._empty:
            return np.zeros(4 ** self._length, dtype=np.int32), 0
        vals, max_count, ltot, susp_np = jax.device_get(
            (self._vals, self._max, self._ltot, self._susp))
        if int(max_count) > np.iinfo(np.uint16).max:
            vals = np.asarray(_count_device_packed_i32(
                self._buf_dev, self._seq_len, self._length, self._both))
        if self._both:
            counts_np = mirror_canonical_native(vals, self._length)
            if counts_np is None:
                full = np.zeros(4 ** self._length, dtype=np.int32)
                canon = np.flatnonzero(
                    _np_canonical_mask_flat(self._length))
                full[canon] = vals
                rcs = np.array([_np_revcomp_id(int(i), self._length)
                                for i in canon], dtype=np.int64)
                full[rcs] = vals
                counts_np = full
        else:
            counts_np = vals.astype(np.int32)
        if susp_np.any():
            rows = self._codes_np[np.flatnonzero(susp_np)]
            counts64 = counts_np.astype(np.int64)
            _apply_fixup_rows(counts64, rows, self._length, self._both)
            counts_np = counts64.astype(np.int32)
        return counts_np, int(ltot)


def _np_canonical_mask_flat(length: int) -> np.ndarray:
    ids = np.arange(4 ** length, dtype=np.int64)
    return ids <= encoding.np_rc_permute(ids, length)


def _apply_fixup_rows(counts64: np.ndarray, rows: np.ndarray, length: int,
                      both_strands: bool):
    """Apply the exact-vs-naive dedup delta for suspicious rows (native
    batch recount with Python fallback)."""
    from ..native import dedup_fixup_rows_native  # noqa: PLC0415

    res = dedup_fixup_rows_native(rows, length, both_strands)
    if res is not None:
        ids, dv = res
        for cid, d in zip(ids.tolist(), dv.tolist()):
            counts64[cid] += d
            if both_strands:
                rcid = _np_revcomp_id(cid, length)
                if rcid != cid:
                    counts64[rcid] += d
        return
    delta: dict = {}
    for row in rows:
        for cid, d in host_row_recount(row, length, both_strands).items():
            delta[cid] = delta.get(cid, 0) + d
    for cid, d in delta.items():
        counts64[cid] += d
        if both_strands:
            rcid = _np_revcomp_id(cid, length)
            if rcid != cid:
                counts64[rcid] += d


def count_patterns(codes, length: int, both_strands: bool = True):
    """Count non-overlapping pattern occurrences over a sequence batch.

    Args:
      codes: [B, L] BaMM codes (0 = N / padding), numpy or jax array.
      length: pattern length W.
      both_strands: canonicalize ids to min(id, revcomp) and mirror counts.

    Returns:
      counts: [4**W] int32 count table (mirrored to rc ids when
        both_strands), ltot: int32 total number of valid windows.
    """
    codes = jnp.asarray(codes)
    if codes.shape[0] == 0 or codes.shape[1] < length:
        # no window fits: the reference scan finds nothing
        # (src/base_pattern.cpp:331-441 with no valid start position)
        return (jnp.zeros(4 ** length, dtype=jnp.int32),
                jnp.asarray(0, dtype=jnp.int32))
    counts, ltot, suspicious = _count_device(codes, length, both_strands)
    susp_np = np.asarray(suspicious)
    if susp_np.any():
        counts_np = np.asarray(counts).astype(np.int64)
        apply_dedup_fixup(counts_np, codes, susp_np, length, both_strands)
        counts = jnp.asarray(counts_np.astype(np.int32))
    return counts, ltot


def apply_dedup_fixup(
    counts_np: np.ndarray,
    codes,
    susp_np: np.ndarray,
    length: int,
    both_strands: bool,
):
    """Exactly re-count the suspicious rows on host and apply the sparse
    delta in place to a (post-mirror) count table.  Returns the list of
    corrected pattern ids (canonical + mirrored)."""
    delta: dict = {}
    rows = np.asarray(codes[np.flatnonzero(susp_np)])
    for row in rows:
        for cid, dv in host_row_recount(row, length, both_strands).items():
            delta[cid] = delta.get(cid, 0) + dv
    touched = []
    for cid, dv in delta.items():
        counts_np[cid] += dv
        touched.append(cid)
        if both_strands:
            rcid = _np_revcomp_id(cid, length)
            if rcid != cid:
                counts_np[rcid] += dv
                touched.append(rcid)
    return touched


def _row_cids_processed(row_codes: np.ndarray, length: int,
                        both_strands: bool):
    """Per-row canonical ids with the device's processed mask applied
    (clean windows minus the reference scan's post-N skip; see
    :func:`scan_skip_mask`).  Returns cid [NW] with -1 at unprocessed."""
    W = length
    c = np.asarray(row_codes, dtype=np.int64)
    n_win = c.shape[0] - W + 1
    if n_win <= 0:
        return np.empty(0, dtype=np.int64)
    valid = np.ones(n_win, dtype=bool)
    fwd = np.zeros(n_win, dtype=np.int64)
    rc = np.zeros(n_win, dtype=np.int64)
    for p in range(W):
        cc = c[p : p + n_win]
        valid &= cc > 0
        fwd += (cc - 1) * (4 ** p)
        rc += (4 - cc) * (4 ** (W - 1 - p))
    d = W + 1
    skip = np.zeros(n_win, dtype=bool)
    for s in range(d, n_win):
        skip[s] = (c[s - 1] == 0) and valid[s - d] and not skip[s - d]
    processed = valid & ~skip
    return np.where(processed, np.minimum(fwd, rc) if both_strands else fwd,
                    -1)


def host_row_recount(row_codes: np.ndarray, length: int, both_strands: bool):
    """Exact greedy recount of one sequence, returned as the sparse count
    delta {canonical_id: exact - naive} (reference semantics:
    src/base_pattern.cpp:331-393).  "naive" replicates the device's
    vectorized decision (processed mask + W-1-shift blocking); "exact"
    is the greedy last-accepted-position rule over processed windows,
    equivalent to the reference scan automaton."""
    W = length
    cid = _row_cids_processed(row_codes, length, both_strands)
    n_win = cid.shape[0]
    if n_win == 0:
        return {}

    blocked = np.zeros(n_win, dtype=bool)
    for d in range(1, min(W, n_win)):
        eq = (cid[d:] == cid[:-d]) & (cid[d:] >= 0) & (cid[:-d] >= 0)
        blocked[d:] |= eq
    naive = (cid >= 0) & ~blocked

    exact = np.zeros(n_win, dtype=bool)
    last: dict = {}
    for j in range(n_win):
        i = int(cid[j])
        if i < 0:
            continue
        if i not in last or j - last[i] >= W:
            exact[j] = True
            last[i] = j

    delta: dict = {}
    for j in np.flatnonzero(naive != exact):
        i = int(cid[j])
        delta[i] = delta.get(i, 0) + (1 if exact[j] else -1)
    return delta


def reference_scan_row(row_codes: np.ndarray, length: int,
                       both_strands: bool):
    """Direct transcription of the reference's rolling scan for one row
    (src/base_pattern.cpp:331-393 / 395-441): returns
    ({canonical_id: count}, ltot).  Test oracle for the vectorized
    processed-mask + dedup formulation."""
    W = length
    c = np.asarray(row_codes, dtype=np.int64)
    L = c.shape[0]
    counts: dict = {}
    last: dict = {}
    ltot = 0
    i = 0
    while i < L:
        p = 0
        pid = 0
        while p < W and i < L and c[i] > 0:
            pid += (c[i] - 1) * (4 ** p)
            p += 1
            i += 1
        if p < W:
            i += 1  # outer-loop increment after `continue`
            continue
        while True:
            s = i - W  # window start
            cid = min(pid, _np_revcomp_id(int(pid), W)) if both_strands \
                else int(pid)
            if cid not in last or last[cid] + W <= s:
                counts[cid] = counts.get(cid, 0) + 1
                last[cid] = s
            ltot += 1
            if i >= L or c[i] == 0:
                break
            pid = pid // 4 + (c[i] - 1) * (4 ** (W - 1))
            i += 1
        i += 2  # explicit i++ after the stream + outer-loop increment
    return counts, ltot


def _np_revcomp_id(pattern: int, length: int) -> int:
    out = 0
    for p in range(length):
        c = (pattern >> (2 * p)) & 3
        out += (3 - c) * (4 ** (length - 1 - p))
    return out
