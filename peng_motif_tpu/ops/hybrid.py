"""Adaptive host+device co-counting for the stream count phase.

Why this exists (round-4 verdict next #1): on a remote/tunneled TPU
backend the count phase is bound by the host->device wire (~16 MB/s
effective, i.e. ~64 Mbases/s on the 2-bit wire) plus a fixed ~0.2 s
relay round trip per blocking fetch, while the host's threaded native
scan (``count_rows_exact_native`` + the bg (k+1)-mer scan) sustains a
comparable ~70 Mbases/s.  Shipping the WHOLE corpus to the device is
therefore never optimal: the wall-optimal placement splits the corpus
so both engines finish together, and below a crossover (~25-35 Mbases)
skips the device round trip entirely.

The split is exact, not approximate: every count-phase quantity is
per-sequence additive —

  * the W-mer table: windows never span sequences (reference:
    src/base_pattern.cpp:331-393 resets at sequence ends), so
    table(corpus) = table(A) + table(B) bin-wise, and the greedy
    non-overlap dedup is per-sequence too;
  * ltot adds; the device dedup fix-up (seam certificates) only
    concerns the device share's stream;
  * background (k+1)-mer counts add per sequence
    (models/background.py count_kmers is the per-sequence oracle).

The device share keeps the resident table + all table-parallel phases
(stats DP, lockstep climb, adv-PWM, EM) on device; the host share is
injected into the resident table as a dense addend operand of the
stats program (no extra dispatch).  ``PENG_HYBRID_DEVICE_FRAC``
overrides the planner (1 = pure device, 0 = host-only count);
``PENG_WIRE_BASES_S`` / ``PENG_HOST_SCAN_BASES_S`` /
``PENG_DEVICE_LATENCY_S`` recalibrate the cost model.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "HostShare",
    "plan_device_fraction",
    "split_index",
    "start_host_share",
]


def _env_f(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


def _host_bases_s(W: int) -> float:
    """Host-share throughput (threaded native count scan + bg scan in
    sequence, derated ~0.8x for core contention with the engine's own
    pack/parse threads; measured 2026-08-21 on the 2-core bench host:
    count 140/105 Mbases/s at w8/w10, bg ~340 after the
    rolling-register rewrite)."""
    count = 140e6 if W <= 8 else (105e6 if W <= 10 else 90e6)
    return 0.8 / (1.0 / count + 1.0 / 340e6)


def _kernel_bases_s(W: int) -> float:
    """Device histogram throughput by table size (measured v5e,
    BENCH_r04 roofline): the MXU one-hot path sustains ~580 Mbases/s up
    to 4**8 bins, the square-split kernel ~115 at 4**10, and the XLA
    scatter ~85 beyond."""
    n_bins = 4 ** W
    if n_bins <= (1 << 16):
        return 580e6
    if n_bins <= (1 << 20):
        return 115e6
    return 85e6


def plan_device_fraction(total_bases: int, W: int = 8) -> float:
    """Wall-optimal device share f in [0, 1].

    Cost model: device wall = f*B/d + lat, where 1/d = 1/wire +
    1/kernel (the upload and the in-program scan don't overlap on a
    single fused dispatch) and lat is one blocking blob round trip;
    host wall = (1-f)*B/h (threaded native count+bg scan).  Minimizing
    max(...) equalizes the two:

        f* = (B/h - lat) / (B/d + B/h),  clipped to [0, 1]

    f* <= 0 (small corpora) means the host scan alone beats any split
    that pays the device round trip -> host-only count.  The rates are
    calibrated on the tunneled-relay backend from a live hybrid run
    (2026-08-21, 51.2 Mbases, w8, f=0.34: device share 17.4 Mb done in
    0.33 s incl. the blocking blob fetch -> wire~80e6 with lat~0.12 s;
    host share 33.8 Mb in 0.62 s -> h~55e6, the count+bg native scans
    time-sharing 2 cores with the engine's own threads) and
    env-overridable for other links.
    """
    forced = os.environ.get("PENG_HYBRID_DEVICE_FRAC")
    if forced is not None:
        try:
            return min(1.0, max(0.0, float(forced)))
        except ValueError:
            pass
    wire = _env_f("PENG_WIRE_BASES_S", 80e6)
    h = _env_f("PENG_HOST_SCAN_BASES_S", _host_bases_s(W))
    lat = _env_f("PENG_DEVICE_LATENCY_S", 0.12)
    if total_bases <= 0 or wire <= 0:
        return 0.0
    if h <= 0:
        return 1.0
    d = 1.0 / (1.0 / wire + 1.0 / _kernel_bases_s(W))
    b_h = total_bases / h
    f = (b_h - lat) / (total_bases / d + b_h)
    return min(1.0, max(0.0, f))


def split_index(lengths: np.ndarray, frac: float):
    """(ja, off): device share = sequences[:ja] (first ``off`` flat
    bases), host share = sequences[ja:].  ``ja`` is the smallest prefix
    holding >= frac of the bases; frac >= 1 maps to the whole corpus."""
    n = int(lengths.shape[0])
    if n == 0 or frac >= 1.0:
        return n, int(lengths.sum())
    if frac <= 0.0:
        return 0, 0
    cum = np.cumsum(lengths.astype(np.int64))
    target = frac * float(cum[-1])
    ja = int(np.searchsorted(cum, target, side="left")) + 1
    ja = min(ja, n)
    return ja, int(cum[ja - 1]) if ja > 0 else 0


def _host_rows(sequences: Sequence[np.ndarray], lengths: np.ndarray,
               flat: Optional[np.ndarray], off: int) -> np.ndarray:
    """[nB, Lmax] uint8 rows for the host share (zero padding ==
    undefined base, the count scan's window-validity sentinel — same
    contract as SequenceSet.padded).  Uniform-length corpora with a
    contiguous parse buffer reshape zero-copy."""
    lens = lengths.astype(np.int64)
    if lens.size == 0:
        return np.zeros((0, 1), dtype=np.uint8)
    lmax = int(lens.max())
    if (flat is not None and int(lens.min()) == lmax
            and flat.shape[0] - off == lens.size * lmax):
        return flat[off:].reshape(lens.size, lmax)
    out = np.zeros((lens.size, lmax), dtype=np.uint8)
    if flat is not None and flat.shape[0] - off == int(lens.sum()):
        mask = np.arange(lmax)[None, :] < lens[:, None]
        out[mask] = flat[off:]
        return out
    for i, s in enumerate(sequences):
        out[i, : len(s)] = np.asarray(s, dtype=np.uint8)
    return out


class HostShare:
    """Handle on the host share's background scan thread."""

    def __init__(self, thread: threading.Thread, box: list):
        self._thread = thread
        self._box = box

    def join(self):
        """(table int32 [4**W] mirrored, ltot, bg counts list | None);
        raises if the scan thread failed."""
        self._thread.join()
        if isinstance(self._box[0], BaseException):
            raise self._box[0]
        return self._box[0]


def host_share_available() -> bool:
    from ..native import get_lib  # noqa: PLC0415

    return get_lib() is not None


def start_host_share(
    sequences: Sequence[np.ndarray],
    lengths: np.ndarray,
    flat: Optional[np.ndarray],
    off: int,
    W: int,
    both_strands: bool,
    bg_order: int = -1,
) -> HostShare:
    """Begin the host share's threaded native count scan (+ bg scan when
    ``bg_order >= 0``) over ``sequences`` — the suffix the planner kept
    off the wire.  Overlaps the device share's upload + scan; join()
    after the device blob fetch."""
    seqs = list(sequences)
    lens = np.asarray(lengths, dtype=np.int64)
    box: list = [None]

    def _run():
        try:
            from ..native import count_rows_exact_native  # noqa: PLC0415

            rows = _host_rows(seqs, lens, flat, off)
            res = count_rows_exact_native(rows, W, both_strands)
            if res is None:
                raise RuntimeError("native count unavailable mid-run")
            table, ltot = res
            bg = None
            if bg_order >= 0:
                from ..models.background import count_kmers  # noqa: PLC0415

                bg = count_kmers(seqs, bg_order)
            box[0] = (table, int(ltot), bg)
        except BaseException as e:  # noqa: BLE001 - rethrown in join()
            box[0] = e

    t = threading.Thread(target=_run, daemon=True)
    t.start()
    return HostShare(t, box)
