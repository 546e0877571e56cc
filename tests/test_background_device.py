"""Fused device background counting vs the host oracle.

The TPU engine counts the background (k+1)-mers inside the stream count
program (ops/stream_count.stream_bg_counts) and completes the result
with two host corrections (models/background.bg_device_corrections);
reference semantics: src/shared/BackgroundModel.cpp:59-84 with the
N-sentinel quirk of src/shared/Sequence.cpp:28-33.  These tests pin
device + corrections == count_kmers (itself pinned against the
reference transcription _count_kmers_loop elsewhere) on every edge the
N quirk has: N runs at sequence starts/ends, all-A near Ns (the signed-
modulo rescue), sequences shorter than the lookback, multi-chunk
contigs, and the last sequence's tail (covered by the stream's W-1
trailing zeros).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from peng_motif_tpu.models.background import (
    BackgroundModel,
    bg_device_corrections,
    count_kmers,
)
from peng_motif_tpu.ops import stream_count as sc
from peng_motif_tpu.ops.counting import _n_canonical


def _device_bg(seqs, W, K):
    stream, lay = sc.build_stream(seqs, W)
    buf = jnp.asarray(sc.chunked_packed(stream, lay))
    _, blob = sc.stream_count_device_fused(
        buf, lay.row, lay.ctx, W, True, K)
    *_rest, bg = sc.split_fetch_blob(
        np.asarray(blob), lay.m_pad, _n_canonical(W), K)
    corr = bg_device_corrections(seqs, K, lengths=lay.lengths)
    return [bg[sc.bg_offset(k) : sc.bg_offset(k) + 4 ** (k + 1)] + corr[k]
            for k in range(K + 1)]


def _assert_matches(seqs, W, K):
    seqs = [np.asarray(s, dtype=np.uint8) for s in seqs]
    got = _device_bg(seqs, W, K)
    want = count_kmers(seqs, K)
    for k in range(K + 1):
        np.testing.assert_array_equal(got[k], want[k], err_msg=f"order {k}")


@pytest.mark.parametrize("W", [6, 8, 10])
def test_bg_device_clean_random(W):
    rng = np.random.default_rng(3)
    _assert_matches([rng.integers(1, 5, size=int(n))
                     for n in rng.integers(10, 300, size=40)], W, 2)


def test_bg_device_n_quirks():
    rng = np.random.default_rng(4)
    seqs = []
    for _ in range(25):
        s = rng.integers(1, 5, size=120).astype(np.uint8)
        s[rng.integers(0, 120, size=4)] = 0
        seqs.append(s)
    # N runs at starts/ends, all-A near Ns (v==0 rescue), tiny seqs
    seqs += [
        np.array([0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1], np.uint8),
        np.array([1] * 20 + [0] + [1] * 20, np.uint8),
        np.concatenate([np.zeros(10, np.uint8),
                        rng.integers(1, 5, size=30).astype(np.uint8),
                        np.zeros(9, np.uint8)]),
        np.array([2], np.uint8),
        np.array([0], np.uint8),
        np.array([1, 2, 3], np.uint8),
    ]
    _assert_matches(seqs, 8, 2)
    _assert_matches(seqs, 6, 2)


def test_bg_device_long_contig_and_tail():
    rng = np.random.default_rng(5)
    # multi-chunk contig; tail of the LAST sequence exercises the
    # trailing-zero end coverage
    seqs = [rng.integers(1, 5, size=4000).astype(np.uint8),
            rng.integers(1, 5, size=777).astype(np.uint8)]
    _assert_matches(seqs, 8, 2)
    _assert_matches(seqs, 10, 3)


def test_bg_offsets_and_bins():
    assert sc.bg_offset(0) == 0
    assert sc.bg_offset(1) == 4
    assert sc.bg_offset(2) == 20
    assert sc.bg_nbins(2) == 128
    assert sc.bg_nbins(3) == 384


def test_deferred_model_provide_and_fallback():
    rng = np.random.default_rng(6)
    seqs = [rng.integers(0, 5, size=100).astype(np.uint8)
            for _ in range(10)]
    want = BackgroundModel(seqs, order=2).v
    # provide_counts path
    m = BackgroundModel(seqs, order=2, defer=True)
    assert m.deferred
    m.provide_counts(count_kmers(seqs, 2))
    for a, b in zip(m.v, want):
        np.testing.assert_array_equal(a, b)
    # fallback: access before delivery counts synchronously
    m2 = BackgroundModel(seqs, order=2, defer=True)
    for a, b in zip(m2.v, want):
        np.testing.assert_array_equal(a, b)
    # start_host_counting path (engine gate failed)
    m3 = BackgroundModel(seqs, order=2, defer=True)
    m3.start_host_counting()
    for a, b in zip(m3.v, want):
        np.testing.assert_array_equal(a, b)


def test_corrections_without_flat_codes():
    """bg_device_corrections must concatenate sequences itself when no
    contiguous parse buffer is supplied (or when it mismatches)."""
    rng = np.random.default_rng(8)
    seqs = [rng.integers(0, 5, size=int(n)).astype(np.uint8)
            for n in rng.integers(5, 60, size=12)]
    with_flat = bg_device_corrections(
        seqs, 2, flat_codes=np.concatenate(seqs),
        lengths=np.array([len(s) for s in seqs]))
    without = bg_device_corrections(seqs, 2)
    mismatched = bg_device_corrections(
        seqs, 2, flat_codes=np.zeros(3, np.uint8))
    for k in range(3):
        np.testing.assert_array_equal(with_flat[k], without[k])
        np.testing.assert_array_equal(with_flat[k], mismatched[k])


def test_defer_gate_cli_paths(tmp_path, monkeypatch):
    """The CLI only defers the bg model when the engine will count it
    on device: a separate --background-sequences corpus must take the
    host path and still reproduce the reference output."""
    import os

    from conftest import GOLDEN_DIR
    from peng_motif_tpu.cli import main

    # separate bg corpus (the golden bgmafk config): byte parity via
    # the non-deferred path under --engine tpu
    out = str(tmp_path / "o.meme")
    rc = main([os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta"), "-w", "8",
               "--background-sequences",
               os.path.join(GOLDEN_DIR, "MafK.fasta"),
               "--engine", "tpu", "-o", out])
    assert rc == 0
    golden = os.path.join(GOLDEN_DIR, "mafk100_w8_bgmafk.meme")
    got = open(out).read().splitlines()
    want = open(golden).read().splitlines()
    assert len(got) == len(want)
    for a, b in zip(got, want):
        if a == b:
            continue
        for x, y in zip(a.split(), b.split()):
            if x != y:
                assert abs(float(x) - float(y)) <= 5e-6 + 1e-6 * abs(
                    float(y))


def test_last_engine_used_tracking(tmp_path):
    """pipeline.LAST_ENGINE_USED must record which engine actually ran
    (the bench's degraded-run honesty flag depends on it)."""
    import os

    import peng_motif_tpu.pipeline as pl
    from conftest import GOLDEN_DIR
    from peng_motif_tpu.cli import main

    fa = os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta")
    assert main([fa, "-w", "8", "--engine", "tpu",
                 "-o", str(tmp_path / "a.meme")]) == 0
    assert pl.LAST_ENGINE_USED == "tpu"
    assert main([fa, "-w", "8", "--engine", "exact",
                 "-o", str(tmp_path / "b.meme")]) == 0
    assert pl.LAST_ENGINE_USED == "exact"
