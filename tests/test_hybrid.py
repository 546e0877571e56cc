"""Hybrid host+device co-count (ops/hybrid.py): the planner's split
must never change any output — the count table, ltot and the background
model are per-sequence additive, so every fraction must yield
byte-identical results on the same backend.  Covers uniform and ragged
corpora, Ns (wire-1 + correction paths), host-only (frac 0), the
u16-overflow host-share table, and the planner's cost model."""

import os

import numpy as np
import pytest

from conftest import GOLDEN_DIR

from peng_motif_tpu.cli import main
from peng_motif_tpu.ops import hybrid as hy


def _run(argv, out, monkeypatch, frac=None):
    if frac is None:
        monkeypatch.delenv("PENG_HYBRID_DEVICE_FRAC", raising=False)
    else:
        monkeypatch.setenv("PENG_HYBRID_DEVICE_FRAC", str(frac))
    assert main(argv + ["-o", out]) == 0
    with open(out, "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# planner unit behavior
# ---------------------------------------------------------------------------


def test_plan_tiny_corpus_host_only(monkeypatch):
    monkeypatch.delenv("PENG_HYBRID_DEVICE_FRAC", raising=False)
    # 1 Mbase at the calibrated rates: host scan ~14 ms < device round
    # trip -> keep everything off the wire
    assert hy.plan_device_fraction(1_000_000) == 0.0
    assert hy.plan_device_fraction(0) == 0.0


def test_plan_large_corpus_splits(monkeypatch):
    monkeypatch.delenv("PENG_HYBRID_DEVICE_FRAC", raising=False)
    f = hy.plan_device_fraction(51_200_000)
    assert 0.2 < f < 0.6
    # device share grows toward the equal-rate split as B -> inf
    f_big = hy.plan_device_fraction(1_000_000_000)
    assert f < f_big < 0.65
    # wider tables scan slower on device (4**10 histogram) -> the
    # planner keeps more of the corpus on host past w8 (the host scan
    # slows too, so w10/w12 land close together below the w8 share)
    assert hy.plan_device_fraction(51_200_000, 10) < f
    assert hy.plan_device_fraction(51_200_000, 12) < f


def test_plan_env_override(monkeypatch):
    monkeypatch.setenv("PENG_HYBRID_DEVICE_FRAC", "1")
    assert hy.plan_device_fraction(10) == 1.0
    monkeypatch.setenv("PENG_HYBRID_DEVICE_FRAC", "0.25")
    assert hy.plan_device_fraction(10 ** 9) == 0.25
    monkeypatch.setenv("PENG_HYBRID_DEVICE_FRAC", "7")  # clipped
    assert hy.plan_device_fraction(10) == 1.0


def test_split_index_edges():
    lens = np.array([10, 20, 30, 40], dtype=np.int64)
    assert hy.split_index(lens, 0.0) == (0, 0)
    assert hy.split_index(lens, 1.0) == (4, 100)
    ja, off = hy.split_index(lens, 0.5)
    assert off == int(lens[:ja].sum())
    assert lens[:ja].sum() >= 50 and lens[: ja - 1].sum() < 50
    assert hy.split_index(np.zeros(0, np.int64), 0.5) == (0, 0)


def test_host_rows_uniform_and_ragged():
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, 5, size=12).astype(np.uint8) for _ in range(5)]
    flat = np.concatenate(seqs)
    lens = np.full(5, 12, dtype=np.int64)
    rows = hy._host_rows(seqs, lens, flat, 0)
    assert rows.base is flat or rows.flags["OWNDATA"] is False  # view
    np.testing.assert_array_equal(rows, np.stack(seqs))
    # ragged + offset: suffix starting at sequence 2
    seqs_r = [rng.integers(1, 5, size=n).astype(np.uint8)
              for n in (7, 3, 9, 4)]
    flat_r = np.concatenate(seqs_r)
    rows_r = hy._host_rows(
        seqs_r[2:], np.array([9, 4], np.int64), flat_r, 10)
    want = np.zeros((2, 9), np.uint8)
    want[0] = seqs_r[2]
    want[1, :4] = seqs_r[3]
    np.testing.assert_array_equal(rows_r, want)
    # no flat buffer: built from the sequence list
    rows_n = hy._host_rows(seqs_r[2:], np.array([9, 4], np.int64), None, 0)
    np.testing.assert_array_equal(rows_n, want)


def test_host_share_counts_match_full_scan():
    """Device-share + host-share tables must sum to the full-corpus
    table (per-sequence additivity), including bg counts."""
    from peng_motif_tpu.models.background import count_kmers
    from peng_motif_tpu.native import count_rows_exact_native

    if not hy.host_share_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    seqs = [rng.integers(0, 5, size=rng.integers(20, 90)).astype(np.uint8)
            for _ in range(40)]
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    flat = np.concatenate(seqs)
    full_tab, full_ltot = count_rows_exact_native(
        hy._host_rows(seqs, lens, flat, 0), 6, True)
    ja, off = hy.split_index(lens, 0.5)
    a_tab, a_ltot = count_rows_exact_native(
        hy._host_rows(seqs[:ja], lens[:ja], flat[:off], 0), 6, True)
    share = hy.start_host_share(seqs[ja:], lens[ja:], flat, off, 6, True,
                                bg_order=2)
    b_tab, b_ltot, bg_b = share.join()
    np.testing.assert_array_equal(a_tab + b_tab, full_tab)
    assert a_ltot + b_ltot == full_ltot
    bg_full = count_kmers(seqs, 2)
    bg_a = count_kmers(seqs[:ja], 2)
    for k in range(3):
        np.testing.assert_array_equal(bg_a[k] + bg_b[k], bg_full[k])


def test_host_share_error_surfaces():
    share = hy.start_host_share(
        [np.array([1, 2, 3], np.uint8)], np.array([3], np.int64),
        None, 0, -1, True)  # invalid W -> native must fail loudly
    with pytest.raises(Exception):
        share.join()


# ---------------------------------------------------------------------------
# end-to-end: every fraction yields identical output
# ---------------------------------------------------------------------------


def _write_corpus(path, rng, n, lo, hi, with_n=False):
    letters = np.frombuffer(b"NACGT", dtype=np.uint8)
    with open(path, "wb") as f:
        for i in range(n):
            ln = int(rng.integers(lo, hi + 1))
            codes = rng.integers(1, 5, size=ln)
            if with_n and i % 7 == 0:
                p = int(rng.integers(0, max(ln - 5, 1)))
                codes[p: p + 4] = 0
            f.write(b">s%d\n" % i)
            f.write(letters[codes].tobytes())
            f.write(b"\n")


@pytest.mark.parametrize("ragged_n", [False, True])
def test_engine_output_invariant_under_split(tmp_path, monkeypatch,
                                             ragged_n):
    """frac 0 / 0.37 / 1 byte-identical on uniform and ragged+N
    corpora (CPU backend: same device programs, so the invariance is
    exact, not tolerance-bound)."""
    rng = np.random.default_rng(11 if ragged_n else 5)
    data = str(tmp_path / "c.fasta")
    if ragged_n:
        _write_corpus(data, rng, 120, 60, 140, with_n=True)
    else:
        _write_corpus(data, rng, 150, 100, 100)
    argv = [data, "-w", "6", "--engine", "tpu"]
    outs = {}
    for frac in (1, 0.37, 0):
        outs[frac] = _run(argv, str(tmp_path / f"o{frac}.meme"),
                          monkeypatch, frac)
    assert outs[0.37] == outs[1]
    assert outs[0] == outs[1]


def test_engine_golden_tol_under_split(tmp_path, monkeypatch):
    """Forced split on the golden corpus still matches the reference
    within the engine tolerance — and count-phase integers exactly
    (frac 0.5 output == default engine-tpu output byte-for-byte)."""
    data = os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta")
    argv = [data, "-w", "8", "--engine", "tpu"]
    base = _run(argv, str(tmp_path / "b.meme"), monkeypatch, None)
    half = _run(argv, str(tmp_path / "h.meme"), monkeypatch, 0.5)
    assert half == base


def test_u16_overflow_host_share(tmp_path, monkeypatch):
    """A host-share bin past uint16 takes the i32 host_add variant (or
    the i32 counts upload at frac 0) with identical results."""
    data = str(tmp_path / "poly.fasta")
    seq = b"ACGT" * 20_000  # 80 kb
    with open(data, "wb") as f:
        for i in range(100):  # 8 Mbases; ACGTACGT bin >> 65535
            f.write(b">s%d\n" % i)
            f.write(seq + b"\n")
    argv = [data, "-w", "8", "--engine", "tpu", "-t", "1000"]
    outs = [_run(argv, str(tmp_path / f"o{i}.meme"), monkeypatch, frac)
            for i, frac in enumerate((1, 0.5, 0))]
    assert outs[1] == outs[0]
    assert outs[2] == outs[0]


def test_cold_count_downgrade_then_device(tmp_path, monkeypatch):
    """First run on a 'remote' backend (forced via _cold_warmed) with
    an uncompiled count program counts host-only (frac 0) and spawns
    the background compile; once the compile marker lands, the next run
    takes the planner's device share.  Outputs identical either way."""
    import time

    import peng_motif_tpu.engine_tpu as et

    rng = np.random.default_rng(2)
    data = str(tmp_path / "c.fasta")
    _write_corpus(data, rng, 200, 120, 120)
    monkeypatch.setattr(et, "_cold_warmed", {("forced",)})
    monkeypatch.setattr(et, "_count_compiled", set())
    monkeypatch.setattr(et, "_count_warm_spawned", set())
    # planner would pick a device share > 0
    monkeypatch.setenv("PENG_WIRE_BASES_S", "1e9")
    monkeypatch.setenv("PENG_HOST_SCAN_BASES_S", "1e3")
    monkeypatch.setenv("PENG_DEVICE_LATENCY_S", "0")
    argv = [data, "-w", "6", "--engine", "tpu"]
    out1 = str(tmp_path / "o1.meme")
    assert main(argv + ["-o", out1]) == 0
    assert et.LAST_HYBRID_FRAC == 0.0          # cold downgrade
    # background compile marks the key (CPU compiles are fast)
    t0 = time.time()
    while not et._count_compiled and time.time() - t0 < 60:
        time.sleep(0.2)
    assert et._count_compiled, "count warm never landed"
    out2 = str(tmp_path / "o2.meme")
    assert main(argv + ["-o", out2]) == 0
    assert et.LAST_HYBRID_FRAC > 0.0           # device share live
    with open(out1, "rb") as f, open(out2, "rb") as g:
        assert f.read() == g.read()
