"""Counting semantics vs a direct Python port of the reference scan
(reference: src/base_pattern.cpp:331-441), on adversarial inputs:
tandem repeats, homopolymers, Ns, short sequences."""

import numpy as np
import pytest

import conftest  # noqa: F401

import jax.numpy as jnp

from peng_motif_tpu import alphabets as al
from peng_motif_tpu.ops.counting import count_patterns


def reference_count(seqs, W, both_strands):
    """Literal transcription of the reference counting semantics: one
    global position counter with W-gaps between sequences, last-match
    bookkeeping per canonical id."""
    n = 4 ** W
    counter = np.zeros(n, dtype=np.int64)
    last_match = np.zeros(n, dtype=np.int64)
    ltot = 0
    j = W
    for seq in seqs:
        L = len(seq)
        i = 0
        while i < L:
            # rebuild id over W valid chars
            p = 0
            pid = 0
            while p < W and i < L and seq[i] > 0:
                pid += (4 ** p) * (int(seq[i]) - 1)
                p += 1
                i += 1
                j += 1
            if p < W:
                i += 1
                j += 1
                continue
            while True:
                if both_strands:
                    cid = min(pid, al.base_revcomp_id(pid, W))
                else:
                    cid = pid
                if last_match[cid] + W <= j:
                    counter[cid] += 1
                    last_match[cid] = j
                ltot += 1
                if i >= L or seq[i] == 0:
                    break
                pid //= 4
                pid += (int(seq[i]) - 1) * (4 ** (W - 1))
                i += 1
                j += 1
            # the reference's explicit `i++; j++;` after the stream PLUS
            # the outer for-loop increment: the window starting right
            # after a stream-breaking N is never evaluated
            # (src/base_pattern.cpp:377-382)
            i += 2
            j += 2
        j += W
    if both_strands:
        for pid in range(n):
            rc = al.base_revcomp_id(pid, W)
            if pid > rc:
                counter[pid] = counter[rc]
    return counter, ltot


def pad(seqs):
    max_l = max(len(s) for s in seqs)
    out = np.zeros((len(seqs), max_l + 3), dtype=np.uint8)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def encode(s):
    return np.array([0 if c == "N" else "ACGT".index(c) + 1 for c in s],
                    dtype=np.uint8)


CASES = [
    ["AAAAAAAAAAAA"],                      # homopolymer: dedup every W
    ["ACGTACGTACGTACGT"],                  # period-4 tandem repeat
    ["ATATATATATATAT"],                    # period-2, palindromic windows
    ["ACGTNNACGTACGT", "TTTTTTTT"],        # Ns break windows
    ["ACG"],                               # shorter than W
    ["TGCATGCATGCA", "GGGGCCCCGGGG", "ACGTACGTAAAA"],
    ["AATTAATTAATTAATT"],                  # revcomp-equal tandem
]


@pytest.mark.parametrize("strings", CASES)
@pytest.mark.parametrize("both", [True, False])
@pytest.mark.parametrize("W", [4, 6, 8])
def test_count_matches_reference_scan(strings, both, W):
    seqs = [encode(s) for s in strings]
    want, want_ltot = reference_count(seqs, W, both)
    got, got_ltot = count_patterns(jnp.asarray(pad(seqs)), W, both)
    assert int(got_ltot) == want_ltot
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)


def test_random_sequences_with_ns():
    rng = np.random.default_rng(42)
    for trial in range(3):
        seqs = [
            rng.integers(0, 5, size=rng.integers(3, 60)).astype(np.uint8)
            for _ in range(7)
        ]
        for W in (4, 6):
            for both in (True, False):
                want, want_ltot = reference_count(seqs, W, both)
                got, got_ltot = count_patterns(jnp.asarray(pad(seqs)), W, both)
                assert int(got_ltot) == want_ltot
                np.testing.assert_array_equal(
                    np.asarray(got, dtype=np.int64), want
                )


@pytest.mark.parametrize("strings", CASES)
@pytest.mark.parametrize("both", [True, False])
@pytest.mark.parametrize("W", [4, 6])
def test_host_native_counter_matches_reference(strings, both, W):
    """The adaptive-dispatch host scan (native count_rows_exact) must
    produce the identical table and ltot on every adversarial case."""
    from peng_motif_tpu.native import count_rows_exact_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    seqs = [encode(s) for s in strings]
    want, want_ltot = reference_count(seqs, W, both)
    got, got_ltot = count_rows_exact_native(pad(seqs), W, both)
    assert got_ltot == want_ltot
    np.testing.assert_array_equal(got.astype(np.int64), want)


def test_host_native_counter_random():
    from peng_motif_tpu.native import count_rows_exact_native, get_lib

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    for _ in range(3):
        seqs = [
            rng.integers(0, 5, size=rng.integers(3, 60)).astype(np.uint8)
            for _ in range(7)
        ]
        for W in (4, 6):
            for both in (True, False):
                want, want_ltot = reference_count(seqs, W, both)
                got, got_ltot = count_rows_exact_native(pad(seqs), W, both)
                assert got_ltot == want_ltot
                np.testing.assert_array_equal(got.astype(np.int64), want)


def test_pruned_zsort_prefix_matches_full_sort():
    """The prefix-pruned z-sort must reproduce the full libstdc++
    std::sort element-for-element on the consumed (above-threshold + 1)
    prefix, including tie placement, on tie-heavy inputs."""
    from peng_motif_tpu.native import (
        get_lib, zscore_sort_indices, zscore_sort_prefix_indices)

    if get_lib() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(3)
    for _ in range(8):
        n = int(rng.integers(30, 200_000))
        half = rng.normal(0, 4, n // 2).astype(np.float32)
        half = np.round(half, 1).astype(np.float32)  # heavy ties
        z = np.concatenate([half, half, half[: n - 2 * (n // 2)]])
        z = z[rng.permutation(n)]
        thr = float(rng.choice([-2.0, 0.0, 3.0, 6.0]))
        keep = int(np.count_nonzero(~(z < np.float32(thr))))
        got = zscore_sort_prefix_indices(z, thr)
        want = zscore_sort_indices(z)
        m = min(keep + 1, n)
        np.testing.assert_array_equal(got[:m], want[:m])


def test_device_count_w10_random():
    """Production pattern lengths: the device counter at W=10 (4**10
    table) against the reference scan (round-1 verdict: device-count
    unit tests stopped at W=6)."""
    rng = np.random.default_rng(11)
    seqs = [
        rng.integers(0, 5, size=rng.integers(12, 120)).astype(np.uint8)
        for _ in range(9)
    ]
    for both in (True, False):
        want, want_ltot = reference_count(seqs, 10, both)
        got, got_ltot = count_patterns(jnp.asarray(pad(seqs)), 10, both)
        assert int(got_ltot) == want_ltot
        np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)
