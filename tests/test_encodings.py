"""Encoding unit tests mirroring the reference gtest suite
(reference: test/test_base_pattern.cpp) plus brute-force checks of the
tensor-layout machinery."""

import numpy as np

import conftest  # noqa: F401

import jax.numpy as jnp

from peng_motif_tpu import alphabets as al
from peng_motif_tpu.ops import encoding


def test_kmer_extension_right():
    # reference: test_base_pattern.cpp:38-50
    pattern_ct = 1 + 3 * 4
    pattern_ctg = 1 + 3 * 4 + 2 * 16
    pattern_ctga = 1 + 3 * 4 + 2 * 16 + 0 * 64
    assert pattern_ct + 2 * (4 ** 2) == pattern_ctg
    assert pattern_ctg + 0 * (4 ** 3) == pattern_ctga
    assert al.string_to_base_id("CTGA") == pattern_ctga


def test_reverse_complement_id():
    # reference: test_base_pattern.cpp:52-68
    pattern_ctga = al.string_to_base_id("CTGA")
    pattern_tcag = al.string_to_base_id("TCAG")
    assert al.base_revcomp_id(pattern_ctga, 4) == pattern_tcag


def test_bg_kmer_conversion():
    # reference: test_base_pattern.cpp:70-79
    pattern_ctga = al.string_to_base_id("CTGA")
    assert al.bg_id_from_base_id(pattern_ctga, 4, 2) == 3 * 16 + 2 * 4 + 0


def test_nucleotide_at():
    # reference: test_base_pattern.cpp:120-131
    pattern_ctaa = al.string_to_base_id("CTAA")
    digits = al.base_id_to_digits(pattern_ctaa, 4)
    assert digits[0] == 1 and digits[3] == 0


def test_iupac_round_trip():
    pid = al.string_to_iupac_id("CTRA")
    assert al.iupac_id_to_string(pid, 4) == "CTRA"
    assert pid == 1 + 3 * 11 + 6 * 121 + 0 * 1331
    base_ctga = al.string_to_base_id("CTGA")
    assert al.base_id_to_iupac_id(base_ctga, 4) == al.string_to_iupac_id("CTGA")


def test_rc_permute_matches_scalar_revcomp():
    W = 5
    n = 4 ** W
    table = np.arange(n, dtype=np.int32)
    permuted = np.asarray(
        encoding.rc_permute(encoding.to_tensor(jnp.asarray(table), W))
    ).reshape(-1)
    for pid in [0, 1, 5, 100, n - 1, 777]:
        assert permuted[pid] == al.base_revcomp_id(pid, W)


def test_canonical_mask():
    W = 4
    mask = np.asarray(encoding.canonical_mask(W)).reshape(-1)
    for pid in range(4 ** W):
        assert mask[pid] == (pid <= al.base_revcomp_id(pid, W))


def test_window_ids_brute_force():
    rng = np.random.default_rng(0)
    W = 4
    codes = rng.integers(0, 5, size=(3, 20)).astype(np.uint8)  # incl. Ns
    fwd, rc, valid = encoding.window_ids(jnp.asarray(codes), W)
    fwd, rc, valid = map(np.asarray, (fwd, rc, valid))
    for s in range(3):
        for i in range(20 - W + 1):
            window = codes[s, i : i + W]
            expect_valid = bool((window > 0).all())
            assert valid[s, i] == expect_valid
            if expect_valid:
                pid = al.digits_to_base_id(window.astype(int) - 1)
                assert fwd[s, i] == pid
                assert rc[s, i] == al.base_revcomp_id(pid, W)
