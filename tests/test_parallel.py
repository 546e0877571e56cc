"""Sharded counting must reproduce the single-device tables exactly
(per-shard dedup is exact; psum of integer tables is exact)."""

import numpy as np

import conftest  # noqa: F401

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from peng_motif_tpu.ops.counting import count_patterns
from peng_motif_tpu.parallel.sharded import count_patterns_sharded
from peng_motif_tpu.models.background import count_kmers
from peng_motif_tpu.parallel.sharded import count_bg_kmers_sharded


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), axis_names=("data",))


def test_sharded_counts_match_single_device():
    rng = np.random.default_rng(7)
    codes = rng.integers(0, 5, size=(21, 40)).astype(np.uint8)  # odd batch
    for W in (4, 6):
        for both in (True, False):
            want, want_ltot = count_patterns(jnp.asarray(codes), W, both)
            got, got_ltot = count_patterns_sharded(codes, W, both, _mesh(8))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            assert int(got_ltot) == int(want_ltot)


def test_sharded_bg_counts_match_host():
    rng = np.random.default_rng(8)
    seqs = [rng.integers(1, 5, size=rng.integers(5, 30)).astype(np.uint8)
            for _ in range(13)]
    want = count_kmers(seqs, 2)
    max_l = max(len(s) for s in seqs)
    codes = np.zeros((len(seqs), max_l), dtype=np.uint8)
    for i, s in enumerate(seqs):
        codes[i, : len(s)] = s
    lengths = np.array([len(s) for s in seqs], dtype=np.int32)
    got = count_bg_kmers_sharded(codes, 2, _mesh(4), lengths=lengths)
    for k in range(3):
        np.testing.assert_array_equal(got[k], want[k])


def test_graft_dryrun():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4 ** 6,)
    mod.dryrun_multichip(8)
