"""Single-round-trip packed fetch must be bit-exact for every dtype
the engine ships home (utils/packed_fetch.py)."""

import numpy as np
import jax.numpy as jnp

from peng_motif_tpu.utils.packed_fetch import fetch_packed


def test_roundtrip_all_dtypes():
    rng = np.random.default_rng(0)
    tree = {
        "f32": jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32)),
        "f64": jnp.asarray(rng.standard_normal((2, 7))),
        "i32": jnp.asarray(rng.integers(-2**31, 2**31, size=11,
                                        dtype=np.int32)),
        "i64": jnp.asarray(rng.integers(-2**62, 2**62, size=4,
                                        dtype=np.int64)),
        "u32": jnp.asarray(rng.integers(0, 2**32, size=6,
                                        dtype=np.uint32)),
        "bool": jnp.asarray(rng.random(9) < 0.5),
        "i8": jnp.asarray(rng.integers(-128, 128, size=13, dtype=np.int8)),
        "u8": jnp.asarray(rng.integers(0, 256, size=10, dtype=np.uint8)),
        "i16": jnp.asarray(rng.integers(-2**15, 2**15, size=7,
                                        dtype=np.int16)),
        "u16": jnp.asarray(rng.integers(0, 2**16, size=5,
                                        dtype=np.uint16)),
        "scalar_i": jnp.int32(-7),
        "scalar_f": jnp.float32(3.25),
        "special": jnp.asarray(np.array(
            [np.nan, np.inf, -np.inf, -0.0, 1e-45], dtype=np.float32)),
    }
    got = fetch_packed(tree)
    for k, v in tree.items():
        want = np.asarray(v)
        np.testing.assert_array_equal(
            np.atleast_1d(got[k]).view(np.uint8),
            np.atleast_1d(want).view(np.uint8),
            err_msg=k)  # bitwise, so NaN payloads count too
        assert got[k].dtype == want.dtype, k
        assert got[k].shape == want.shape, k
