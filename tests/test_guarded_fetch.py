"""Mid-run hang containment (utils/guarded_fetch.py): a wedged device
fetch with a dead relay must raise FetchTimeout (-> exact-engine
rerun), a slow fetch with a live relay must be waited out, and local
backends bypass the guard entirely."""

import time

import pytest

import peng_motif_tpu.utils.guarded_fetch as gf
from peng_motif_tpu.utils.guarded_fetch import (
    FetchTimeout,
    guarded_call,
    guarded_get,
)


def test_passthrough_when_not_needed(monkeypatch):
    # CPU-pinned test config: guard disarmed, fn runs inline
    monkeypatch.setenv("PENG_FETCH_TIMEOUT", "0.01")
    assert guarded_call(lambda: 42) == 42


def test_timeout_dead_relay(monkeypatch):
    monkeypatch.setenv("PENG_FETCH_TIMEOUT", "0.05")
    monkeypatch.setattr(gf, "_needs_guard", lambda: True)
    import peng_motif_tpu.engine_tpu as et

    monkeypatch.setattr(et, "_relay_http_ok", lambda t: False)
    with pytest.raises(FetchTimeout):
        guarded_call(lambda: time.sleep(30), what="test")


def test_slow_fetch_live_relay_waits(monkeypatch):
    monkeypatch.setenv("PENG_FETCH_TIMEOUT", "0.05")
    monkeypatch.setattr(gf, "_needs_guard", lambda: True)
    import peng_motif_tpu.engine_tpu as et

    monkeypatch.setattr(et, "_relay_http_ok", lambda t: True)

    def slow():
        time.sleep(0.2)  # several timeout rounds, relay alive
        return "done"

    assert guarded_call(slow) == "done"


def test_wedged_despite_live_relay_bounded(monkeypatch):
    monkeypatch.setenv("PENG_FETCH_TIMEOUT", "0.02")
    monkeypatch.setenv("PENG_FETCH_MAX_ROUNDS", "3")
    monkeypatch.setattr(gf, "_needs_guard", lambda: True)
    import peng_motif_tpu.engine_tpu as et

    monkeypatch.setattr(et, "_relay_http_ok", lambda t: True)
    t0 = time.perf_counter()
    with pytest.raises(FetchTimeout):
        guarded_call(lambda: time.sleep(30), what="test")
    assert time.perf_counter() - t0 < 5


def test_exception_propagates(monkeypatch):
    monkeypatch.setenv("PENG_FETCH_TIMEOUT", "5")
    monkeypatch.setattr(gf, "_needs_guard", lambda: True)

    def boom():
        raise ValueError("inner")

    with pytest.raises(ValueError, match="inner"):
        guarded_call(boom)


def test_guarded_get_roundtrip():
    import jax.numpy as jnp
    import numpy as np

    x = jnp.arange(5, dtype=jnp.int32)
    np.testing.assert_array_equal(guarded_get(x), np.arange(5))
