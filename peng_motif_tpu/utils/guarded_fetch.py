"""Hang-guarded device fetches: the whole-run no-hang contract.

The first-touch watchdog (engine_tpu._backend_responsive) only guards
the transition INTO the device engine; a tunnel that dies mid-run would
still hang the later blocking fetches (`jax.device_get`,
``fetch_packed``) forever.  The reference binary (src/main.cpp) can
never hang, so neither may we: every blocking fetch on a remote
backend runs in a worker thread with a deadline.  On expiry the relay
is probed — a healthy relay (the tunnel's periodic minutes-long stall
phases, BASELINE.md) extends the wait; a dead relay raises
:class:`FetchTimeout`, which the engine converts to EngineFallback and
the pipeline reruns the exact host engine.

The timed-out worker thread is daemonic and leaks (there is no way to
cancel a wedged transfer), but the process stays responsive and the
exact rerun needs no device.
"""

from __future__ import annotations

import os
import threading


class FetchTimeout(RuntimeError):
    """A blocking device fetch exceeded its deadline with a dead relay."""


def _needs_guard() -> bool:
    from ..engine_tpu import _probe_needed  # noqa: PLC0415

    return _probe_needed()


def guarded_call(fn, *args, what: str = "fetch"):
    """Run ``fn(*args)`` (a blocking fetch) under the hang guard.

    Deadline: ``PENG_FETCH_TIMEOUT`` seconds per wait round (default
    180; 0 disables the guard).  After each expired round the relay is
    probed (engine_tpu._relay_http_ok): alive -> keep waiting (a stall
    phase, the transfer will finish), dead -> FetchTimeout.  At most
    ``PENG_FETCH_MAX_ROUNDS`` rounds (default 10) so even an undying
    relay with a wedged transfer eventually falls back.
    """
    timeout = float(os.environ.get("PENG_FETCH_TIMEOUT", "180"))
    if timeout <= 0 or not _needs_guard():
        return fn(*args)

    from ..engine_tpu import _relay_http_ok  # noqa: PLC0415

    result: list = []
    error: list = []

    def run():
        try:
            result.append(fn(*args))
        except BaseException as e:  # noqa: BLE001 - reraised below
            error.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    rounds = int(os.environ.get("PENG_FETCH_MAX_ROUNDS", "10"))
    for _ in range(rounds):
        t.join(timeout)
        if not t.is_alive():
            if error:
                raise error[0]
            return result[0]
        if not (_relay_http_ok(10.0) or _relay_http_ok(10.0)):
            raise FetchTimeout(
                f"device {what} exceeded {timeout:.0f}s with a dead relay")
    raise FetchTimeout(
        f"device {what} wedged past {rounds} x {timeout:.0f}s rounds")


def guarded_get(tree, what: str = "fetch"):
    """Hang-guarded ``jax.device_get``."""
    import jax  # noqa: PLC0415

    return guarded_call(jax.device_get, tree, what=what)
