"""peng_motif_tpu: TPU-native de-novo DNA motif discovery.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
soedinglab/PEnG-motif, designed table-first for TPU: the 4**W pattern
table is a rank-W tensor, reverse complements are layout transforms,
IUPAC aggregation is a separable mask contraction, and EM is a batched
broadcast/reduce pipeline.
"""

__version__ = "1.0.0"

import os as _os


def _enable_compilation_cache():
    """Persist XLA compilations across processes.  On the tunneled TPU
    backend a cold compile costs tens of seconds; the cache makes every
    CLI invocation after the first start hot."""
    try:
        import jax  # noqa: PLC0415

        # the environment's sitecustomize force-registers the tunneled
        # TPU plugin in every process, which ignores the JAX_PLATFORMS
        # env var; mirror it into the config so users can still select
        # a backend the standard way (e.g. JAX_PLATFORMS=cpu)
        _plat = _os.environ.get("JAX_PLATFORMS")
        if _plat:
            jax.config.update("jax_platforms", _plat)

        # the device score math mirrors the reference's C++ promotion
        # points (float storage, double transcendentals — see
        # utils/numerics.py); the double side needs x64 enabled.  All
        # device code in this package pins dtypes explicitly, so the
        # wider defaults do not change any table layouts.
        jax.config.update("jax_enable_x64", True)

        # tunneled backends (axon): compiles run server-side, so the
        # local persistent cache cannot capture them and its executable
        # serialization measurably stalls the relay — skip unless the
        # user opts in with an explicit cache dir
        if ("axon" in (_plat or "")
                and "PENG_JAX_CACHE_DIR" not in _os.environ):
            return
        cache_dir = _os.environ.get(
            "PENG_JAX_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "peng_motif_tpu"),
        )
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


_enable_compilation_cache()
