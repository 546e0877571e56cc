"""End-to-end benchmark on the BASELINE.md configurations.

Headline: full motif discovery on MafK.fasta at the reference's default
configuration (-w 10, both strands) — the BASELINE.json metric
("wall-clock to .meme on MafK.fasta").  Reference C++ single-core:
15.6 s for 1.025 Mbases (BASELINE.md).  Output byte-parity vs the
reference binary is verified before reporting.

Also measured (reported in "extra"): the w=8 configuration (reference:
0.59 s) and raw counting throughput on a ChIP-seq-scale batch
(~50 Mbases), the input-bound phase that dominates large corpora.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The first run warms the per-process backend + compilation caches; the
measured runs reflect production steady state.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MBASES = 1.025
BASELINE_W10_S = 15.6     # BASELINE.md: MafK.fasta, default -w 10
BASELINE_W8_S = 0.59      # BASELINE.md: MafK.fasta, -w 8
BASELINE_MBASES_PER_S = MBASES / BASELINE_W10_S
DATA = os.path.join(REPO, "tests", "golden", "MafK.fasta")
GOLDEN_W10 = os.path.join(REPO, "tests", "golden", "mafk_w10.meme")
GOLDEN_W8 = os.path.join(REPO, "tests", "golden", "mafk_w8.meme")


def run_once(out_path, w):
    import contextlib
    import io

    from peng_motif_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([DATA, "-w", str(w), "-o", out_path])
    assert rc == 0
    return out_path


def _backend_alive(timeout_s: float = 150.0, attempts: int = 2) -> bool:
    """Probe the default backend in a subprocess under a timeout (the
    tunneled TPU backend can wedge; a hung bench is worse than a CPU
    bench).  Out-of-process so this process's jax can still fall back.
    Retried once: a single transient tunnel stall should not demote an
    otherwise healthy device benchmark to the CPU fallback."""
    import subprocess

    for _ in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "jnp.ones((8,8)).sum().block_until_ready();print('ok')"],
                capture_output=True, timeout=timeout_s, text=True,
            )
            if "ok" in r.stdout:
                return True
        except Exception:
            pass
    return False


def _best_of(n, fn):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _counting_throughput_mbases_s():
    """Raw device counting throughput (w=8, both strands) on a
    ~50 Mbase synthetic batch, including host->device transfer and
    table fetch — the phase that scales with corpus size."""
    import numpy as np

    from peng_motif_tpu.ops.counting import CountJob

    rng = np.random.default_rng(0)
    codes = rng.integers(1, 5, size=(200_000, 256)).astype(np.uint8)
    mb = codes.size / 1e6
    CountJob(codes, 8, True).finish()  # warm (compile + backend first-run)
    t0 = time.perf_counter()
    counts_np, ltot = CountJob(codes, 8, True).finish()
    dt = time.perf_counter() - t0
    return mb / dt


def main():
    out = "/tmp/peng_bench_out.meme"

    backend = "default"
    if not _backend_alive():
        import jax

        jax.config.update("jax_platforms", "cpu")
        backend = "cpu-fallback"

    # warmup: per-process backend spin-up + compilation caches
    t0 = time.perf_counter()
    run_once(out, 10)
    warm = time.perf_counter() - t0

    best_w10 = _best_of(3, lambda: run_once(out, 10))
    with open(out, "rb") as f, open(GOLDEN_W10, "rb") as g:
        identical_w10 = f.read() == g.read()

    run_once(out, 8)  # warm w8 shapes
    best_w8 = _best_of(3, lambda: run_once(out, 8))
    with open(out, "rb") as f, open(GOLDEN_W8, "rb") as g:
        identical_w8 = f.read() == g.read()

    try:
        counting_mbs = round(_counting_throughput_mbases_s(), 1)
    except Exception:
        counting_mbs = None

    value = MBASES / best_w10
    print(
        json.dumps(
            {
                "metric": "mafk_default_w10_throughput",
                "value": round(value, 3),
                "unit": "Mbases/s",
                "vs_baseline": round(value / BASELINE_MBASES_PER_S, 2),
                "extra": {
                    "w10_wall_s": round(best_w10, 3),
                    "w10_byte_identical": identical_w10,
                    "w8_wall_s": round(best_w8, 3),
                    "w8_vs_baseline": round(BASELINE_W8_S / best_w8, 2),
                    "w8_byte_identical": identical_w8,
                    "counting_throughput_mbases_s": counting_mbs,
                    "warmup_wall_s": round(warm, 3),
                    "backend": backend,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
