"""Multi-host smoke test: a 2-process local launcher drives the full
CLI over jax.distributed (CPU backend, 2 virtual devices per process);
process 0's MEME output must be byte-identical to the single-process
golden (round-2 verdict next #7)."""

import os
import socket
import subprocess
import sys

import pytest

from conftest import GOLDEN_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_byte_identical(tmp_path):
    port = _free_port()
    out0 = str(tmp_path / "out0.meme")
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })

    def launch(pid):
        argv = [sys.executable, "-m", "peng_motif_tpu",
                os.path.join(GOLDEN_DIR, "MafK_100seqs.fasta"), "-w", "8",
                "--num-processes", "2", "--process-id", str(pid),
                "--coordinator", f"localhost:{port}"]
        if pid == 0:
            argv += ["-o", out0]
        return subprocess.Popen(
            argv, env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE)

    procs = [launch(0), launch(1)]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err.decode()[-2000:]

    with open(out0, "rb") as f, \
            open(os.path.join(GOLDEN_DIR, "mafk100_w8.meme"), "rb") as g:
        assert f.read() == g.read()
