"""ThreadSanitizer leg for the native thread pools (round-2 verdict
next #9).  Builds pengnative.cpp + the stress driver with
-fsanitize=thread and fails on any reported race (TSan exit code)."""

import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "peng_motif_tpu", "native")


@pytest.mark.slow
def test_thread_pools_race_free(tmp_path):
    gxx = shutil.which("g++")
    if gxx is None:
        pytest.skip("no g++ toolchain")
    exe = str(tmp_path / "tsan_driver")
    build = subprocess.run(
        [gxx, "-fsanitize=thread", "-O1", "-g", "-std=c++17",
         "-ffp-contract=off",
         os.path.join(NATIVE, "pengnative.cpp"),
         os.path.join(NATIVE, "tsan_driver.cpp"),
         "-o", exe, "-lpthread"],
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr[-2000:]
    env = dict(os.environ)
    env["TSAN_OPTIONS"] = "exitcode=66 halt_on_error=1"
    run = subprocess.run([exe], capture_output=True, text=True,
                         timeout=600, env=env)
    assert run.returncode == 0, (run.stdout + run.stderr)[-4000:]
    assert "tsan driver done" in run.stdout
