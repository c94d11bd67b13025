"""f64 precision-tier validation (SU2_TPU_DTYPE=float64, driver.py main).

The high-precision tier runs the same solver in float64 — XLA-emulated on
TPU (double-double class arithmetic), native on CPU.  Round-3 measurement:
the TPU-f64 and CPU-f64 flat-plate trajectories agree to ALL printed digits
for 300 iterations (BASELINE.md round-3 f64 section), at ~0.83 s/iter on
chip (~300x the f32 tier's 2.8 ms/iter — the price of emulated doubles).

The fast CPU test pins the tier-selection path and the first iterations of
the trajectory; the tpu-marked variant reruns the same pin on the chip.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FP = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"

# CPU f64 == TPU f64 to all printed digits (round-3 measured, 300 iters)
PIN = [(-0.717058, 4.711371), (-1.084115, 4.360329), (-1.257062, 4.196973)]


def _run_cli(platform_env, niter=3):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env.update({"PYTHONPATH": ROOT, "SU2_TPU_DTYPE": "float64",
                "SU2_TPU_CHUNK": "1", **platform_env})
    out = subprocess.run(
        [sys.executable, "-m", "su2_tpu",
         os.path.join(FP, "my_turbulent_flatplate_air.cfg"), str(niter)],
        capture_output=True, text=True, env=env, timeout=1500,
        cwd=None)
    assert out.returncode == 0, out.stderr[-2000:]
    rows = []
    for line in out.stdout.splitlines():
        parts = line.split()
        if len(parts) > 4 and parts[1] == "Res[Rho]:":
            rows.append((float(parts[2]), float(parts[4])))
    return rows


def test_f64_tier_cpu_trajectory(tmp_path):
    os.chdir(tmp_path)
    rows = _run_cli({"JAX_PLATFORMS": "cpu", "SU2_TPU_PLATFORM": "cpu"})
    assert len(rows) >= 3
    for (r, e), (pr, pe) in zip(rows, PIN):
        assert r == pytest.approx(pr, abs=1e-6)
        assert e == pytest.approx(pe, abs=1e-6)


@pytest.mark.tpu
@pytest.mark.slow
def test_f64_tier_tpu_trajectory(tmp_path):
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}, timeout=120)
    if probe.returncode or probe.stdout.strip() not in ("tpu", "axon"):
        pytest.skip("no TPU attached")
    os.chdir(tmp_path)
    rows = _run_cli({"JAX_PLATFORMS": ""})
    assert len(rows) >= 3
    for (r, e), (pr, pe) in zip(rows, PIN):
        assert r == pytest.approx(pr, abs=1e-6)
        assert e == pytest.approx(pe, abs=1e-6)
