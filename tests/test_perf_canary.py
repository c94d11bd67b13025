"""Perf canary: fail loudly when the flagship-step throughput regresses.

Round-2 postmortem: a one-line adjoint guard in ops/viscous.py shipped a 3x
single-chip slowdown (21.7 -> 7.4 Mcell/s) that no test caught.  This test
runs the real bench (bench.py, the production rans_multistep path) and fails
if ms/iter degrades >20% vs the recorded BENCH_EXPECT.json number.

Requires a real TPU (perf on the CPU-emulated mesh is meaningless for the
canary); skipped otherwise, so the fast CPU tier is unaffected.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_available():
    # tests/conftest.py pins this process to CPU; probe a fresh process.
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True, env={k: v for k, v in os.environ.items()
                                             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        timeout=120)
    return probe.returncode == 0 and probe.stdout.strip() in ("tpu", "axon")


@pytest.mark.tpu
@pytest.mark.slow
def test_flagship_step_perf_canary():
    if not _tpu_available():
        pytest.skip("no TPU attached")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert not result.get("regression"), (
        f"perf regression: {result['ms_per_iter']} ms/iter vs expected "
        f"{result.get('expected_ms_per_iter')} — bisect before shipping "
        f"(see BENCH_EXPECT.json)")


@pytest.mark.tpu
@pytest.mark.slow
def test_565k_tier_perf_canary():
    """Scaling-tier canary (round-5 verdict item 4): the tiled/windowed
    kernels live on tiers the 9k canary cannot see — a regression in the
    565k tier trips this (scripts/bench_565k.py vs
    BENCH_EXPECT.json["tpu_565k"], same >20% rule)."""
    if not _tpu_available():
        pytest.skip("no TPU attached")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "bench_565k.py")],
        capture_output=True, text=True, env=env, timeout=2400)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert not result.get("regression"), (
        f"565k perf regression: {result['ms_per_iter']} ms/iter vs "
        f"expected {result.get('expected_ms_per_iter')}")
