"""Benchmark: Mcell-updates/sec/chip on the shipped PaSR jet-combustor case.

Runs the flagship coupled REACTIVE_RANS step (reactive NS + SST + PaSR,
9 species / 13 flow vars + 2 turb vars, 9000-cell mesh) and reports throughput
as one JSON line.

The timed loop is the driver's on-device multi-step program
(Simulation.rans_multistep: lax.scan over K coupled iterations), i.e. the
same code path a production run uses — host dispatch is amortized across the
chunk exactly like run(chunk=K).

Baseline: the reference SU2_CFD binary was built from source and timed on
this exact case (serial, one core, restart-chained like combustion.sh):
8.6 s/iter = 0.00105 Mcell/s.  The fork's reactive files only compile
correctly at -O0 (any optimization level crashes with UB — see BASELINE.md),
so we charge ourselves a generous 3x allowance for the optimization the
reference could not use: baseline = 0.0032 Mcell/s per core.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Perf canary (round-2 postmortem: a one-line change shipped a 3x slowdown
# and nobody noticed).  BENCH_EXPECT.json pins the last recorded ms/iter per
# platform; a >20% degradation marks the output JSON with "regression": true
# and prints a loud stderr warning.  tests/test_perf_canary.py fails on it
# when a real TPU is attached.
EXPECT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_EXPECT.json")
REGRESSION_TOL = 1.20

CPU_CORE_BASELINE_MCELLS = 0.0032  # measured 0.00105 at -O0, x3 allowance
# 1000-iteration device chunks: the tunneled TPU pays several ms dispatch
# latency per call, so short chunks measure the tunnel, not the solver
# (production runs use run(chunk=K) exactly like this — the full shipped
# campaign in scripts/full_campaign.py runs 1000-iteration chunks)
CHUNK = 1000
# several chunks, best-chunk reported: a single ~0.4 s sample has ~2%
# run-to-run variance (advisor round-1 finding); the best of 3 is
# reproducible within noise
N_CHUNKS = 3


def main():
    import __graft_entry__ as g

    platform = jax.devices()[0].platform
    sim = g._flagship_sim(jnp.float32 if platform == "tpu" else jnp.float64)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    ignites = jnp.zeros((CHUNK,), bool)

    def advance(state):
        carry, _ = sim.rans_multistep(*state, ignites)
        return carry

    state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
    state = advance(state)          # compile
    jax.block_until_ready(state[0])
    state = advance(state)          # warm caches, steady-state data flow
    jax.block_until_ready(state[0])

    chunk_times = []
    for _ in range(N_CHUNKS):
        t0 = time.time()
        state = advance(state)
        jax.block_until_ready(state[0])
        chunk_times.append(time.time() - t0)
    dt = min(chunk_times)

    ncells = int(sim.u0.shape[0])
    mcells = ncells * CHUNK / dt / 1e6
    result = {
        "metric": "Mcell-updates/sec/chip (coupled reactive-RANS step)",
        "value": round(mcells, 4),
        "unit": "Mcell/s",
        "vs_baseline": round(mcells / CPU_CORE_BASELINE_MCELLS, 2),
        "platform": platform,
        "ncells": ncells,
        "ms_per_iter": round(dt / CHUNK * 1e3, 3),
        "chunk_ms_per_iter": [round(t / CHUNK * 1e3, 3) for t in chunk_times],
    }

    try:
        with open(EXPECT_PATH) as f:
            expect = json.load(f).get(platform)
    except (OSError, json.JSONDecodeError):
        expect = None
    if expect is not None:
        exp_ms = expect["ms_per_iter"]
        result["expected_ms_per_iter"] = exp_ms
        if result["ms_per_iter"] > exp_ms * REGRESSION_TOL:
            result["regression"] = True
            print(
                f"PERF REGRESSION: {result['ms_per_iter']} ms/iter vs "
                f"recorded {exp_ms} ms/iter on {platform} "
                f"(>{int((REGRESSION_TOL - 1) * 100)}% slower). Bisect before "
                "shipping; update BENCH_EXPECT.json only for a justified "
                "capability trade.", file=sys.stderr)

    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
