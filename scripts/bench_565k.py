"""565k-cell tier perf canary (round-5 verdict item 4): the scaling-tier
counterpart of bench.py — all the round-4/5 perf work (tiled kernels,
gradient rows, windowed edge) lives on tiers the 9k canary cannot see.

Runs the coupled REACTIVE_RANS step on the refine_full^3 combustion mesh
(565,409 nodes, mesh-as-arguments tier + tiled/windowed pallas kernels)
in 100-iteration device chunks and prints ONE JSON line; compares against
BENCH_EXPECT.json["tpu_565k"] with the same >20% regression rule.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"
EXPECT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH_EXPECT.json")
REGRESSION_TOL = 1.20
CHUNK = 100
N_CHUNKS = 3


def main():
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full

    platform = jax.devices()[0].platform
    cfg = Config(os.path.join(_COMBUSTION,
                              "my_combustion_second_chem_PaSR.cfg"),
                 overrides={"RESTART_SOL": "NO"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))
    for _ in range(3):
        raw, _, _ = refine_full(raw)
    sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=raw)
    q0, mu_t0, gk0, sk0 = sim.initial_turb_state()
    ig = jnp.zeros((CHUNK,), bool)

    def advance(state):
        carry, _ = sim.rans_multistep(*state, ig)
        return carry

    state = (sim.u0, sim.t0, q0, mu_t0, gk0, sk0)
    state = advance(state)
    jax.block_until_ready(state[0])
    times = []
    for _ in range(N_CHUNKS):
        t0 = time.time()
        state = advance(state)
        jax.block_until_ready(state[0])
        times.append(time.time() - t0)
    dt = min(times)
    n = sim.u0.shape[0]
    result = {
        "metric": "Mcell-updates/sec/chip (565k coupled reactive-RANS)",
        "value": round(n * CHUNK / dt / 1e6, 3),
        "unit": "Mcell/s",
        "platform": platform,
        "ncells": int(n),
        "ms_per_iter": round(dt / CHUNK * 1e3, 3),
        "chunk_ms_per_iter": [round(t / CHUNK * 1e3, 3) for t in times],
    }
    try:
        with open(EXPECT_PATH) as f:
            expect = json.load(f).get("tpu_565k")
    except (OSError, json.JSONDecodeError):
        expect = None
    if expect is not None:
        result["expected_ms_per_iter"] = expect["ms_per_iter"]
        if result["ms_per_iter"] > expect["ms_per_iter"] * REGRESSION_TOL:
            result["regression"] = True
            print(f"PERF REGRESSION (565k tier): {result['ms_per_iter']} "
                  f"vs recorded {expect['ms_per_iter']} ms/iter",
                  file=sys.stderr)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
