"""Profile one coupled step on a refine_full'd mesh and print top device ops.

Usage: python scripts/profile_scaled.py [levels] [outdir]
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/su2_trace_l{levels}"
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full

    cfg = Config(os.path.join(_COMBUSTION, "my_combustion_second_chem_PaSR.cfg"),
                 overrides={"RESTART_SOL": "NO"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))
    for _ in range(levels):
        raw, _, _ = refine_full(raw)

    sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=raw)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    ignites = jnp.zeros((10,), bool)

    def advance(state):
        carry, _ = sim.rans_multistep(*state, ignites)
        return carry

    state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
    state = advance(state)
    jax.block_until_ready(state[0])
    state = advance(state)
    jax.block_until_ready(state[0])

    with jax.profiler.trace(outdir):
        state = advance(state)          # 10 iterations
        jax.block_until_ready(state[0])

    fs = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True))
    with gzip.open(fs[-1]) as f:
        tr = json.load(f)
    pidname = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pidname.items() if "TPU" in n}
    dur = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            dur[e["name"]] += e["dur"]
    n = sim.u0.shape[0]
    print(f"nodes: {n}")
    for name, d in dur.most_common(35):
        print(f"{d/10/1e3:9.4f} ms/iter  {name}")


if __name__ == "__main__":
    main()
