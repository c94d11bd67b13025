"""Profile the flat-plate implicit RANS step on the TPU; print top device ops.

Usage: python scripts/profile_fp.py [outdir] [iters]
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

_FP = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/su2_trace_fp"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    cfg = Config(os.path.join(_FP, "my_turbulent_flatplate_air.cfg"))
    sim = Simulation(cfg, dtype=jnp.float32)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    ignites = jnp.zeros((iters,), bool)

    def advance(state):
        carry, _ = sim.rans_multistep(*state, ignites)
        return carry

    state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
    t0 = time.time()
    state = advance(state)
    jax.block_until_ready(state[0])
    print(f"compile+first chunk: {time.time()-t0:.1f}s")
    t0 = time.time()
    state = advance(state)
    jax.block_until_ready(state[0])
    dt = time.time() - t0
    print(f"steady chunk: {dt*1e3:.2f} ms total, {dt*1e3/iters:.3f} ms/iter")

    with jax.profiler.trace(outdir):
        state = advance(state)
        jax.block_until_ready(state[0])

    fs = sorted(glob.glob(f"{outdir}/**/*.trace.json.gz", recursive=True),
                key=os.path.getmtime)
    if not fs:
        print("no trace")
        return
    with gzip.open(fs[-1], "rt") as f:
        tr = json.load(f)
    pidname = {}
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidname[e["pid"]] = e["args"].get("name", "")
    dev = {p for p, n in pidname.items() if "TPU" in n or "/device" in n}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
            total += e["dur"]
    print(f"total device time: {total/1e3:.2f} ms over {iters} iters "
          f"({total/1e3/iters:.3f} ms/iter)")
    for name, dur in agg.most_common(50):
        print(f"{dur/1e3/iters:9.4f} ms/iter {100*dur/total:5.1f}% "
              f"x{cnt[name]//iters:<4d} {name[:100]}")


if __name__ == "__main__":
    main()
