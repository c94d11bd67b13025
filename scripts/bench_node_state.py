"""Micro-bench the fused node-state kernel on a saved state snapshot.

Usage: python scripts/bench_node_state.py [levels] [TILExWIN ...]
e.g.   python scripts/bench_node_state.py 2 512x256 1024x256 512x128

Loads /tmp/state_l{levels}.npz (produced by scripts/save_state.py) so the
expensive multistep warmup is paid once, not per sweep run.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    combos = sys.argv[2:] or ["512x256", "1024x256", "512x128", "1024x128"]
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full
    from su2_tpu.pallas import node_state as nst

    cfg = Config(os.path.join(_COMBUSTION,
                              "my_combustion_second_chem_PaSR.cfg"),
                 overrides={"RESTART_SOL": "NO"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))
    for _ in range(levels):
        raw, _, _ = refine_full(raw)
    sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=raw)

    snap = np.load(f"/tmp/state_l{levels}.npz")
    u = jnp.asarray(snap["u"], jnp.float32)
    t_guess = jnp.asarray(snap["t"], jnp.float32)
    tke = jnp.asarray(snap["q"][:, 0], jnp.float32)
    lib, lay, tp = sim.lib, sim.lay, sim.tparams
    print(f"nodes: {u.shape[0]}", flush=True)

    for combo in combos:
        tile, win = (int(x) for x in combo.split("x"))
        nst._TILE = tile
        nst._WIN = win
        f = jax.jit(lambda u_, t_, k_: nst.node_state(
            lib, lay, tp, u_, t_, turb_ke=k_))
        r = f(u, t_guess, tke)
        jax.block_until_ready(r[0])
        n_it = 100
        t0c = time.perf_counter()
        for _ in range(n_it):
            r = f(u, t_guess, tke)
        jax.block_until_ready(r[0])
        dt = (time.perf_counter() - t0c) / n_it * 1e3
        # parity vs the default config is checked by the caller; here just
        # print a state checksum so config-sensitivity is visible
        chk = float(jnp.sum(r[1][:, lay.T].astype(jnp.float64)))
        f.clear_cache()
        print(f"  TILE={tile:5d} WIN={win:4d}: {dt:7.3f} ms/call"
              f"  sumT={chk:.6e}", flush=True)


if __name__ == "__main__":
    main()
