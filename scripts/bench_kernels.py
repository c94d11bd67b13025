"""Micro-bench the fused node-state and edge kernels on a saved snapshot.

Usage: python scripts/bench_kernels.py [levels] [NTILExWINxETILE ...]
e.g.   python scripts/bench_kernels.py 2 512x256x512 1024x128x1024

Loads /tmp/state_l{levels}.npz (see scripts/save_state.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"


def timeit(f, *args):
    r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    n_it = 100
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = f(*args)
    jax.block_until_ready(jax.tree.leaves(r)[0])
    return (time.perf_counter() - t0) / n_it * 1e3, r


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    combos = sys.argv[2:] or ["512x256x512", "1024x256x512", "512x128x512",
                              "1024x128x512", "512x256x1024",
                              "1024x128x1024"]
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full
    from su2_tpu.pallas import node_state as nst
    from su2_tpu.pallas import edge_fused
    from su2_tpu.solvers import ns as ns_mod
    from su2_tpu.ops import viscous as vis
    from su2_tpu.solvers import euler as es

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
    q = jnp.asarray(snap["q"], jnp.float32)
    mu_t = jnp.asarray(snap["mu_t"], jnp.float32)
    grad_k = jnp.asarray(snap["grad_k"], jnp.float32)
    sigma_k = jnp.asarray(snap["sigma_k"], jnp.float32)
    tke = q[:, 0]
    lib, lay, tp = sim.lib, sim.lay, sim.tparams
    mesh, prm = sim.mesh, sim.params
    print(f"nodes: {u.shape[0]}", flush=True)

    # fixed realistic inputs for the edge kernel (default node-state config)
    r0 = nst.node_state(lib, lay, tp, u, t_guess, turb_ke=tke)
    v = r0[1]
    qg = vis.ns_gradient_vars(lib, lay, v, xs=r0[7])
    grad = es.compute_gradients(mesh, prm, qg)
    trans = vis.Transport(mu=r0[5], kappa=r0[6], dij=None)
    turb = vis.TurbFlowData(tke=tke, mu_t=mu_t, grad_tke=grad_k,
                            sigma_k=sigma_k)
    dpdu_e = r0[4][:, lay.RHOE]
    jax.block_until_ready(v)

    for combo in combos:
        ntile, win, etile = (int(x) for x in combo.split("x"))
        nst._TILE = ntile
        nst._WIN = win
        edge_fused._TILE = etile

        fn = jax.jit(lambda u_, t_, k_: nst.node_state(
            lib, lay, tp, u_, t_, turb_ke=k_))
        dt_n, rn = timeit(fn, u, t_guess, tke)
        chk = float(jnp.sum(rn[1][:, lay.T].astype(jnp.float64)))
        fn.clear_cache()

        fe = jax.jit(lambda v_, g_: edge_fused.fused_interior_terms(
            lib, lay, mesh, prm, v_, g_, trans, turb, sigma_k, dpdu_e))
        dt_e, re = timeit(fe, v, grad)
        chke = float(jnp.sum(jnp.abs(re[0]).astype(jnp.float64)))
        fe.clear_cache()

        print(f"  NTILE={ntile:5d} WIN={win:4d} ETILE={etile:5d}: "
              f"node {dt_n:7.3f} ms  edge(x{len(mesh.fam_offsets)}) "
              f"{dt_e:7.3f} ms   sumT={chk:.8e} sumR={chke:.6e}",
              flush=True)


if __name__ == "__main__":
    main()
