"""Mesh-size scaling of the coupled REACTIVE_RANS step on one TPU chip.

Refines the shipped 9k-cell PaSR combustor mesh (refine_full: each tri/quad
splits in 4) and times the full coupled step at each size.  Usage:

    python scripts/scaling_bench.py [max_levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    min_level = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full

    cfg = Config(os.path.join(_COMBUSTION, "my_combustion_second_chem_PaSR.cfg"),
                 overrides={"RESTART_SOL": "NO"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))

    meshes = [raw]
    for _ in range(levels):
        r, _, _ = refine_full(meshes[-1])
        meshes.append(r)

    for rawm in meshes[min_level:]:
        t_setup = time.time()
        sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=rawm)
        print(f"setup({rawm.npoint}): {time.time()-t_setup:.1f}s",
              flush=True)
        q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
        ignites = jnp.zeros((10,), bool)

        def advance(state):
            carry, _ = sim.rans_multistep(*state, ignites)
            return carry

        state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
        state = advance(state)
        jax.block_until_ready(state[0])
        n_iter = 100
        t0 = time.time()
        for _ in range(n_iter // 10):
            state = advance(state)
        jax.block_until_ready(state[0])
        dt = (time.time() - t0) / n_iter
        n = sim.u0.shape[0]
        print(f"| {n:7d} | {dt*1e3:7.2f} ms/iter | {n/dt/1e6:6.3f} Mcell/s |",
              flush=True)


if __name__ == "__main__":
    main()
