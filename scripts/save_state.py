"""Save a post-transient state snapshot for kernel micro-benches.

Usage: python scripts/save_state.py [levels] [out.npz]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_COMBUSTION = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"


def main():
    levels = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/state_l{levels}.npz"
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.adapt import refine_full

    cfg = Config(os.path.join(_COMBUSTION,
                              "my_combustion_second_chem_PaSR.cfg"),
                 overrides={"RESTART_SOL": "NO"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))
    for _ in range(levels):
        raw, _, _ = refine_full(raw)

    sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=raw)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    ignites = jnp.zeros((10,), bool)
    state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
    state, _ = sim.rans_multistep(*state, ignites)
    jax.block_until_ready(state[0])
    np.savez(out, u=np.asarray(state[0]), t=np.asarray(state[1]),
             q=np.asarray(state[2]), mu_t=np.asarray(state[3]),
             grad_k=np.asarray(state[4]), sigma_k=np.asarray(state[5]))
    print("saved", out, state[0].shape)


if __name__ == "__main__":
    main()
