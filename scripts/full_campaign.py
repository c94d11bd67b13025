"""Run the ENTIRE shipped combustion campaign end-to-end on one TPU chip.

The reference workflow (combustion.sh) is: SU2_CFD my_combustion_no_chem.cfg
(EXT_ITER= 1,400,000 explicit coupled iterations from freestream), then
SU2_CFD my_combustion_second_chem_PaSR.cfg (EXT_ITER= 50,000, restart-chained
from the no-chem solution).  At the measured reference rate (6.6-8.6 s/iter
on one core at -O0, the only optimization level the fork survives) that is
months of compute; this script runs the whole campaign in minutes.

Usage: python scripts/full_campaign.py [workdir] [nochem_iters] [pasr_iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_CASE = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"
CHUNK = 1000


def run_phase(sim, n_iter, ignition_iter=None, label=""):
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
    t0 = time.time()
    it = 0
    last = None
    while it < n_iter:
        k = min(CHUNK, n_iter - it)
        if ignition_iter is None:
            ign = jnp.zeros((k,), bool)
        else:
            ign = jnp.asarray((np.arange(it, it + k) < ignition_iter))
        state, ys = sim.rans_multistep(*state, ign)
        it += k
        if it % 100000 == 0 or it == n_iter:
            jax.block_until_ready(state[0])
            rms = np.log10(np.maximum(np.asarray(ys[0][-1]), 1e-300))
            nerr = int(np.asarray(ys[3][-1]))
            dt = time.time() - t0
            print(f"[{label}] iter {it:8d}  Res[Rho] {rms[0]: .4f}  "
                  f"Res[RhoE] {rms[sim.lay.RHOE]: .4f}  nonphys {nerr}  "
                  f"({dt:.0f}s, {it/dt/1e3:.1f} kiter/s)", flush=True)
            last = (rms, nerr)
    return state, last, time.time() - t0


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign"
    n1 = int(sys.argv[2]) if len(sys.argv) > 2 else 1_400_000
    n2 = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    wall0 = time.time()
    # ---- phase 1: no-chem from freestream ----
    cfg1 = Config(os.path.join(_CASE, "my_combustion_no_chem.cfg"))
    sim1 = Simulation(cfg1, dtype=jnp.float32)
    state, last, t1 = run_phase(sim1, n1, label="no-chem")
    u, tg, q, mu_t, grad_k, sigma_k = state
    sim1.enable_output()
    sim1.write_solution(u, tg, (q, mu_t))
    print(f"no-chem done: {n1} iters in {t1:.0f}s "
          f"({n1 * 9000 / t1 / 1e6:.1f} Mcell/s sustained)", flush=True)

    # ---- phase 2: PaSR chemistry, restart-chained ----
    cfg2 = Config(os.path.join(_CASE, "my_combustion_second_chem_PaSR.cfg"))
    sim2 = Simulation(cfg2, dtype=jnp.float32)
    state2, last2, t2 = run_phase(
        sim2, n2, ignition_iter=cfg2.ignition_iter if cfg2.ignition else None,
        label="PaSR")
    u2, tg2, q2, mu_t2, _, _ = state2
    sim2.enable_output()
    sim2.write_solution(u2, tg2, (q2, mu_t2))
    print(f"PaSR done: {n2} iters in {t2:.0f}s", flush=True)

    # physical sanity of the final state
    import su2_tpu.state as st
    _, v2, nonphys = st.cons2prim(sim2.lib, sim2.lay, u2, tg2, sim2.tparams,
                                  turb_ke=q2[:, 0])
    tmax = float(v2[:, sim2.lay.T].max())
    tmin = float(v2[:, sim2.lay.T].min())
    print(f"final PaSR state: T in [{tmin:.1f}, {tmax:.1f}] K, "
          f"nonphys {int(nonphys.sum())}", flush=True)
    print(f"TOTAL campaign wall time: {time.time() - wall0:.0f}s "
          f"for {n1 + n2} coupled iterations", flush=True)


if __name__ == "__main__":
    main()
