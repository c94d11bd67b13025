"""Round-4 phase 3: validate the large-CFL coupled adjoint solve against
the dense ground truth (-0.0032189724 at the pick node from phase 2) and
against central FD with large-CFL re-convergence."""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import tempfile  # noqa: E402
from pathlib import Path  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from su2_tpu import adjoint as adj  # noqa: E402
from test_adjoint import _setup_rans, _solve_rans_primal  # noqa: E402

FLATPLATE = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"
CFLS = 1e6


def main():
    tmp = tempfile.mkdtemp()
    sim = _setup_rans(Path(tmp), FLATPLATE)
    step, _ = adj.make_rans_fixed_point_step(sim)
    big_step, _ = adj.make_rans_fixed_point_step(sim, cfl_scale=CFLS)
    coords0 = sim.mesh.coords

    t0 = time.time()
    u0, _, _, turb0 = sim.run(800, quiet=True)
    u_star, q_star, t_star = _solve_rans_primal(
        sim, step, coords0, u0, turb0[0], sim.t0, n=400)
    print(f"primal {time.time()-t0:.1f}s", flush=True)

    # polish with the big-CFL map: near-Newton steps
    t0 = time.time()
    u_b, q_b, t_b = _solve_rans_primal(
        sim, big_step, coords0, u_star, q_star, t_star, n=60)
    un, qn = big_step(u_b, q_b, coords0, t_b)
    drift = float(jnp.abs(un - u_b).max() / jnp.abs(u_b).max())
    drift_small = float(jnp.abs(
        step(u_b, q_b, coords0, t_b)[0] - u_b).max() / jnp.abs(u_b).max())
    print(f"big-CFL polish {time.time()-t0:.1f}s  drift(big)={drift:.3e} "
          f"drift(prod)={drift_small:.3e}", flush=True)

    t0 = time.time()
    out = adj.adjoint_sensitivity_rans(sim, u_b, q_b, t_b,
                                       tags=("lower_wall",), which="CD",
                                       n_iter=400, tol=1e-13)
    print(f"adjoint {time.time()-t0:.1f}s hist={out['adj_hist']} "
          f"converged={out['converged']}", flush=True)

    nodes = np.asarray(sim.grid.bnd_nodes["lower_wall"])
    xs = np.asarray(sim.grid.coords[nodes, 0])
    pick = nodes[np.argsort(np.abs(xs - 0.5))[0]]
    ad = float(out["sensitivity"][pick, 1])
    print("AD sens at pick:", ad, " (dense ground truth -0.0032189724)",
          flush=True)

    objective = adj.make_objective(sim, tags=("lower_wall",), which="CD")
    eps = 2e-6

    def j_at(delta):
        c = coords0.at[pick, 1].add(delta)
        u, q, t = _solve_rans_primal(sim, big_step, c, u_b, q_b, t_b, n=60)
        return float(objective(u, c, t))

    t0 = time.time()
    fd = (j_at(eps) - j_at(-eps)) / (2 * eps)
    print(f"FD {time.time()-t0:.1f}s: {fd}  relerr vs AD: "
          f"{abs(fd-ad)/max(abs(fd),1e-30):.3e}", flush=True)


if __name__ == "__main__":
    main()
