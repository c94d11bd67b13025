"""Round-4 diagnostic phase 2: dense (I - dG^T) solve for the coupled RANS
adjoint on the tiny channel case — ground-truth lambda + full spectrum +
GMRES restart study."""
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


def main():
    tmp = tempfile.mkdtemp()
    sim = _setup_rans(Path(tmp), FLATPLATE)
    step, _ = adj.make_rans_fixed_point_step(sim)
    coords0 = sim.mesh.coords

    t0 = time.time()
    u0, _, _, turb0 = sim.run(800, quiet=True)
    u_star, q_star, t_star = _solve_rans_primal(
        sim, step, coords0, u0, turb0[0], sim.t0, n=400)
    print(f"primal {time.time()-t0:.1f}s", flush=True)

    objective = adj.make_objective(sim, tags=("lower_wall",), which="CD")
    j_val, vjp_ju = jax.vjp(
        lambda u: objective(u, coords0, t_star), u_star)
    _, vjp_jx = jax.vjp(lambda x: objective(u_star, x, t_star), coords0)
    _, vjp_g = jax.vjp(lambda u, q: step(u, q, coords0, t_star),
                       u_star, q_star)
    _, vjp_gx = jax.vjp(lambda x: step(u_star, q_star, x, t_star), coords0)
    gj_u = vjp_ju(jnp.asarray(1.0, dtype=u_star.dtype))[0]

    @jax.jit
    def apply_gT(lam_u, lam_q):
        du, dq = vjp_g((lam_u, lam_q))
        return du, dq

    n_u, n_q = u_star.size, q_star.size
    n = n_u + n_q
    print("dims:", n, flush=True)

    t0 = time.time()
    _ = apply_gT(jnp.zeros_like(u_star), jnp.zeros_like(q_star))
    print(f"compile {time.time()-t0:.1f}s", flush=True)

    # dense dG^T columns, one unit vector at a time (python loop over the
    # cached jitted function)
    t0 = time.time()
    cols = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        du, dq = apply_gT(jnp.asarray(e[:n_u].reshape(u_star.shape)),
                          jnp.asarray(e[n_u:].reshape(q_star.shape)))
        cols[:, i] = np.concatenate(
            [np.asarray(du).ravel(), np.asarray(dq).ravel()])
        if i % 100 == 99:
            print(f"  col {i+1}/{n} ({time.time()-t0:.1f}s)", flush=True)
    GT = cols  # GT[:, i] = dG^T e_i  ->  GT == dG^T
    print(f"dense dG^T {time.time()-t0:.1f}s", flush=True)
    np.save("/tmp/diag_GT.npy", GT)

    ev = np.linalg.eigvals(GT)
    idx = np.argsort(-np.abs(ev))
    print("top-12 |eig|:", np.abs(ev[idx[:12]]), flush=True)
    print("top-12 eig:", ev[idx[:12]], flush=True)
    d = np.abs(1.0 - ev)
    print("min |1-eig|:", d.min(), " #|1-eig|<1e-2:", (d < 1e-2).sum(),
          " #<1e-3:", (d < 1e-3).sum(), flush=True)

    g = np.concatenate([np.asarray(gj_u).ravel(), np.zeros(n_q)])
    lam_true = np.linalg.solve(np.eye(n) - GT, g)
    print("|lam_true| max:", np.abs(lam_true).max(), flush=True)
    np.save("/tmp/diag_lam_true.npy", lam_true)

    # ground-truth sensitivity at the FD-test node
    lam_u = jnp.asarray(lam_true[:n_u].reshape(u_star.shape))
    lam_q = jnp.asarray(lam_true[n_u:].reshape(q_star.shape))
    sens = vjp_jx(jnp.asarray(1.0, dtype=u_star.dtype))[0] \
        + vjp_gx((lam_u, lam_q))[0]
    nodes = np.asarray(sim.grid.bnd_nodes["lower_wall"])
    xs = np.asarray(sim.grid.coords[nodes, 0])
    pick = nodes[np.argsort(np.abs(xs - 0.5))[0]]
    print("dense-solve sensitivity at pick:", pick,
          float(sens[pick, 1]), flush=True)

    # GMRES convergence (numpy dense matvec, instant) to size the Krylov
    # budget the jax path needs
    A = np.eye(n) - GT
    import scipy.sparse.linalg as spl
    for restart in (30, 60, 120, 200):
        resids = []
        cb = lambda pr: resids.append(float(pr))
        x, info = spl.gmres(A, g, restart=restart,
                            maxiter=max(1, 600 // restart),
                            rtol=1e-12, atol=0.0, callback=cb,
                            callback_type="pr_norm")
        err = np.abs(x - lam_true).max() / max(np.abs(lam_true).max(), 1e-300)
        print(f"gmres restart={restart}: info={info} n_res={len(resids)} "
              f"final_pr={resids[-1] if resids else None:.3e} "
              f"lam_relerr={err:.3e}", flush=True)


if __name__ == "__main__":
    main()
