"""Round-4 diagnostic: spectrum of the coupled RANS adjoint map at the
fixed point, and GMRES convergence on (I - dG^T) lam = g with different
restart settings.  Run on CPU f64 (same env as the test suite)."""
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

import textwrap  # noqa: E402
import tempfile  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from su2_tpu import adjoint as adj  # noqa: E402
from su2_tpu import state as st  # noqa: E402

sys.path.insert(0, "/root/repo/tests")
from test_adjoint import CFG_RANS, _setup_rans, _solve_rans_primal  # noqa: E402

FLATPLATE = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"


def main():
    tmp = tempfile.mkdtemp()
    from pathlib import Path
    t0 = time.time()
    sim = _setup_rans(Path(tmp), FLATPLATE)
    print(f"setup {time.time()-t0:.1f}s", flush=True)

    step, _ = adj.make_rans_fixed_point_step(sim)
    coords0 = sim.mesh.coords

    t0 = time.time()
    u0, _, _, turb0 = sim.run(800, quiet=True)
    print(f"sim.run(800) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    u_star, q_star, t_star = _solve_rans_primal(
        sim, step, coords0, u0, turb0[0], sim.t0, n=400)
    print(f"polish(400) {time.time()-t0:.1f}s", flush=True)
    un, qn = step(u_star, q_star, coords0, t_star)
    drift = float(jnp.abs(un - u_star).max() / jnp.abs(u_star).max())
    print("drift:", drift, flush=True)

    objective = adj.make_objective(sim, tags=("lower_wall",), which="CD")
    j_val, vjp_ju = jax.vjp(
        lambda u: objective(u, coords0, t_star), u_star)
    _, vjp_g = jax.vjp(lambda u, q: step(u, q, coords0, t_star),
                       u_star, q_star)
    gj_u = vjp_ju(jnp.asarray(1.0, dtype=u_star.dtype))[0]
    zero_q = jnp.zeros_like(q_star)

    @jax.jit
    def apply_gT(lam_u, lam_q):
        du, dq = vjp_g((lam_u, lam_q))
        return du, dq

    # ---- power iteration on dG^T ----
    rng = np.random.default_rng(0)
    x_u = jnp.asarray(rng.standard_normal(u_star.shape))
    x_q = jnp.asarray(rng.standard_normal(q_star.shape))

    def norm(a, b):
        return float(jnp.sqrt(jnp.sum(a * a) + jnp.sum(b * b)))

    prev = None
    t0 = time.time()
    for i in range(300):
        y_u, y_q = apply_gT(x_u, x_q)
        nv = norm(y_u, y_q)
        x_u, x_q = y_u / nv, y_q / nv
        if i % 50 == 49:
            print(f"power it {i+1}: |dG^T x| = {nv:.8f}", flush=True)
        prev = nv
    print(f"dominant |eig(dG)| ~= {prev:.8f}  ({time.time()-t0:.1f}s)",
          flush=True)

    # where does the dominant mode live?
    print("mode |u| max:", float(jnp.abs(x_u).max()),
          " |q| max:", float(jnp.abs(x_q).max()), flush=True)
    iu = np.unravel_index(int(jnp.abs(x_u).argmax()), x_u.shape)
    iq = np.unravel_index(int(jnp.abs(x_q).argmax()), x_q.shape)
    print("argmax u:", iu, " argmax q:", iq, flush=True)
    # column structure: which variables carry it
    print("u mode col norms:", np.asarray(
        jnp.sqrt(jnp.sum(x_u * x_u, axis=0))), flush=True)
    print("q mode col norms:", np.asarray(
        jnp.sqrt(jnp.sum(x_q * x_q, axis=0))), flush=True)

    # ---- full dense spectrum (45 nodes * 9 vars + 45*2 = tiny) ----
    n_u = u_star.size
    n_q = q_star.size
    print("assembling dense dG^T:", n_u + n_q, "dims", flush=True)
    t0 = time.time()

    def matvec_flat(v):
        lu = v[:n_u].reshape(u_star.shape)
        lq = v[n_u:].reshape(q_star.shape)
        du, dq = apply_gT(lu, lq)
        return jnp.concatenate([du.ravel(), dq.ravel()])

    eye = jnp.eye(n_u + n_q)
    cols = jax.lax.map(matvec_flat, eye)
    A = np.asarray(cols).T  # dG^T acting on columns -> rows? careful
    # cols[i] = dG^T e_i  -> as columns of dG^T: dG^T = cols.T? no:
    # stack of results as rows = (dG^T)^T applied... define M[i,:] = dG^T e_i
    # then M = (dG^T)^T = dG. eigenvalues same either way.
    print(f"dense assembly {time.time()-t0:.1f}s", flush=True)
    ev = np.linalg.eigvals(A)
    idx = np.argsort(-np.abs(ev))
    print("top-10 |eig(dG)|:", np.abs(ev[idx[:10]]), flush=True)
    print("top-10 eig(dG):", ev[idx[:10]], flush=True)
    near1 = np.sum(np.abs(1.0 - ev) < 1e-3)
    print("eigs with |1-eig|<1e-3:", near1, flush=True)
    mineig = np.min(np.abs(1.0 - ev))
    print("min |1-eig| (cond of I-dG direction):", mineig, flush=True)

    # ---- GMRES on (I - dG^T) lam = g with maxiter=1, restart=100 ----
    from jax.scipy.sparse import linalg as spla

    @jax.jit
    def matvec(lam):
        du, dq = vjp_g(lam)
        return (lam[0] - du, lam[1] - dq)

    b = (gj_u, zero_q)
    for restart in (30, 100, 200):
        lam = b
        t0 = time.time()
        hist = []
        for it in range(6):
            r = matvec(lam)
            res = float(max(jnp.abs(b[0] - r[0]).max(),
                            jnp.abs(b[1] - r[1]).max()))
            hist.append(res)
            lam, _ = spla.gmres(matvec, b, x0=lam, restart=restart,
                                maxiter=1, tol=1e-30, atol=0.0)
        r = matvec(lam)
        res = float(max(jnp.abs(b[0] - r[0]).max(),
                        jnp.abs(b[1] - r[1]).max()))
        hist.append(res)
        print(f"gmres restart={restart}: hist={hist} "
              f"({time.time()-t0:.1f}s)", flush=True)

    # direct dense solve for ground truth of lambda
    I = np.eye(n_u + n_q)
    g = np.concatenate([np.asarray(gj_u).ravel(), np.zeros(n_q)])
    lam_true = np.linalg.solve(I - A.T, g)  # A==dG (rows) -> A.T==dG^T
    print("dense lam solve done; |lam|max:", np.abs(lam_true).max(),
          flush=True)
    np.save("/tmp/diag_lam_true.npy", lam_true)
    np.save("/tmp/diag_eigs.npy", ev)


if __name__ == "__main__":
    main()
