import numpy as np
import jax.numpy as jnp
import pytest

from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.io.mesh import RawMesh
from su2_tpu.linalg import blockcsr, krylov


@pytest.fixture(scope="module")
def small_mesh():
    """3x3 quad grid (16 nodes)."""
    n = 4
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    coords = np.stack([xs.ravel(), ys.ravel()], axis=1)
    elems = []
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            elems.append([a, a + 1, a + n + 1, a + n])
    elems = np.array(elems)
    # boundary: all outer edges wound CCW
    bnd = []
    for i in range(n - 1):
        bnd.append([i, i + 1])                          # bottom
        bnd.append([(n - 1) * n + i + 1, (n - 1) * n + i])  # top
        bnd.append([(i + 1) * n, i * n])                # left
        bnd.append([i * n + n - 1, (i + 1) * n + n - 1])  # right
    mesh = RawMesh(ndim=2, coords=coords,
                   elem_types=np.full(len(elems), 9, dtype=np.int32),
                   elem_nodes=elems,
                   markers={"b": np.array(bnd)},
                   marker_types={"b": np.full(len(bnd), 3, np.int32)})
    return mesh_arrays(build_dual_grid(mesh))


def _random_spd_ish_jacobian(mesh, v, rng):
    """Diagonally dominant random block system (invertible)."""
    npnt, ne = mesh.npoint, mesh.nedge
    off_ij = rng.normal(0, 0.1, (ne, v, v))
    off_ji = rng.normal(0, 0.1, (ne, v, v))
    diag = rng.normal(0, 0.1, (npnt, v, v))
    diag += np.eye(v) * (3.0 + v * 0.5)
    return blockcsr.BlockJacobian(
        diag=jnp.asarray(diag), off_ij=jnp.asarray(off_ij),
        off_ji=jnp.asarray(off_ji))


def _dense(mesh, jac, v):
    npnt = mesh.npoint
    a = np.zeros((npnt * v, npnt * v))
    d = np.asarray(jac.diag)
    for p in range(npnt):
        a[p * v:(p + 1) * v, p * v:(p + 1) * v] = d[p]
    edges = np.asarray(mesh.edges)
    oij = np.asarray(jac.off_ij)
    oji = np.asarray(jac.off_ji)
    for e, (i, j) in enumerate(edges):
        a[i * v:(i + 1) * v, j * v:(j + 1) * v] += oij[e]
        a[j * v:(j + 1) * v, i * v:(i + 1) * v] += oji[e]
    return a


def test_matvec_matches_dense(small_mesh):
    rng = np.random.default_rng(0)
    v = 4
    jac = _random_spd_ish_jacobian(small_mesh, v, rng)
    x = jnp.asarray(rng.normal(0, 1, (small_mesh.npoint, v)))
    y = np.asarray(blockcsr.matvec(small_mesh, jac, x))
    a = _dense(small_mesh, jac, v)
    y_ref = (a @ np.asarray(x).ravel()).reshape(small_mesh.npoint, v)
    np.testing.assert_allclose(y, y_ref, rtol=1e-12)


def test_fgmres_solves(small_mesh):
    rng = np.random.default_rng(1)
    v = 4
    jac = _random_spd_ish_jacobian(small_mesh, v, rng)
    b = jnp.asarray(rng.normal(0, 1, (small_mesh.npoint, v)))
    dinv = blockcsr.block_jacobi_factor(jac)
    x, rel, iters = krylov.fgmres(
        lambda x: blockcsr.matvec(small_mesh, jac, x),
        lambda r: blockcsr.block_jacobi_apply(dinv, r),
        b, max_iter=30, tol=1e-10)
    r = np.asarray(b - blockcsr.matvec(small_mesh, jac, x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_bcgstab_solves(small_mesh):
    rng = np.random.default_rng(2)
    v = 3
    jac = _random_spd_ish_jacobian(small_mesh, v, rng)
    b = jnp.asarray(rng.normal(0, 1, (small_mesh.npoint, v)))
    dinv = blockcsr.block_jacobi_factor(jac)
    x, rel, _ = krylov.bcgstab(
        lambda x: blockcsr.matvec(small_mesh, jac, x),
        lambda r: blockcsr.block_jacobi_apply(dinv, r),
        b, max_iter=60, tol=1e-10)
    r = np.asarray(b - blockcsr.matvec(small_mesh, jac, x))
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-6


def test_cg_solves_spd(small_mesh):
    rng = np.random.default_rng(3)
    v = 3
    jac = _random_spd_ish_jacobian(small_mesh, v, rng)
    # symmetrize to SPD
    a = _dense(small_mesh, jac, v)
    a = 0.5 * (a + a.T) + np.eye(a.shape[0]) * 1.0
    b = rng.normal(0, 1, a.shape[0])
    xj = jnp.asarray(b.reshape(small_mesh.npoint, v))

    def mv(x):
        return jnp.asarray((a @ np.asarray(x).ravel()).reshape(x.shape)) \
            if False else jnp.einsum("ij,j->i", jnp.asarray(a),
                                     x.ravel()).reshape(x.shape)

    x, rel, _ = krylov.cg(mv, lambda r: r, xj, max_iter=200, tol=1e-12)
    r = np.asarray(xj - mv(x))
    assert np.linalg.norm(r) / np.linalg.norm(b) < 1e-8


def test_greedy_coloring_is_proper(small_mesh):
    colors = blockcsr.greedy_coloring(np.asarray(small_mesh.node_nbrs))
    nbrs = np.asarray(small_mesh.node_nbrs)
    for p in range(small_mesh.npoint):
        for q in nbrs[p]:
            if q != p:
                assert colors[p] != colors[q]
    assert colors.max() + 1 <= 6


def test_multicolor_sgs_preconditioner(small_mesh):
    """FGMRES with the multicolor SGS preconditioner solves at least as
    tightly as block-Jacobi within the same iteration budget."""
    rng = np.random.default_rng(7)
    v = 3
    jac = _random_spd_ish_jacobian(small_mesh, v, rng)
    b = jnp.asarray(rng.normal(0, 1, (small_mesh.npoint, v)))
    colors = blockcsr.greedy_coloring(np.asarray(small_mesh.node_nbrs))
    masks = tuple(jnp.asarray(colors == c) for c in range(colors.max() + 1))

    def solve(kind, cm):
        pc = blockcsr.make_preconditioner(small_mesh, jac, kind, cm)
        x, rel, _ = krylov.fgmres(
            lambda x: blockcsr.matvec(small_mesh, jac, x), pc, b,
            max_iter=6, tol=1e-14)
        r = np.asarray(b - blockcsr.matvec(small_mesh, jac, x))
        return np.linalg.norm(r) / np.linalg.norm(np.asarray(b))

    r_sgs = solve("LU_SGS", masks)
    r_jac = solve("JACOBI", None)
    assert r_sgs < 1e-6
    assert r_sgs <= r_jac * 1.5, (r_sgs, r_jac)
