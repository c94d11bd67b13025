"""Poisson / heat / wave auxiliary-solver tests (CPoissonSolver /
CHeatSolver / CWaveSolver capability)."""

import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.solvers import scalar


@pytest.fixture(scope="module")
def mesh():
    return mesh_arrays(build_dual_grid(channel_mesh(21, 21, lx=1.0, ly=1.0)))


def _all_bnd(mesh):
    nodes = []
    for tag, (n, _) in mesh.markers.items():
        nodes.append(np.asarray(n))
    return np.unique(np.concatenate(nodes))


def test_poisson_harmonic_exact(mesh):
    """A harmonic function (rhs=0) with its own Dirichlet data must be
    reproduced to solver tolerance: phi = x^2 - y^2."""
    c = np.asarray(mesh.coords)
    exact = c[:, 0] ** 2 - c[:, 1] ** 2
    bnd = _all_bnd(mesh)
    phi = scalar.solve_poisson(
        mesh, jnp.zeros(mesh.npoint), jnp.asarray(bnd),
        jnp.asarray(exact[bnd]), n_iter=800, tol=1e-14)
    err = np.abs(np.asarray(phi) - exact).max()
    assert err < 5e-3, err         # 2nd-order TPFA on a uniform grid


def test_poisson_manufactured_rhs(mesh):
    """-lap(phi) = 2 pi^2 sin(pi x) sin(pi y) -> phi = sin sin, zero BC."""
    c = np.asarray(mesh.coords)
    exact = np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1])
    rhs = 2.0 * np.pi ** 2 * exact
    bnd = _all_bnd(mesh)
    phi = scalar.solve_poisson(
        mesh, jnp.asarray(rhs), jnp.asarray(bnd),
        jnp.zeros(len(bnd)), n_iter=800, tol=1e-14)
    err = np.abs(np.asarray(phi) - exact).max()
    assert err < 0.02, err


def test_heat_relaxes_to_linear_profile(mesh):
    """Isothermal 0/1 on left/right walls -> steady linear T(x)."""
    left = np.asarray(mesh.markers["inlet"][0])
    right = np.asarray(mesh.markers["outlet"][0])
    iso = jnp.asarray(np.concatenate([left, right]))
    vals = jnp.asarray(np.concatenate([np.zeros(len(left)),
                                       np.ones(len(right))]))
    t = jnp.zeros(mesh.npoint)
    import jax
    step = jax.jit(lambda t: scalar.heat_step(mesh, t, alpha=1.0, dt=5e-4,
                                              iso_nodes=iso, iso_vals=vals))
    for _ in range(4000):
        t = step(t)
    c = np.asarray(mesh.coords)
    np.testing.assert_allclose(np.asarray(t), c[:, 0], atol=0.02)


def test_wave_energy_bounded(mesh):
    """Leapfrog wave stays bounded at CFL-stable dt with fixed walls."""
    c = np.asarray(mesh.coords)
    phi0 = np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1])
    bnd = jnp.asarray(_all_bnd(mesh))
    phi = jnp.asarray(phi0).at[bnd].set(0.0)
    phi_old = phi
    import jax
    step = jax.jit(lambda p, po: scalar.wave_step(mesh, p, po, c2=1.0,
                                                  dt=5e-3,
                                                  dirichlet_nodes=bnd))
    for _ in range(600):
        phi, phi_old = step(phi, phi_old)
    assert np.isfinite(np.asarray(phi)).all()
    assert np.abs(np.asarray(phi)).max() < 2.0   # bounded oscillation
