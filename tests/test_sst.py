import numpy as np
import jax.numpy as jnp

from su2_tpu.turbulence import sst


def test_blending_limits():
    """F1 -> 1 at the wall (small dist), -> 0 far away."""
    n = 4
    k = jnp.full((n,), 1.0)
    w = jnp.full((n,), 100.0)
    gk = jnp.zeros((n, 2))
    gw = jnp.zeros((n, 2))
    mu = jnp.full((n,), 1.8e-5)
    rho = jnp.full((n,), 1.2)
    f1_wall, f2_wall, _ = sst.blending(k, w, gk, gw, mu, rho,
                                       jnp.full((n,), 1e-6))
    f1_far, f2_far, _ = sst.blending(k, w, gk, gw, mu, rho,
                                     jnp.full((n,), 100.0))
    assert np.allclose(np.asarray(f1_wall), 1.0)
    assert np.asarray(f1_far).max() < 1e-3
    assert np.asarray(f2_far).max() < 1e-2


def test_eddy_viscosity_formula():
    rho = jnp.asarray([1.0])
    k = jnp.asarray([0.5])
    w = jnp.asarray([1000.0])
    # low strain: zeta = 1/w -> muT = rho k / w
    mut = sst.eddy_viscosity(rho, k, w, jnp.asarray([1.0]), jnp.asarray([1.0]))
    np.testing.assert_allclose(float(mut[0]), 0.5 / 1000.0, rtol=1e-12)
    # high strain limit: zeta = a1/(S F2)
    s = jnp.asarray([1e6])
    mut2 = sst.eddy_viscosity(rho, k, w, s, jnp.asarray([1.0]))
    np.testing.assert_allclose(float(mut2[0]), 0.5 * sst.A1 / 1e6, rtol=1e-6)
    # fork's dimensional clip at 1.0
    mut3 = sst.eddy_viscosity(jnp.asarray([10.0]), jnp.asarray([100.0]),
                              jnp.asarray([1.0]), jnp.asarray([0.0]),
                              jnp.asarray([1.0]))
    assert float(mut3[0]) == 1.0


def test_strain_vorticity():
    from su2_tpu.state import Layout
    lay = Layout(2, 3)
    # pure shear du/dy = s: strain = sqrt(2*(2*(s/2)^2 + ...)) with zero divergence
    s = 3.0
    grad = jnp.zeros((1, 8, 2)).at[0, 1, 1].set(s)
    strain, vort = sst.strain_and_vorticity(lay, grad)
    np.testing.assert_allclose(float(strain[0]), np.sqrt(2 * 2 * (s / 2) ** 2),
                               rtol=1e-12)
    np.testing.assert_allclose(float(vort[0]), s, rtol=1e-12)


def test_wall_distance():
    coords = np.array([[0.0, 0.0], [0.0, 1.0], [2.0, 2.0]])
    wall = np.array([[0.0, 0.0], [1.0, 0.0]])
    d = sst.wall_distance(coords, wall)
    np.testing.assert_allclose(d, [0.0, 1.0, np.sqrt(1 + 4)])
