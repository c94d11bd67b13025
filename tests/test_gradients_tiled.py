"""Tiled gradient sweep (pallas/gradients_tiled.py, SU2_TPU_TILED_GRAD):
bitwise parity with the stencil roll path on real meshes."""

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu.ops import gradients
from su2_tpu.pallas import gradients_tiled as gt


@pytest.fixture()
def quad_mesh_arrays():
    from su2_tpu.geometry.dual_grid import build_dual_grid
    from su2_tpu.geometry.mesh_data import mesh_arrays
    from tests.test_stencil import _quad_grid

    mesh = _quad_grid(23, 17)
    grid = build_dual_grid(mesh)
    ma = mesh_arrays(grid)
    assert ma.stencil_offsets is not None and ma.wls_coeff is not None
    return ma


@pytest.mark.parametrize("mode", ["WLS", "GG"])
def test_tiled_gradient_matches_roll_path(quad_mesh_arrays, mode,
                                          monkeypatch):
    ma = quad_mesh_arrays
    rng = np.random.default_rng(5)
    ng = 5
    q = jnp.asarray(rng.standard_normal((ma.npoint, ng)))

    ref = (gradients.weighted_least_squares(ma, q) if mode == "WLS"
           else gradients.green_gauss(ma, q))

    # force several tiles on this small mesh
    maxoff = max(abs(int(o)) for o in ma.stencil_offsets)
    H = gt._round128(maxoff)
    T = 128
    npad = gt._round128(ma.npoint)
    ntiles = -(-npad // T)
    monkeypatch.setattr(gt, "tile_plan",
                        lambda m, ng_: (T, H, ntiles, ntiles * T + 2 * H))
    out = gt.gradient_tiled(ma, q, mode)
    # ulp-level: interpret-mode pallas and XLA fuse multiplies/adds into
    # FMAs differently; the arithmetic ORDER is identical
    sc = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-13 * max(sc, 1.0))


def test_env_gate_routes_through_tiled(quad_mesh_arrays, monkeypatch):
    ma = quad_mesh_arrays
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((ma.npoint, 4)))
    ref = gradients.weighted_least_squares(ma, q)
    monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1")
    out = gradients.weighted_least_squares(ma, q)
    sc = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-11, atol=1e-13 * max(sc, 1.0))


def test_gradient_rows_matches_node_major(quad_mesh_arrays, monkeypatch):
    """gradient_rows is the same tiled kernel minus the relayout: its
    rows_to_grad conversion must be BITWISE equal to gradient_tiled."""
    ma = quad_mesh_arrays
    rng = np.random.default_rng(11)
    ng = 4
    q = jnp.asarray(rng.standard_normal((ma.npoint, ng)))
    monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1")
    rows = gradients.gradient_rows(ma, q, "WEIGHTED_LEAST_SQUARES")
    assert rows is not None and rows.shape == (ng * 2, ma.npoint)
    full = gt.gradient_tiled(ma, q, "WLS")
    np.testing.assert_array_equal(
        np.asarray(gradients.rows_to_grad(rows, ng, 2)), np.asarray(full))


@pytest.mark.slow
def test_implicit_assembly_rows_path_matches_legacy(flatplate_dir,
                                                    monkeypatch):
    """The feature-major gradient-rows fast path through ns.residual
    (fused_implicit_family_terms f_all stack built from rows) pins to the
    legacy node-major build on the flat-plate implicit RANS case."""
    import os

    import jax.numpy as jnp_

    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.pallas import edge_kernels as ek
    from su2_tpu.solvers import ns
    from su2_tpu import state as st
    from su2_tpu.ops import viscous as vis
    from su2_tpu.linalg import blockcsr

    cfg = Config(os.path.join(flatplate_dir,
                              "my_turbulent_flatplate_air.cfg"))
    sim = Simulation(cfg)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    rng = np.random.default_rng(7)
    u0 = np.asarray(sim.u0) * (1.0 + 0.02 * np.random.default_rng(7)
                               .standard_normal(sim.u0.shape))
    u, v, _ = st.cons2prim(sim.lib, sim.lay, jnp_.asarray(u0), sim.t0,
                           sim.tparams, turb_ke=q0[:, 0])
    turb = vis.TurbFlowData(tke=q0[:, 0], mu_t=mu_t0,
                            grad_tke=grad_k0[:, 0, :], sigma_k=sigma_k0)
    n = v.shape[0]
    dt = jnp_.full((n,), 1e-7, dtype=v.dtype)

    def assemble(tiled):
        monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1" if tiled else "0")
        ek.set_edge_kernel_mode(True)
        try:
            return ns.ns_assemble(sim.lib, sim.lay, sim.mesh, sim.params,
                                  sim.bcs, v, dt=dt, implicit=True,
                                  turb=turb)
        finally:
            ek.set_edge_kernel_mode(False)

    res0, _, _, g0, jac0 = assemble(False)
    res1, _, _, g1, jac1 = assemble(True)
    assert isinstance(jac1, blockcsr.StencilJacobianT)
    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max()
    # tiled-vs-roll gradients differ at FMA/ulp level; everything after is
    # the identical kernel on identical row order
    assert np.abs(r1 - r0).max() < 1e-9 * scale
    d0, d1 = np.asarray(jac0.diag), np.asarray(jac1.diag)
    assert np.abs(d1 - d0).max() < 1e-9 * np.abs(d0).max()
    gg0, gg1 = np.asarray(g0), np.asarray(g1)
    gsc = np.abs(gg0).max()
    assert np.abs(gg1 - gg0).max() < 1e-9 * gsc


@pytest.mark.slow
def test_coupled_step_rows_path_matches_legacy(combustion_dir, monkeypatch,
                                               tmp_path):
    """Driver-level pin: a coupled reactive-RANS step with the gradient
    rows fast path (SU2_TPU_TILED_GRAD=1 — flow residual f_all stack +
    turb-phase gvel/gq row slices) matches the legacy node-major path."""
    import os

    import jax.numpy as jnp_

    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.io.mesh import read_su2_mesh

    cfg = Config(os.path.join(combustion_dir, "my_combustion_no_chem.cfg"),
                 overrides={"RESTART_SOL": "NO", "EXT_ITER": "2"})
    raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))

    def run(tiled):
        monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1" if tiled else "0")
        sim = Simulation(cfg, dtype=jnp_.float32, raw_mesh=raw)
        q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
        ignites = jnp_.zeros((10,), bool)
        state = (sim.u0, sim.t0, q0, mu_t0, grad_k0, sigma_k0)
        carry, hist = sim.rans_multistep(*state, ignites)
        return np.asarray(carry[0]), np.asarray(carry[2])

    u_legacy, q_legacy = run(False)
    u_rows, q_rows = run(True)
    scale = np.abs(u_legacy).max(axis=0)
    assert np.abs(u_rows - u_legacy).max(axis=0).max() < 1e-6 * scale.max()
    qsc = np.abs(q_legacy).max()
    assert np.abs(q_rows - q_legacy).max() < 1e-6 * qsc
