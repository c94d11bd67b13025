"""Fused explicit edge kernel (pallas/edge_fused.py) vs the XLA chain.

The fused kernel runs the full interior-edge pipeline (AUSM + viscous with
Stefan-Maxwell + SST closure + spectral radii) in one pallas_call; these
tests pin it to the edge-major XLA path on the realistic PaSR combustor
state (reference restart), interpret mode on CPU/f64.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.ops import timestep, viscous as vis
from su2_tpu.pallas import edge_kernels as ek
from su2_tpu.solvers import ns
from su2_tpu import state as st


@pytest.fixture(scope="module")
def pasr_state(combustion_dir, tmp_path_factory):
    from su2_tpu.io import restart as rio

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "ref_restart_nochem.npz"))
    coords = np.zeros((fix["u"].shape[0], 2))
    tmp = tmp_path_factory.mktemp("fused")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rio.write_restart("restart_flow.dat", coords, fix["u"], fix["turb"])
        cfg = Config(os.path.join(combustion_dir,
                                  "my_combustion_second_chem_PaSR.cfg"))
        sim = Simulation(cfg)
        q, mu_t, grad_k, sigma_k = sim.initial_turb_state()
    finally:
        os.chdir(cwd)
    lib, lay = sim.lib, sim.lay
    u, v, _ = st.cons2prim(lib, lay, sim.u0, sim.t0, sim.tparams,
                           turb_ke=q[:, 0])
    turb = vis.TurbFlowData(tke=q[:, 0], mu_t=mu_t,
                            grad_tke=grad_k[:, 0, :],   # SST carry is the
                            # full (k, omega) gradient pair since round 3
                            sigma_k=sigma_k)
    sigma_k_edge = sigma_k[sim.mesh.edges[:, 0]]
    return sim, v, turb, q[:, 1], sigma_k_edge


def _assemble(pasr_state, fused: bool):
    sim, v, turb, omega_t, sigma_k_edge = pasr_state
    ek.set_edge_kernel_mode(fused)
    try:
        out = ns.ns_assemble(
            sim.lib, sim.lay, sim.mesh, sim.params, sim.bcs, v,
            turb=turb, omega_turb=omega_t, sigma_k_edge=sigma_k_edge,
            want_lambdas=True)
    finally:
        ek.set_edge_kernel_mode(False)
    return out


@pytest.mark.slow
def test_fused_residual_matches_xla(pasr_state):
    sim, v, turb, omega_t, sigma_k_edge = pasr_state
    res0, wm0, _, _, lams0 = _assemble(pasr_state, fused=False)
    res1, wm1, trans, _, lams1 = _assemble(pasr_state, fused=True)
    assert lams0 is None and lams1 is not None
    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max(axis=0)
    assert np.abs(r1 - r0).max(axis=0).max() / scale.max() < 1e-11
    for k in range(r0.shape[1]):
        assert np.abs(r1[:, k] - r0[:, k]).max() <= 1e-9 * max(scale[k], 1e-6), k

    # spectral radii: fused interior sums + boundary terms == the sweeps
    lib, lay, mesh, prm = sim.lib, sim.lay, sim.mesh, sim.params
    lam_c = timestep.boundary_lambda_inv(mesh, lay, v, lams1[0])
    lam_c_ref = timestep.max_lambda_inv(mesh, lay, v)
    np.testing.assert_allclose(np.asarray(lam_c), np.asarray(lam_c_ref),
                               rtol=1e-12)
    dpdu_full = st.dpdu(lib, lay, v)
    lam_v = ns.viscous_lambda_boundary(lib, mesh, lay, prm, v, trans,
                                       dpdu_full, turb, lams1[1])
    lam_v_ref = ns.viscous_lambda(lib, mesh, lay, prm, v, trans, dpdu_full,
                                  turb)
    np.testing.assert_allclose(np.asarray(lam_v), np.asarray(lam_v_ref),
                               rtol=1e-10)


@pytest.fixture(scope="module")
def flatplate_state(flatplate_dir):
    cfg = Config(os.path.join(flatplate_dir,
                              "my_turbulent_flatplate_air.cfg"))
    sim = Simulation(cfg)
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    # perturb the freestream so gradients/limiters/Jacobians are nontrivial
    rng = np.random.default_rng(7)
    u0 = np.asarray(sim.u0)
    u0 = u0 * (1.0 + 0.02 * rng.standard_normal(u0.shape))
    u, v, _ = st.cons2prim(sim.lib, sim.lay, jnp.asarray(u0), sim.t0,
                           sim.tparams, turb_ke=q0[:, 0])
    turb = vis.TurbFlowData(
        tke=q0[:, 0], mu_t=mu_t0 * (1 + rng.uniform(0, 1, mu_t0.shape)),
        grad_tke=jnp.asarray(rng.normal(0, 1e-3, grad_k0[:, 0, :].shape)),
        sigma_k=sigma_k0)
    return sim, v, turb


@pytest.mark.slow
def test_fused_implicit_assembly_matches_xla(flatplate_state):
    """The fused implicit edge kernel (MUSCL + AUSM + viscous + Jacobians,
    pallas/edge_fused.fused_implicit_family_terms) pins to the XLA
    family-major assembly on the flat-plate RANS case."""
    from su2_tpu.linalg import blockcsr

    sim, v, turb = flatplate_state
    lib, lay, mesh, prm = sim.lib, sim.lay, sim.mesh, sim.params
    n = v.shape[0]
    dt = jnp.full((n,), 1e-7, dtype=v.dtype)

    def assemble(fused):
        ek.set_edge_kernel_mode(fused)
        try:
            return ns.ns_assemble(lib, lay, mesh, prm, sim.bcs, v, dt=dt,
                                  implicit=True, turb=turb)
        finally:
            ek.set_edge_kernel_mode(False)

    res0, wm0, _, _, jac0 = assemble(False)
    res1, wm1, _, _, jac1 = assemble(True)
    assert isinstance(jac0, blockcsr.FamilyJacobian)
    assert isinstance(jac1, blockcsr.StencilJacobianT)

    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max()
    assert np.abs(r1 - r0).max() < 1e-9 * scale

    d0, d1 = np.asarray(jac0.diag), np.asarray(jac1.diag)
    dscale = np.abs(d0).max()
    assert np.abs(d1 - d0).max() < 1e-9 * dscale

    k = len(mesh.stencil_offsets)
    nvar = lay.nvar
    sel0 = np.asarray(blockcsr.family_sel(mesh, jac0))
    sel1 = np.asarray(jac1.sel_t).reshape(k, nvar, nvar, n).transpose(
        0, 3, 1, 2)
    sscale = np.abs(sel0).max()
    assert np.abs(sel1 - sel0).max() < 1e-9 * sscale

    # and the lane-layout solver ops agree with the family ops
    colors = sim.color_masks
    mv0, pc0, _, _ = blockcsr.make_solver_ops(mesh, jac0, "LU_SGS", colors)
    mv1, pc1, _, _ = blockcsr.make_solver_ops(mesh, jac1, "LU_SGS", colors)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (n, nvar)), v.dtype)
    np.testing.assert_allclose(np.asarray(mv1(x)), np.asarray(mv0(x)),
                               rtol=1e-8, atol=1e-8 * dscale)
    np.testing.assert_allclose(np.asarray(pc1(x)), np.asarray(pc0(x)),
                               rtol=1e-7, atol=1e-7)
