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
    turb = vis.TurbFlowData(tke=q[:, 0], mu_t=mu_t, grad_tke=grad_k,
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
