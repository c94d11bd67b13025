"""Debug the fused edge kernel vs the XLA chain, piecewise."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.ops import viscous as vis, ausm, gradients, limiters
from su2_tpu.solvers import ns, euler as es
from su2_tpu import state as st
from su2_tpu.chemistry import library as cl

comb = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"
fix = np.load("tests/fixtures/ref_restart_nochem.npz")
from su2_tpu.io import restart as rio
import tempfile
tmp = tempfile.mkdtemp()
cwd = os.getcwd()
os.chdir(tmp)
rio.write_restart("restart_flow.dat", np.zeros((fix["u"].shape[0], 2)),
                  fix["u"], fix["turb"])
cfg = Config(os.path.join(comb, "my_combustion_second_chem_PaSR.cfg"))
sim = Simulation(cfg)
q, mu_t, grad_k, sigma_k = sim.initial_turb_state()
os.chdir(cwd)

lib, lay, mesh, prm = sim.lib, sim.lay, sim.mesh, sim.params
u, v, _ = st.cons2prim(lib, lay, sim.u0, sim.t0, sim.tparams, turb_ke=q[:, 0])
turb = vis.TurbFlowData(tke=q[:, 0], mu_t=mu_t, grad_tke=grad_k,
                        sigma_k=sigma_k)
sigma_k_edge = sigma_k[mesh.edges[:, 0]]

nd, ns_ = lay.ndim, lay.ns
qv = vis.ns_gradient_vars(lib, lay, v)
grad = es.compute_gradients(mesh, prm, qv)
dpdu_full = st.dpdu(lib, lay, v)
trans = vis.node_transport(lib, lay, v)
i, j = mesh.edges[:, 0], mesh.edges[:, 1]

# ---- XLA path pieces ----
lim = jnp.ones((v.shape[0], 2 + nd), dtype=v.dtype)
cres = es.convective_residual(lib, lay, mesh, prm, v, grad[:, :2 + nd, :], lim)
vf_args = dict(coord_i=mesh.coords[i], coord_j=mesh.coords[j], corrected=True,
               turb_i={"mu_t": turb.mu_t[i], "tke": turb.tke[i],
                       "grad_tke": turb.grad_tke[i]},
               turb_j={"mu_t": turb.mu_t[j], "tke": turb.tke[j],
                       "grad_tke": turb.grad_tke[j]},
               sigma_k=sigma_k_edge, prandtl_turb=prm.prandtl_turb,
               lewis_turb=prm.lewis_turb)
vflux = vis.viscous_flux(
    lib, lay, v[i], v[j], grad[i], grad[j], mesh.edge_normal,
    {"mu": trans.mu[i], "kappa": trans.kappa[i], "dij": trans.dij[i]},
    {"mu": trans.mu[j], "kappa": trans.kappa[j], "dij": trans.dij[j]},
    **vf_args)
res_xla = cres - mesh.scatter_edges(vflux)

# ---- fused path ----
from su2_tpu.pallas import edge_fused
res_f, lam_c, lam_v = edge_fused.fused_interior_terms(
    lib, lay, mesh, prm, v, grad, trans, turb, sigma_k_edge,
    dpdu_full[:, lay.RHOE])

r0, r1 = np.asarray(res_xla), np.asarray(res_f)
print("per-col max|diff| :", np.abs(r1 - r0).max(axis=0))
print("per-col scale     :", np.abs(r0).max(axis=0))

# isolate: convective only (zero out viscous by comparing conv pieces)
from su2_tpu.ops import ausm_t
vt = v.T
conv_t = ausm_t.ausm_flux_t(lay, vt[:, i], vt[:, j], mesh.edge_normal.T,
                            prm.m_infty)
conv_res_t = mesh.scatter_edges(conv_t.T)
c0, c1 = np.asarray(cres), np.asarray(conv_res_t)
print("conv per-col max|diff|:", np.abs(c1 - c0).max(axis=0))

# viscous piecewise
from su2_tpu.ops import viscous_t
sel = np.concatenate([np.arange(0, 1 + nd), np.arange(2 + nd, 2 + nd + ns_)])
gsel = grad[:, sel, :]
sc = viscous_t.species_consts(np.asarray(lib.mm), np.asarray(lib.diff_vol),
                              v.dtype)
tmean = 0.5 * (v[i, lay.T] + v[j, lay.T])
h_s = cl.species_enthalpy(lib, tmean).T
cp_s = cl.species_cp(lib, tmean).T
vflux_t = viscous_t.viscous_flux_t(
    lay, sc, vt[:, i], vt[:, j],
    jnp.transpose(gsel[i], (1, 2, 0)), jnp.transpose(gsel[j], (1, 2, 0)),
    mesh.edge_normal.T, (mesh.coords[j] - mesh.coords[i]).T,
    trans.mu[i], trans.mu[j], trans.kappa[i], trans.kappa[j],
    turb.mu_t[i], turb.mu_t[j], turb.tke[i], turb.tke[j],
    turb.grad_tke[i].T, turb.grad_tke[j].T, sigma_k_edge,
    h_s, cp_s, prm.prandtl_turb, prm.lewis_turb)
v0, v1 = np.asarray(vflux), np.asarray(vflux_t.T)
print("visc per-col max|diff|:", np.abs(v1 - v0).max(axis=0))
print("visc per-col scale    :", np.abs(v0).max(axis=0))
