"""Fused node-state kernel (pallas/node_state.py) vs the XLA chain.

Pins the one-pass Cons2Prim + dT/dU + dP/dU + Wilke-transport + mole-
fraction kernel to the existing state.py / chemistry.library chain on the
realistic PaSR combustor state (reference restart), interpret mode on
CPU/f64.  Reference semantics: variable_direct_reactive.cpp:325-561 +
reacting_model_library.cpp:634-696.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu import state as st
from su2_tpu.chemistry import library as cl
from su2_tpu.pallas import node_state as nst


@pytest.fixture(scope="module")
def pasr_sim(combustion_dir, tmp_path_factory):
    from su2_tpu.io import restart as rio

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "ref_restart_nochem.npz"))
    coords = np.zeros((fix["u"].shape[0], 2))
    tmp = tmp_path_factory.mktemp("nodestate")
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
    return sim, q


def _xla_chain(lib, lay, tparams, u, t_guess, tke):
    from su2_tpu.ops import viscous as vis
    uc, v, nonphys = st.cons2prim(lib, lay, u, t_guess, tparams, turb_ke=tke)
    dtdu = st.dtdu(lib, lay, v)
    dpdu = st.dpdu(lib, lay, v)
    t, ys = v[:, lay.T], v[:, lay.YS:lay.YS + lay.ns]
    mu = cl.mixture_viscosity(lib, t, ys)
    ka = cl.mixture_conductivity(lib, t, ys)
    xs = cl.molar_from_mass(lib, ys)
    return uc, v, nonphys, dtdu, dpdu, mu, ka, xs


def _compare(lib, lay, tparams, u, t_guess, tke):
    ref = _xla_chain(lib, lay, tparams, u, t_guess, tke)
    got = nst.node_state(lib, lay, tparams, u, t_guess, turb_ke=tke)
    names = ["u_clip", "v", "nonphys", "dtdu", "dpdu", "mu", "kappa", "xs"]
    for name, a, b in zip(names, ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if name == "nonphys":
            np.testing.assert_array_equal(a, b, err_msg=name)
            continue
        np.testing.assert_allclose(b, a, rtol=5e-12, atol=1e-300,
                                   err_msg=name)


def test_node_state_matches_chain(pasr_sim):
    sim, q = pasr_sim
    _compare(sim.lib, sim.lay, sim.tparams, sim.u0, sim.t0, q[:, 0])


def test_node_state_lite_matches_full(pasr_sim):
    """The reduced turb-phase variant (lite=True) returns bit-identical
    v/u/nonphys/mu/xs and gm1 == dpdu[:, RHOE] of the full kernel."""
    sim, q = pasr_sim
    lib, lay, tp = sim.lib, sim.lay, sim.tparams
    tke = q[:, 0]
    full = nst.node_state(lib, lay, tp, sim.u0, sim.t0, turb_ke=tke)
    lite = nst.node_state(lib, lay, tp, sim.u0, sim.t0, turb_ke=tke,
                          lite=True)
    uc, v, nonphys, gm1, mu, xs = lite
    np.testing.assert_array_equal(np.asarray(uc), np.asarray(full[0]))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(full[1]))
    np.testing.assert_array_equal(np.asarray(nonphys), np.asarray(full[2]))
    np.testing.assert_allclose(np.asarray(gm1),
                               np.asarray(full[4][:, lay.RHOE]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(full[5]),
                               rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(full[7]))


def test_node_state_bisection_path(pasr_sim):
    """Force most cells through the bisection fallback (secant budget 1)."""
    sim, q = pasr_sim
    tp = st.TSolveParams(secant_iters=1, secant_tol=1e-30)
    # bad initial guess so the single secant round fails
    t_guess = jnp.full_like(sim.t0, 4999.0)
    _compare(sim.lib, sim.lay, tp, sim.u0, t_guess, q[:, 0])


def test_node_state_nonphys_flags(pasr_sim):
    """Negative partial density and tiny rho are flagged like the chain."""
    sim, q = pasr_sim
    u = np.asarray(sim.u0).copy()
    u[3, sim.lay.RHOS] = -1.0e-4          # negative species density
    u[7, sim.lay.RHO] = 1.0e-20           # vanishing density
    _compare(sim.lib, sim.lay, sim.tparams, jnp.asarray(u), sim.t0, q[:, 0])


@pytest.mark.slow
def test_node_state_f32_split_tables(pasr_sim):
    """f32 path uses 3-level bf16 table splits (node_state._split3); the
    recovered spline values must match the f32 XLA chain to f32 roundoff."""
    sim, q = pasr_sim
    f32 = jnp.float32
    lib32 = jax.tree_util.tree_map(
        lambda x: x.astype(f32) if hasattr(x, "dtype")
        and jnp.issubdtype(x.dtype, jnp.floating) else x, sim.lib)
    u32 = sim.u0.astype(f32)
    t32 = sim.t0.astype(f32)
    tke32 = q[:, 0].astype(f32)
    ref = _xla_chain(lib32, sim.lay, sim.tparams, u32, t32, tke32)
    got = nst.node_state(lib32, sim.lay, sim.tparams, u32, t32,
                         turb_ke=tke32)
    names = ["u_clip", "v", "nonphys", "dtdu", "dpdu", "mu", "kappa", "xs"]
    for name, a, b in zip(names, ref, got):
        a, b = np.asarray(a), np.asarray(b)
        if name == "nonphys":
            np.testing.assert_array_equal(a, b, err_msg=name)
            continue
        # f32 secant/bisection trajectories can differ by an ulp per
        # lookup; fields agree to loose f32 tolerance
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-12,
                                   err_msg=name)
