"""LM transition model tests (CTransLMSolver capability — experimental in
the reference too; see turbulence/translm.py)."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.geometry.structured import channel_mesh


CFG = textwrap.dedent("""
    PHYSICAL_PROBLEM= NAVIER_STOKES
    KIND_TURB_MODEL= SA
    KIND_TRANS_MODEL= LM
    MACH_NUMBER= 0.2
    FREESTREAM_TEMPERATURE= 288.15
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TURBULENCEINTENSITY= 1.0
    REYNOLDS_NUMBER= 0.0
    MARKER_HEATFLUX= ( lower_wall, 0.0 )
    MARKER_EULER= ( upper_wall )
    MARKER_INLET= ( inlet, 290.0, 104000.0, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, 101325.0 )
    INLET_TYPE= TOTAL_CONDITIONS
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 2.0
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER_ITER= 5
    MESH_FILENAME= unused.su2
""")


def test_re_theta_correlation_limits():
    import jax.numpy as jnp
    from su2_tpu.turbulence import translm

    mu = jnp.asarray([1.8e-5])
    rho = jnp.asarray([1.2])
    vm = jnp.asarray([50.0])
    # zero pressure gradient: f_lambda = 1 -> closed-form value
    rt = np.asarray(translm.re_theta_correlation(
        1.0, None, mu, rho, vm, jnp.asarray([0.0])))
    assert abs(rt[0] - (1173.51 - 589.428 + 0.2196)) < 1e-6
    rt2 = np.asarray(translm.re_theta_correlation(
        2.0, None, mu, rho, vm, jnp.asarray([0.0])))
    assert abs(rt2[0] - 331.5 * (2.0 - 0.5658) ** (-0.671)) < 1e-6
    # never below the reference's floor
    rt3 = np.asarray(translm.re_theta_correlation(
        6.0, None, mu, rho, vm, jnp.asarray([0.0])))
    assert rt3[0] >= 20.0


def test_sa_lm_coupled_step_runs(tmp_path):
    from su2_tpu.driver import Simulation

    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=channel_mesh(13, 9, lx=0.5, ly=0.1))
        out = sim.run(5, quiet=True)
        u, t, hist, (q, mu_t, lm_state, gamma_eff) = out
    finally:
        os.chdir(cwd)
    assert np.isfinite(hist).all()
    assert np.isfinite(np.asarray(u)).all()
    lm = np.asarray(lm_state)
    assert (lm[:, 0] >= 0.0).all() and (lm[:, 0] <= 1.0 + 1e-5).all()
    assert (lm[:, 1] >= 20.0).all()
    ge = np.asarray(gamma_eff)
    assert np.isfinite(ge).all() and (ge >= 0).all()
    # near the freestream the flow stays (numerically) fully intermittent
    assert lm[:, 0].max() > 0.9
