"""Wind-gust Field Velocity Method (su2_tpu/gust.py; reference
SetWind_GustField, iteration_structure.cpp:657-850 — the v5 reference's
gust derivatives are all commented out, so the capability is FVM with
gust shapes imposed as negative grid velocity)."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu import gust
import jax.numpy as jnp


def test_gust_shapes_match_reference_formulas():
    coords = jnp.asarray(np.stack([np.linspace(-1, 3, 200),
                                   np.zeros(200)], axis=1))
    common = dict(uinf=10.0, ampl=2.0, wavelength=1.0, periods=1.0,
                  begin_time=0.0, begin_loc=0.0, gust_dir=1)
    t = 0.05
    xg = (np.asarray(coords[:, 0]) - 10.0 * t) / 1.0
    inside = (xg > 0) & (xg < 1)
    g = np.asarray(gust.gust_velocity("SINE", coords, t, **common))
    expect = np.where(inside, 2.0 * np.sin(2 * np.pi * xg), 0.0)
    np.testing.assert_allclose(g[:, 1], expect, atol=1e-12)
    assert np.all(g[:, 0] == 0.0)
    g = np.asarray(gust.gust_velocity("ONE_M_COSINE", coords, t, **common))
    expect = np.where(inside, 2.0 * (1 - np.cos(2 * np.pi * xg)), 0.0)
    np.testing.assert_allclose(g[:, 1], expect, atol=1e-12)
    g = np.asarray(gust.gust_velocity("TOP_HAT", coords, t, **common))
    np.testing.assert_allclose(g[:, 1], np.where(inside, 2.0, 0.0),
                               atol=1e-12)
    g = np.asarray(gust.gust_velocity("EOG", coords, t, **common))
    expect = np.where(inside, -0.37 * 2.0 * np.sin(3 * np.pi * xg)
                      * (1 - np.cos(2 * np.pi * xg)), 0.0)
    np.testing.assert_allclose(g[:, 1], expect, atol=1e-12)
    with pytest.raises(NotImplementedError):
        gust.gust_velocity("VORTEX", coords, t, **common)


@pytest.mark.slow
def test_gust_lift_response_naca(tmp_path):
    """A vertical ONE_M_COSINE gust convecting over a NACA0012 at zero
    incidence produces a transient lift pulse of the gust's sign (Kussner
    problem qualitatively): CL rises while the gust occupies the airfoil
    and relaxes after it passes."""
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import naca_omesh

    v_inf = 0.3 * np.sqrt(1.4 * 287.058 * 288.15)
    cfg_text = textwrap.dedent(f"""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= 101325.0
        MARKER_EULER= ( airfoil )
        MARKER_FAR= ( farfield )
        MARKER_MONITORING= ( airfoil )
        CFL_NUMBER= 8.0
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 8
        LINEAR_SOLVER_ERROR= 1e-6
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        NUM_METHOD_GRAD= GREEN_GAUSS
        WIND_GUST= YES
        GUST_TYPE= ONE_M_COSINE
        GUST_DIR= Y_DIR
        GUST_AMPL= {0.02 * v_inf}
        GUST_WAVELENGTH= 4.0
        GUST_PERIODS= 1.0
        GUST_BEGIN_TIME= 0.0
        GUST_BEGIN_LOC= -4.5
        UNST_TIMESTEP= {1.0 / v_inf}
        MESH_FILENAME= unused.su2
    """)
    cfg_path = tmp_path / "gust.cfg"
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=naca_omesh(n_wrap=49, n_rad=25,
                                             radius=8.0))
    finally:
        os.chdir(cwd)
    u0, t0, _ = sim.run(250, quiet=True, chunk=50)
    sim.u0, sim.t0 = u0, t0
    f0 = sim.monitor_forces(u0, t0)
    cl0 = float(f0["CL"])

    # gust travels 1 chord per step; 4-chord gust starting 4.5 ahead:
    # 10 steps cover approach + passage over the chord
    u, t, hist = gust.run_gust(sim, n_steps=10, n_inner=100)
    assert np.isfinite(hist).all()
    cls = hist[:, 1] - cl0
    # upward gust (positive v) -> positive incremental lift at its peak
    assert cls.max() > 5e-3, cls
    # and the response is a transient, not a runaway
    assert abs(cls[0]) < 0.5 * cls.max()
    assert np.abs(cls).max() < 1.0
