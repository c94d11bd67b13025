"""US-units tests: a US config must give identical dimensionless results to
its hand-converted SI twin (SYSTEM_MEASUREMENTS handling, units.py)."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.units import FT_PER_M, PSF_TO_PA, R_PER_K, us_config_to_si


def test_config_conversion_factors():
    cfg = Config(text=textwrap.dedent("""
        SYSTEM_MEASUREMENTS= US
        FREESTREAM_TEMPERATURE= 518.67
        FREESTREAM_PRESSURE= 2116.2
        GAS_CONSTANT= 1716.49
        MARKER_OUTLET= ( outlet, 2116.2 )
        MARKER_ISOTHERMAL= ( wall, 540.0 )
    """))
    us_config_to_si(cfg)
    assert abs(cfg.freestream_temperature - 518.67 / 1.8) < 1e-10
    assert abs(cfg.freestream_pressure - 2116.2 * PSF_TO_PA) < 1e-6
    # R_air: 1716.49 ft^2/(s^2 R) -> ~287.05 J/(kg K)
    assert abs(cfg.gas_constant - 287.05) < 0.2
    assert abs(cfg.marker_outlet["outlet"] - 2116.2 * PSF_TO_PA) < 1e-6
    assert abs(cfg.marker_isothermal["wall"] - 300.0) < 1e-9
    # idempotent
    t0 = cfg.freestream_temperature
    us_config_to_si(cfg)
    assert cfg.freestream_temperature == t0


CFG_US = """
    PHYSICAL_PROBLEM= EULER
    SYSTEM_MEASUREMENTS= US
    MACH_NUMBER= 0.3
    FREESTREAM_TEMPERATURE= 518.67
    FREESTREAM_PRESSURE= 2116.2
    GAS_CONSTANT= 1716.49
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_INLET= ( inlet, 528.0, 2251.0, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, 2116.2 )
    INLET_TYPE= TOTAL_CONDITIONS
    CFL_NUMBER= 5.0
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER_ITER= 5
    MESH_FILENAME= unused.su2
"""

CFG_SI = """
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    TEMPERATURE_MIN= {tmin}
    TEMPERATURE_MAX= {tmax}
    FREESTREAM_TEMPERATURE= {t_inf}
    FREESTREAM_PRESSURE= {p_inf}
    GAS_CONSTANT= {rgas}
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_INLET= ( inlet, {t_in}, {p_in}, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, {p_out} )
    INLET_TYPE= TOTAL_CONDITIONS
    CFL_NUMBER= 5.0
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER_ITER= 5
    MESH_FILENAME= unused.su2
"""


def test_us_run_matches_si_twin(tmp_path):
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh

    si = CFG_SI.format(t_inf=518.67 / R_PER_K, p_inf=2116.2 * PSF_TO_PA,
                       rgas=1716.49 / FT_PER_M ** 2 * R_PER_K,
                       t_in=528.0 / R_PER_K, p_in=2251.0 * PSF_TO_PA,
                       p_out=2116.2 * PSF_TO_PA,
                       tmin=200.0 / R_PER_K, tmax=6000.0 / R_PER_K)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        hists = []
        for text in (CFG_US, si):
            sim = Simulation(Config(text=textwrap.dedent(text)),
                             raw_mesh=channel_mesh(9, 7, lx=1.0, ly=0.4))
            _, _, hist = sim.run(5, quiet=True)
            hists.append(hist)
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(hists[0], hists[1], rtol=1e-12)


def test_coefficients_scale_invariant(tmp_path):
    """Dimensionless outputs are invariant to the pressure scale — the
    basis for supporting REF_DIMENSIONALIZATION by internal-dimensional
    running (documented in units.py)."""
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh

    base = """
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.3
        FREESTREAM_TEMPERATURE= 288.15
        FREESTREAM_PRESSURE= {p}
        MARKER_EULER= ( lower_wall, upper_wall )
        MARKER_FAR= ( inlet, outlet )
        MARKER_MONITORING= ( lower_wall )
        CFL_NUMBER= 5.0
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER_ITER= 5
        MESH_FILENAME= unused.su2
    """
    cls = []
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        for p in (101325.0, 1.0):
            sim = Simulation(Config(text=textwrap.dedent(base.format(p=p))),
                             raw_mesh=channel_mesh(9, 7, lx=1.0, ly=0.4))
            u, t, _ = sim.run(5, quiet=True)
            f = sim.monitor_forces(u, t)
            cls.append((f["CL"], f["CD"]))
    finally:
        os.chdir(cwd)
    np.testing.assert_allclose(cls[0], cls[1], rtol=1e-9, atol=1e-12)
