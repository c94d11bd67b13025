"""Standard-solver nacelle BCs (round-4 verdict item 9, implement branch):
BC_Engine_Inflow / BC_Engine_Exhaust (solver_direct_mean.cpp:12726/:12944).

The exhaust is a total-conditions inflow with the given (Tt, Pt) and flow
along the inward surface normal; the fan-face inflow with
FAN_FACE_PRESSURE is the subsonic pressure-outlet characteristic update
with the target back pressure.  Validated by BC-equivalence on a straight
duct where both reductions are exact; the FAN_FACE_MACH/MDOT damped
controller modes raise loudly (documented in COVERAGE.md).
"""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import channel_mesh

BASE = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_EULER= ( lower_wall, upper_wall )
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 4.0
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ERROR= 1e-8
    LINEAR_SOLVER_ITER= 10
""")


def _run(tmp_path, name, extra, n=60):
    p = tmp_path / f"{name}.cfg"
    p.write_text(BASE + extra)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(p)),
                         raw_mesh=channel_mesh(17, 9, lx=1.0, ly=0.3))
        u, t, hist = sim.run(n, quiet=True)
    finally:
        os.chdir(cwd)
    return sim, np.asarray(u), np.asarray(hist)


def test_engine_exhaust_equals_total_conditions_inlet(tmp_path):
    """On a straight duct the exhaust's inward-normal flow direction IS
    +x, so MARKER_ENGINE_EXHAUST must reproduce the TOTAL_CONDITIONS
    inlet run bitwise."""
    inlet = ("MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )\n"
             "INLET_TYPE= TOTAL_CONDITIONS\n"
             "MARKER_OUTLET= ( outlet, 101325.0 )\n")
    exhaust = ("MARKER_ENGINE_EXHAUST= ( inlet, 293.3, 107800.0 )\n"
               "MARKER_OUTLET= ( outlet, 101325.0 )\n")
    _, u_ref, h_ref = _run(tmp_path, "tc", inlet)
    _, u_ex, h_ex = _run(tmp_path, "ex", exhaust)
    assert np.isfinite(u_ex).all()
    sc = np.abs(u_ref).max(axis=0)
    assert (np.abs(u_ex - u_ref) / sc[None, :]).max() < 1e-12
    np.testing.assert_allclose(h_ex, h_ref, atol=1e-10)


def test_engine_inflow_fan_face_pressure_equals_outlet(tmp_path):
    """FAN_FACE_PRESSURE fan-face == pressure outlet with the target."""
    base_in = ("MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )\n"
               "INLET_TYPE= TOTAL_CONDITIONS\n")
    outlet = base_in + "MARKER_OUTLET= ( outlet, 101325.0 )\n"
    fanface = base_in + ("MARKER_ENGINE_INFLOW= ( outlet, 101325.0 )\n"
                         "ENGINE_INFLOW_TYPE= FAN_FACE_PRESSURE\n")
    _, u_ref, _ = _run(tmp_path, "out", outlet)
    _, u_ff, _ = _run(tmp_path, "ff", fanface)
    sc = np.abs(u_ref).max(axis=0)
    assert (np.abs(u_ff - u_ref) / sc[None, :]).max() < 1e-12


def test_engine_inflow_controller_modes_raise(tmp_path):
    extra = ("MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )\n"
             "INLET_TYPE= TOTAL_CONDITIONS\n"
             "MARKER_ENGINE_INFLOW= ( outlet, 0.6 )\n"
             "ENGINE_INFLOW_TYPE= FAN_FACE_MACH\n")
    p = tmp_path / "mach.cfg"
    p.write_text(BASE + extra)
    with pytest.raises(NotImplementedError, match="FAN_FACE"):
        Simulation(Config(str(p)),
                   raw_mesh=channel_mesh(9, 5, lx=1.0, ly=0.3))
