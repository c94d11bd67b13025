"""Partitioned FSI driver tests (CFSIDriver::Run parity,
driver_structure.cpp:4172): pressurized channel over an elastic wall panel.

Geometry: 2D Euler channel over a thin solid panel whose top face coincides
with the flow's lower wall; the panel is clamped at both ends.  The traction
reference pressure (FREESTREAM_PRESSURE, CTransfer_FlowTraction uses
p - p_inf) is set BELOW the channel static pressure, so the converged flow
pushes the panel down with a nearly uniform ~6.3 kPa load — which makes the
coupled solution pinnable against clamped-clamped beam theory.
"""

import os
import textwrap
from dataclasses import replace as dc_replace

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.fsi import FSIDriver, StructuralZone
from su2_tpu.geometry.structured import channel_mesh

P_REF = 95000.0          # traction reference pressure
P_OUT = 101325.0         # outlet static = converged channel pressure
E_MOD, NU, THICK = 3.0e9, 0.3, 0.04

CFG_FLOW = textwrap.dedent(f"""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_PRESSURE= {P_REF}
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, {P_OUT} )
    INLET_TYPE= TOTAL_CONDITIONS
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 0.9
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_EXPLICIT
    MESH_FILENAME= unused.su2
""")


def _build_driver(tmp_path, **kw):
    flow_raw = channel_mesh(33, 13, lx=1.0, ly=0.3)
    # panel: 1.0 x 0.04 solid strip whose TOP face is the flow lower wall
    panel = channel_mesh(33, 4, lx=1.0, ly=THICK)
    panel = dc_replace(panel, coords=panel.coords - np.array([0.0, THICK]))
    struct = StructuralZone(raw=panel, e_mod=E_MOD, nu=NU,
                            clamp_tags=["inlet", "outlet"],
                            interface_tag="upper_wall")
    cfg_path = tmp_path / "flow.cfg"
    cfg_path.write_text(CFG_FLOW)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = Config(str(cfg_path))
    finally:
        os.chdir(cwd)

    def flow_factory(coords):
        return Simulation(cfg, raw_mesh=dc_replace(flow_raw,
                                                   coords=np.asarray(coords)))

    return FSIDriver(flow_factory, flow_raw, "lower_wall", struct, **kw)


def _beam_mid_deflection():
    """Clamped-clamped plane-strain plate, uniform load q = P_OUT - P_REF."""
    e_prime = E_MOD / (1.0 - NU * NU)
    inertia = THICK ** 3 / 12.0
    return (P_OUT - P_REF) * 1.0 ** 4 / (384.0 * e_prime * inertia)


@pytest.mark.slow
def test_fsi_converges_to_coupled_fixed_point(tmp_path):
    drv = _build_driver(tmp_path, n_fsi_iter=10, flow_iters=1200,
                        fsi_tol_orders=6.0)
    disp, (sim, u, t_guess, turb), hist = drv.run(quiet=True)

    # converged: interface displacement residual dropped 6 orders
    assert hist.log_res[-1] < -6.0, hist.log_res
    # deflection within the clamped-clamped beam-theory envelope (FEM
    # plane-strain panel is stiffer than Euler-Bernoulli; measured ~0.82x)
    tip = hist.tip[-1]
    w_beam = _beam_mid_deflection()
    assert 0.6 * w_beam < tip < 1.1 * w_beam, (tip, w_beam)
    # self-consistency at the fixed point: re-evaluating the full chain
    # (deform -> flow -> traction -> elasticity) reproduces disp
    from su2_tpu.solvers import elasticity
    loads = drv._transfer_loads(drv._wall_tractions(sim, u, t_guess, turb))
    d_chain = np.asarray(elasticity.solve_elasticity(
        drv.struct.raw, drv.struct.clamp_mask, np.zeros_like(disp),
        e_mod=drv.struct.e_mod, nu=drv.struct.nu, loads=loads,
        n_iter=drv.struct.n_cg_iter))
    assert np.abs(d_chain - disp).max() <= 1e-3 * tip
    # clamped ends stay clamped
    assert np.abs(disp[drv.struct.clamp_mask]).max() == 0.0


@pytest.mark.slow
def test_fsi_aitken_matches_fixed_relaxation_solution(tmp_path):
    """Aitken acceleration must converge to the SAME coupled solution as
    plain fixed-parameter under-relaxation (the monolithic fixed point is
    unique for this linear panel), in no more iterations."""
    drv_a = _build_driver(tmp_path, n_fsi_iter=12, flow_iters=1200,
                          relax_method="AITKEN_DYNAMIC", fsi_tol_orders=5.0)
    disp_a, _, hist_a = drv_a.run(quiet=True)
    it_a = len(hist_a.log_res)
    assert hist_a.log_res[-1] < -5.0, hist_a.log_res

    drv_f = _build_driver(tmp_path, n_fsi_iter=25, flow_iters=1200,
                          relax_method="FIXED_PARAMETER", aitken_init=0.4,
                          fsi_tol_orders=5.0)
    disp_f, _, hist_f = drv_f.run(quiet=True)

    assert hist_f.log_res[-1] < -5.0, hist_f.log_res
    scale = max(np.abs(disp_f).max(), 1e-30)
    assert np.abs(disp_a - disp_f).max() / scale < 1e-4
    assert it_a <= len(hist_f.log_res)
