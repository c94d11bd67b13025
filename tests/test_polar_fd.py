"""SU2_PY workflow breadth: polar sweep (compute_polar.py) and
finite-difference design gradients (finite_differences.py)."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config

CFG = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_EULER= ( airfoil )
    MARKER_FAR= ( farfield )
    MARKER_MONITORING= ( airfoil )
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 8.0
    CONV_NUM_METHOD_FLOW= ROE
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ITER= 8
    LINEAR_SOLVER_ERROR= 1e-6
    EXT_ITER= 400
""")


@pytest.mark.slow
def test_polar_sweep_naca(tmp_path):
    """AOA sweep on the NACA0012 O-mesh: CL monotone in alpha, antisymmetric
    for the symmetric airfoil, and the polar file is written."""
    from su2_tpu.geometry.structured import naca_omesh
    from su2_tpu.io.mesh import write_su2_mesh
    from su2_tpu.tooling import polar

    raw = naca_omesh(n_wrap=65, n_rad=33, radius=10.0)
    mesh_path = tmp_path / "naca.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_path = tmp_path / "polar.cfg"
    cfg_path.write_text(CFG + f"MESH_FILENAME= {mesh_path}\n")
    out_path = tmp_path / "polar.dat"
    rows = polar.run(str(cfg_path), aoa0=-2.0, aoa1=2.0, n=3, niter=400,
                     out_path=str(out_path), raw=raw)
    aoas = [r[0] for r in rows]
    cls = [r[1] for r in rows]
    assert aoas == [-2.0, 0.0, 2.0]
    assert cls[0] < cls[1] < cls[2]
    # symmetric airfoil: CL(0) ~ 0, CL(-a) ~ -CL(a)
    assert abs(cls[1]) < 0.02
    assert abs(cls[0] + cls[2]) < 0.05 * abs(cls[2] - cls[0])
    assert out_path.exists()
    data = np.loadtxt(out_path, skiprows=1)
    assert data.shape == (3, 4)


@pytest.mark.slow
def test_fd_gradient_matches_adjoint(tmp_path):
    """Central-difference DV gradient (finite_differences.py route) agrees
    with the in-process discrete-adjoint gradient on a Hicks-Henne DV."""
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.io.mesh import write_su2_mesh
    from su2_tpu.tooling import fd_grad
    from su2_tpu.tooling.opt import ShapeProblem

    raw = channel_mesh(9, 5, lx=1.0, ly=0.4)
    mesh_path = tmp_path / "chan.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_text = textwrap.dedent(f"""
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
        CFL_NUMBER= 8.0
        CONV_NUM_METHOD_FLOW= AUSM
        SPATIAL_ORDER_FLOW= 1ST_ORDER
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER= FGMRES
        LINEAR_SOLVER_PREC= LU_SGS
        LINEAR_SOLVER_ITER= 20
        LINEAR_SOLVER_ERROR= 1e-10
        OBJECTIVE_FUNCTION= LIFT
        DV_KIND= HICKS_HENNE
        DV_MARKER= ( lower_wall )
        DV_PARAM= ( 1, 0.5 )
        DV_VALUE= 0.0
        DEFORM_LINEAR_ITER= 200
        EXT_ITER= 300
        MESH_FILENAME= {mesh_path}
    """)
    cfg_path = tmp_path / "fd.cfg"
    cfg_path.write_text(cfg_text)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        cfg = Config(str(cfg_path))
        g_fd = fd_grad.run(cfg, step=2e-4, raw=raw, n_primal=300,
                           out_path=str(tmp_path / "of_grad_fd.dat"))
        _, g_adj = ShapeProblem(cfg, raw=raw, n_primal=300).evaluate([0.0])
    finally:
        os.chdir(cwd)
    assert np.isfinite(g_fd).all()
    rel = abs(g_fd[0] - g_adj[0]) / max(abs(g_adj[0]), 1e-12)
    assert rel < 0.05, (g_fd, g_adj)
