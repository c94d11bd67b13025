"""Grid-adaptation (CGridAdaptation / SU2_MSH) tests."""

import textwrap

import numpy as np
import pytest

from su2_tpu import adapt
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.io.mesh import RawMesh


def test_full_refinement_quads():
    raw = channel_mesh(9, 7, lx=1.0, ly=0.4)
    refined, parent, _ = adapt.refine_full(raw)
    assert refined.nelem == 4 * raw.nelem
    assert len(parent) == refined.nelem
    # area conserved
    g0 = build_dual_grid(raw)
    g1 = build_dual_grid(refined)
    assert abs(g1.volume.sum() - g0.volume.sum()) < 1e-12
    # markers refined 2x and still watertight (CV closure via builder)
    for tag in raw.markers:
        assert len(refined.markers[tag]) == 2 * len(raw.markers[tag])


def test_full_refinement_triangles():
    # split each channel quad into 2 triangles first
    raw = channel_mesh(6, 5)
    tris = []
    for q in raw.elem_nodes:
        a, b, c, d = (int(x) for x in q[:4])
        tris.append([a, b, c])
        tris.append([a, c, d])
    raw_t = RawMesh(ndim=2, coords=raw.coords,
                    elem_types=np.full(len(tris), 5, dtype=np.int32),
                    elem_nodes=np.asarray(tris), markers=raw.markers,
                    marker_types=raw.marker_types)
    refined, _, _ = adapt.refine_full(raw_t)
    assert refined.nelem == 4 * raw_t.nelem
    g0 = build_dual_grid(raw_t)
    g1 = build_dual_grid(refined)
    assert abs(g1.volume.sum() - g0.volume.sum()) < 1e-12
    assert g1.volume.min() > 0


def test_prolongation_preserves_linear_field():
    raw = channel_mesh(7, 5)
    refined, _, node_parents = adapt.refine_full(raw)
    u = (2.0 * raw.coords[:, 0] - raw.coords[:, 1])[:, None]
    up = adapt.prolong_solution(raw, refined, u, node_parents)
    exact = (2.0 * refined.coords[:, 0] - refined.coords[:, 1])[:, None]
    # old nodes exact; new nodes are parent means (exact for edge midpoints,
    # exact for quad centers of linear fields)
    np.testing.assert_allclose(up, exact, atol=1e-12)


def test_su2_msh_cli(tmp_path):
    from su2_tpu.config import Config
    from su2_tpu.io.mesh import read_su2_mesh, write_su2_mesh
    from su2_tpu.tooling import msh as su2msh

    raw = channel_mesh(6, 5)
    mesh_path = tmp_path / "c.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg = Config(text=textwrap.dedent(f"""
        MESH_FILENAME= {mesh_path}
        MESH_OUT_FILENAME= {tmp_path}/c_adapted.su2
        KIND_ADAPT= FULL
    """))
    refined, parent = su2msh.run(cfg)
    back = read_su2_mesh(str(tmp_path / "c_adapted.su2"))
    assert back.nelem == refined.nelem == 4 * raw.nelem
    assert back.npoint == refined.npoint


def test_refined_mesh_runs_euler(tmp_path):
    """A refined mesh must run through the flow solver unchanged."""
    import os
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    raw = channel_mesh(6, 5, lx=1.0, ly=0.5)
    refined, _, _ = adapt.refine_full(raw)
    cfg_path = tmp_path / "case.cfg"
    cfg_path.write_text(textwrap.dedent("""
        PHYSICAL_PROBLEM= EULER
        MACH_NUMBER= 0.4
        FREESTREAM_PRESSURE= 101325.0
        FREESTREAM_TEMPERATURE= 288.15
        MARKER_FAR= ( inlet, outlet, lower_wall, upper_wall )
        CFL_NUMBER= 4.0
        CONV_NUM_METHOD_FLOW= ROE
        TIME_DISCRE_FLOW= EULER_IMPLICIT
        LINEAR_SOLVER_ITER= 5
        MESH_FILENAME= unused.su2
    """))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sim = Simulation(Config(str(cfg_path)), raw_mesh=refined)
        _, _, hist = sim.run(2, quiet=True)
    finally:
        os.chdir(cwd)
    assert hist[-1][sim.lay.RHO] < -10.0
