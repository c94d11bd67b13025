"""Mesh-deformation (SU2_DEF) + sensitivity-projection (SU2_DOT) tests."""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu import deform
from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from su2_tpu.geometry.structured import channel_mesh
from su2_tpu.io.mesh import read_su2_mesh, write_su2_mesh


def test_hicks_henne_bump_properties():
    xs = np.linspace(0, 1, 101)
    f = deform.hicks_henne(xs, 0.5)
    assert abs(f[50] - 1.0) < 1e-12          # max at x_loc
    assert f[0] == 0.0 and abs(f[-1]) < 1e-12
    f3 = deform.hicks_henne(xs, 0.3)
    assert abs(xs[np.argmax(f3)] - 0.3) < 0.02


def test_spring_deformation_smooth_and_bounded():
    raw = channel_mesh(13, 9, lx=1.0, ly=0.4)
    grid = build_dual_grid(raw)
    mesh = mesh_arrays(grid)
    nodes = np.asarray(grid.bnd_nodes["lower_wall"])
    disp = deform.surface_displacement(
        raw.coords, nodes,
        [{"kind": "HICKS_HENNE", "up": 1, "x_loc": 0.5, "value": 0.02}])
    new_coords = np.asarray(deform.deform_coords(mesh, disp, n_iter=400))
    moved = new_coords - raw.coords
    # boundary nodes moved exactly as prescribed
    np.testing.assert_allclose(moved[nodes], disp[nodes], atol=1e-9)
    # other boundaries pinned
    up = np.asarray(grid.bnd_nodes["upper_wall"])
    np.testing.assert_allclose(moved[up], 0.0, atol=1e-9)
    # interior motion bounded by the max surface motion, decays with distance
    assert np.abs(moved).max() <= np.abs(disp).max() + 1e-9
    # all dual volumes stay positive after deformation
    raw2 = channel_mesh(13, 9, lx=1.0, ly=0.4)
    raw2.coords[:] = new_coords
    g2 = build_dual_grid(raw2)
    assert g2.volume.min() > 0.0


def test_su2_def_cli_roundtrip(tmp_path):
    """SU2_DEF equivalent writes a readable mesh with the bump applied."""
    raw = channel_mesh(9, 7, lx=1.0, ly=0.4)
    mesh_path = tmp_path / "chan.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_text = textwrap.dedent(f"""
        MESH_FILENAME= {mesh_path}
        MESH_OUT_FILENAME= {tmp_path}/chan_def.su2
        DV_KIND= HICKS_HENNE
        DV_MARKER= ( lower_wall )
        DV_PARAM= ( 1, 0.5 )
        DV_VALUE= 0.01
        DEFORM_LINEAR_ITER= 300
    """)
    cfg_path = tmp_path / "def.cfg"
    cfg_path.write_text(cfg_text)
    from su2_tpu.tooling import deform as su2def
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        su2def.run(Config(str(cfg_path)))
    finally:
        os.chdir(cwd)
    out = read_su2_mesh(str(tmp_path / "chan_def.su2"))
    assert out.npoint == raw.npoint and out.nelem == raw.nelem
    dy = out.coords[:, 1] - raw.coords[:, 1]
    assert dy.max() > 0.005                   # the bump is there
    g = build_dual_grid(out)
    assert g.volume.min() > 0.0


def test_dot_projection_matches_manual_sum(tmp_path):
    raw = channel_mesh(9, 7)
    grid = build_dual_grid(raw)
    mesh_path = tmp_path / "chan.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_text = textwrap.dedent(f"""
        MESH_FILENAME= {mesh_path}
        DV_KIND= HICKS_HENNE, HICKS_HENNE
        DV_MARKER= ( lower_wall )
        DV_PARAM= ( 1, 0.3 ); ( 1, 0.7 )
        DV_VALUE= 0.0, 0.0
    """)
    cfg_path = tmp_path / "dot.cfg"
    cfg_path.write_text(cfg_text)
    rng = np.random.default_rng(0)
    sens = rng.normal(size=raw.coords.shape)
    from su2_tpu.tooling import dot as su2dot
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        grads = su2dot.run(Config(str(cfg_path)), raw=raw, sens=sens)
    finally:
        os.chdir(cwd)
    assert len(grads) == 2
    nodes = np.asarray(grid.bnd_nodes["lower_wall"])
    for k, xl in enumerate((0.3, 0.7)):
        disp = deform.surface_displacement(
            raw.coords, nodes,
            [{"kind": "HICKS_HENNE", "up": 1, "x_loc": xl, "value": 1.0}])
        assert abs(grads[k] - (disp * sens).sum()) < 1e-12
    assert os.path.exists(tmp_path / "of_grad.dat")
