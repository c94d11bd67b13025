"""FFD control-point design variables (CFreeFormDefBox / SetFFDCPChange_2D,
Common/src/grid_movement_structure.cpp:4116+)."""

import numpy as np

from su2_tpu import deform
from su2_tpu.config import Config


def _unit_box(deg=(3, 2)):
    return deform.FFDBox("BOX", [0, 0, 2, 0, 2, 1, 0, 1], list(deg), 2)


def test_bernstein_partition_of_unity():
    t = np.linspace(0, 1, 17)
    b = deform._bernstein_basis(5, t)
    np.testing.assert_allclose(b.sum(1), 1.0, rtol=1e-14)
    # endpoint interpolation
    assert b[0, 0] == 1.0 and b[-1, -1] == 1.0


def test_parametrize_inverts_corner_map():
    box = _unit_box()
    pts = np.array([[0.5, 0.25], [1.9, 0.9], [1.0, 0.5]])
    uvw, inside = box.parametrize(pts)
    np.testing.assert_allclose(box._lin(uvw), pts, atol=1e-10)
    assert inside.all()
    _, outside = box.parametrize(np.array([[3.0, 0.5]]))
    assert not outside.any()


def test_cp_displacement_moves_embedded_points_only():
    box = _unit_box()
    cp_disp = np.zeros(box.cp.shape)
    cp_disp[1, 1] = [0.0, 0.1]
    pts = np.array([[0.5, 0.5], [5.0, 5.0]])   # inside, outside
    d = box.displace(pts, cp_disp)
    assert d[0, 1] > 0.0 and d[0, 0] == 0.0
    np.testing.assert_array_equal(d[1], 0.0)
    # corners of the box do not move when an interior CP moves
    dc = box.displace(box.corners, cp_disp)
    np.testing.assert_allclose(dc, 0.0, atol=1e-14)


def test_ffd_config_and_surface_displacement(tmp_path):
    cfg = Config(text="""
PHYSICAL_PROBLEM= EULER
FFD_DEFINITION= (MAIN_BOX, 0.0, 0.0, 2.0, 0.0, 2.0, 1.0, 0.0, 1.0)
FFD_DEGREE= (3, 2)
DV_KIND= FFD_CONTROL_POINT_2D
DV_MARKER= ( airfoil )
DV_PARAM= ( MAIN_BOX, 1, 2, 0.0, 1.0 )
DV_VALUE= 0.05
""")
    assert cfg.ffd_definition[0][0] == "MAIN_BOX"
    assert cfg.ffd_degree[0] == [3, 2]
    boxes = deform.build_ffd_boxes(cfg, 2)
    dvs, tags = deform.parse_dv_options(cfg)
    assert dvs[0]["kind"] == "FFD_CONTROL_POINT_2D"
    assert tags == ["airfoil"]

    coords = np.array([[0.5, 0.95], [1.0, 0.98], [1.5, 0.95], [0.5, 0.05]])
    nodes = np.arange(4)
    disp = deform.surface_displacement(coords, nodes, dvs, ffd_boxes=boxes,
                                       ffd_scale=cfg.ffd_scale)
    # CP (1, 2) sits on the upper edge near x=2/3: upper-surface points move
    # up, the lower-surface point barely moves
    assert disp[0, 1] > 1e-4
    assert disp[1, 1] > 1e-4
    assert abs(disp[3, 1]) < disp[0, 1] * 0.2
    assert np.all(disp[:, 0] == 0.0)


def test_ffd_3d_box():
    corners = [0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0,
               0, 0, 1, 1, 0, 1, 1, 1, 1, 0, 1, 1]
    box = deform.FFDBox("B3", corners, [2, 2, 2], 3)
    cp_disp = np.zeros(box.cp.shape)
    cp_disp[1, 1, 1] = [0.0, 0.0, 0.2]
    pts = np.array([[0.5, 0.5, 0.5], [2.0, 2.0, 2.0]])
    d = box.displace(pts, cp_disp)
    assert d[0, 2] > 0.0
    np.testing.assert_array_equal(d[1], 0.0)
