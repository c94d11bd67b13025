"""ADT search, interpolation/transfer, and SU2_GEO evaluation tests."""

import numpy as np
import pytest

from su2_tpu.geometry.adt import ADT
from su2_tpu import transfer


def test_adt_matches_brute_force():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 2))
    qs = rng.normal(size=(60, 2))
    tree = ADT(pts)
    idx, dist = tree.query(qs)
    d2 = ((pts[None, :, :] - qs[:, None, :]) ** 2).sum(-1)
    ref = d2.argmin(axis=1)
    np.testing.assert_array_equal(idx, ref)
    np.testing.assert_allclose(dist, np.sqrt(d2.min(axis=1)), rtol=1e-12)


def test_adt_3d():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(300, 3))
    qs = rng.normal(size=(20, 3))
    idx, _ = ADT(pts).query(qs)
    d2 = ((pts[None] - qs[:, None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d2.argmin(axis=1))


def test_nearest_neighbor_transfer_exact_on_coincident_points():
    rng = np.random.default_rng(2)
    donor = rng.normal(size=(40, 2))
    interp = transfer.nearest_neighbor(donor, donor[::2])
    field = rng.normal(size=(40, 3))
    out = np.asarray(transfer.transfer_field(interp, field))
    np.testing.assert_allclose(out, field[::2], rtol=1e-12)


def test_isoparametric_reproduces_linear_field():
    # donor: line y=0 sampled at 11 points; targets between samples
    xs = np.linspace(0.0, 1.0, 11)
    donor = np.stack([xs, np.zeros_like(xs)], axis=1)
    lines = np.stack([np.arange(10), np.arange(1, 11)], axis=1)
    tx = np.linspace(0.03, 0.97, 17)
    targets = np.stack([tx, np.zeros_like(tx)], axis=1)
    interp = transfer.isoparametric_lines(donor, lines, targets)
    field = 3.0 * xs + 1.0                       # linear in x
    out = np.asarray(transfer.transfer_field(interp, field))
    np.testing.assert_allclose(out, 3.0 * tx + 1.0, rtol=1e-12)


def test_su2_geo_on_circle(tmp_path):
    """Section properties of a unit-diameter circle: area pi/4, chord 1,
    thickness(50%) = 1."""
    import textwrap
    import os
    from su2_tpu.config import Config
    from su2_tpu.tooling import geo as su2geo
    from su2_tpu.io.mesh import RawMesh

    th = np.linspace(0, 2 * np.pi, 101)[:-1]
    ring = 0.5 * np.stack([np.cos(th), np.sin(th)], axis=1)
    # annulus mesh: inner ring = "airfoil" marker; add outer ring of quads
    outer = 1.5 * ring
    coords = np.concatenate([ring, outer])
    n = len(ring)
    elems = []
    for k in range(n):
        k2 = (k + 1) % n
        elems.append([k, k2, n + k2, n + k])
    inner = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    outer_m = np.stack([n + (np.arange(n) + 1) % n, n + np.arange(n)], axis=1)
    raw = RawMesh(ndim=2, coords=coords,
                  elem_types=np.full(n, 9, dtype=np.int32),
                  elem_nodes=np.asarray(elems),
                  markers={"airfoil": inner, "far": outer_m},
                  marker_types={"airfoil": np.full(n, 3, np.int32),
                                "far": np.full(n, 3, np.int32)})
    from su2_tpu.io.mesh import write_su2_mesh
    mesh_path = tmp_path / "circle.su2"
    write_su2_mesh(raw, str(mesh_path))
    cfg_path = tmp_path / "geo.cfg"
    cfg_path.write_text(textwrap.dedent(f"""
        MESH_FILENAME= {mesh_path}
        DV_MARKER= ( airfoil )
        DV_KIND= HICKS_HENNE
        DV_PARAM= ( 1, 0.5 )
        DV_VALUE= 0.0
    """))
    funcs, grads = su2geo.run(Config(str(cfg_path)))
    assert abs(funcs["AREA"] - np.pi / 4) < 2e-3
    assert abs(funcs["CHORD"] - 1.0) < 1e-3
    assert abs(funcs["THICKNESS_50"] - 1.0) < 2e-3
    assert 0 in grads and np.isfinite(grads[0]["MAX_THICKNESS"])
