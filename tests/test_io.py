import os

import numpy as np

from su2_tpu.io import restart as rio
from su2_tpu.io.output import HistoryWriter


def test_restart_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.normal(0, 1, (50, 2))
    u = rng.normal(0, 1, (50, 13))
    turb = rng.normal(0, 1, (50, 2))
    path = str(tmp_path / "restart_flow.dat")
    rio.write_restart(path, coords, u, turb,
                      extras={"Pressure": rng.normal(0, 1, 50)})
    u2, t2 = rio.read_restart(path, 2, 13, 2)
    np.testing.assert_allclose(u2, u, rtol=1e-12)
    np.testing.assert_allclose(t2, turb, rtol=1e-12)


def test_history_format(tmp_path):
    path = str(tmp_path / "history.dat")
    hw = HistoryWriter(path, 13, 2, cfl=0.1)
    hw.write(0, np.arange(13, dtype=float) - 5.0, np.array([-1.0, 2.0]),
             forces={"CL": 0.1, "CD": 0.05}, lin_iters=5)
    lines = open(path).read().splitlines()
    assert lines[0].startswith("TITLE")
    # exactly 5 flow residual columns like the reference
    assert lines[1].count("Res_Flow") == 5
    assert lines[1].count("Res_Turb") == 2
    assert lines[2].startswith("ZONE")
    vals = [float(x) for x in lines[3].split(",")]
    nexpect = 13 + 5 + 2 + 3
    assert len(vals) == nexpect


def test_fieldview_writer(tmp_path):
    """FieldView ASCII (.uns): 2D extrusion to prisms/hexes, node counts and
    variable blocks consistent (SetFieldViewASCII layout)."""
    import numpy as np
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.io.output import write_fieldview_volume

    raw = channel_mesh(5, 4)
    fields = {"Density": np.linspace(1.0, 2.0, raw.npoint),
              "Pressure": np.full(raw.npoint, 101325.0)}
    p = tmp_path / "flow.uns"
    write_fieldview_volume(str(p), raw, fields, mach=0.3)
    txt = p.read_text().splitlines()
    assert txt[0] == "FIELDVIEW 3 0"
    assert f"Nodes\t{2 * raw.npoint}" in txt
    assert "Variable Names\t2" in txt
    ivars = txt.index("Variables")
    var_lines = [t for t in txt[ivars + 1:] if t]
    assert len(var_lines) == 2 * 2 * raw.npoint    # 2 vars x 2 layers
    # hex elements: one per quad, 8 nodes + type/count prefix
    elems = [t for t in txt if t.startswith("2\t1\t")]
    assert len(elems) == raw.nelem
    assert all(len(e.split("\t")) == 10 for e in elems)


def test_tecplot_binary_writer(tmp_path):
    """Binary Tecplot (classic TDV112, output_tecplot.cpp TecIO-branch
    capability): header magic, variable registry, zone record, block data
    and degenerate-quad connectivity all parse back."""
    import struct
    import numpy as np
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.io.output import write_tecplot_binary_volume

    raw = channel_mesh(5, 4)
    rho = np.linspace(1.0, 2.0, raw.npoint)
    fields = {"Density": rho,
              "Pressure": np.full(raw.npoint, 101325.0)}
    p = tmp_path / "flow.plt"
    write_tecplot_binary_volume(str(p), raw, fields)
    buf = p.read_bytes()
    assert buf[:8] == b"#!TDV112"
    off = 8

    def ints(k):
        nonlocal off
        out = struct.unpack_from(f"<{k}i", buf, off)
        off += 4 * k
        return out

    def string():
        nonlocal off
        chars = []
        while True:
            (c,) = struct.unpack_from("<i", buf, off)
            off += 4
            if c == 0:
                return "".join(map(chr, chars))
            chars.append(c)

    assert ints(1) == (1,)          # byte order
    assert ints(1) == (0,)          # full file
    string()                        # title
    (nvar,) = ints(1)
    names = [string() for _ in range(nvar)]
    assert names == ["x", "y", "Density", "Pressure"]
    (marker,) = struct.unpack_from("<f", buf, off); off += 4
    assert marker == 299.0
    assert string() == "Zone"
    assert ints(2) == (-1, -2)      # parent, strand
    off += 8                        # solution time
    ints(1)                         # not used
    assert ints(1) == (3,)          # FEQUADRILATERAL
    ints(3)
    npts, nelem = ints(2)
    assert (npts, nelem) == (raw.npoint, raw.nelem)
    ints(3); ints(1)
    (eoh,) = struct.unpack_from("<f", buf, off); off += 4
    assert eoh == 357.0
    (marker,) = struct.unpack_from("<f", buf, off); off += 4
    assert marker == 299.0
    assert ints(nvar) == (2,) * nvar       # doubles
    assert ints(3) == (0, 0, -1)
    minmax = struct.unpack_from(f"<{2*nvar}d", buf, off); off += 16 * nvar
    assert minmax[4] == 1.0 and minmax[5] == 2.0      # Density range
    data = np.frombuffer(buf, "<f8", nvar * npts, off)
    off += 8 * nvar * npts
    np.testing.assert_array_equal(data[2 * npts:3 * npts], rho)
    conn = np.frombuffer(buf, "<i4", 4 * nelem, off)
    off += 16 * nelem
    assert conn.min() == 0 and conn.max() == raw.npoint - 1
    assert off == len(buf)


def test_cgns_writer(tmp_path):
    """CGNS HDF5-flavor volume file (output_cgns.cpp capability): the SIDS
    node tree, coordinates, MIXED connectivity and solution arrays read
    back with h5py."""
    import numpy as np
    import h5py
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.io.cgns_out import write_cgns_volume

    raw = channel_mesh(5, 4)
    rho = np.linspace(1.0, 2.0, raw.npoint)
    p = tmp_path / "flow.cgns"
    write_cgns_volume(str(p), raw, {"Density": rho})
    with h5py.File(p, "r") as f:
        assert f["Base"].attrs["label"].startswith(b"CGNSBase_t")
        zdata = f["Base/Zone/ data"][...]
        assert zdata[0, 0] == raw.npoint and zdata[1, 0] == raw.nelem
        assert bytes(f["Base/Zone/ZoneType/ data"][...]) == b"Unstructured"
        x = f["Base/Zone/GridCoordinates/CoordinateX/ data"][...]
        np.testing.assert_array_equal(x, raw.coords[:, 0])
        conn = f["Base/Zone/Elements/ElementConnectivity/ data"][...]
        # QUAD_4 (=7) typed rows of 5 ints each
        assert conn.size == raw.nelem * 5
        assert (conn[::5] == 7).all()
        assert conn.max() == raw.npoint       # 1-based
        sol = f["Base/Zone/FlowSolution/Density/ data"][...]
        np.testing.assert_array_equal(sol, rho)


def test_cgns_mesh_roundtrip(tmp_path, combustion_dir):
    """MESH_FORMAT= CGNS: the shipped combustion mesh written to the CGNS
    HDF5 flavor reads back identically (coords, element types/connectivity,
    all four boundary markers) — geometry_structure.cpp Read_CGNS parity."""
    import os
    import numpy as np
    from su2_tpu.io.mesh import read_su2_mesh
    from su2_tpu.io.cgns_out import write_cgns_volume
    from su2_tpu.io.cgns_mesh import read_cgns_mesh, read_mesh

    raw = read_su2_mesh(os.path.join(combustion_dir, "mesh_stretched.su2"))
    p = tmp_path / "mesh.cgns"
    write_cgns_volume(str(p), raw, {})
    got = read_cgns_mesh(str(p))

    assert got.ndim == raw.ndim
    np.testing.assert_allclose(got.coords, raw.coords, rtol=0, atol=0)
    np.testing.assert_array_equal(got.elem_types, raw.elem_types)
    np.testing.assert_array_equal(got.elem_nodes, raw.elem_nodes)
    assert set(got.markers) == set(raw.markers)
    for tag in raw.markers:
        np.testing.assert_array_equal(got.marker_types[tag],
                                      raw.marker_types[tag])
        np.testing.assert_array_equal(got.markers[tag], raw.markers[tag])
    # and the dispatch helper routes on the cfg enum
    got2 = read_mesh(str(p), "CGNS")
    np.testing.assert_array_equal(got2.elem_nodes, got.elem_nodes)


def test_cgns_mesh_3d_and_uniform(tmp_path):
    """3D CGNS meshes (hexa volume + quad boundary sections) and
    uniform-type (non-MIXED) sections both parse."""
    import numpy as np
    import h5py
    from su2_tpu.geometry.structured import box_mesh
    from su2_tpu.io.cgns_out import write_cgns_volume
    from su2_tpu.io.cgns_mesh import read_cgns_mesh

    raw = box_mesh(3, 3, 3)
    p = tmp_path / "box.cgns"
    write_cgns_volume(str(p), raw, {})
    got = read_cgns_mesh(str(p))
    assert got.ndim == 3
    np.testing.assert_array_equal(got.elem_nodes, raw.elem_nodes)
    assert set(got.markers) == set(raw.markers)

    # rewrite the volume section in uniform HEXA_8 form (stride layout)
    with h5py.File(p, "r+") as f:
        el = f["Base/Zone/Elements"]
        conn = el["ElementConnectivity/ data"][...].reshape(-1, 9)
        assert (conn[:, 0] == 17).all()
        el[" data"][...] = np.asarray([17, 0], np.int32)
        del el["ElementConnectivity/ data"]
        el["ElementConnectivity"].create_dataset(
            " data", data=conn[:, 1:].ravel().astype(np.int32))
    got2 = read_cgns_mesh(str(p))
    np.testing.assert_array_equal(got2.elem_nodes, raw.elem_nodes)
