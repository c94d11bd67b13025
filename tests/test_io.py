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
