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
