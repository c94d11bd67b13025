"""SU2_PY io-helper tests."""

import numpy as np

from su2_tpu import pyio


def test_history_roundtrip(tmp_path):
    p = tmp_path / "history.dat"
    p.write_text('TITLE = "SU2"\nVARIABLES="Iteration","Res[Rho]","CL"\n'
                 "0, -1.0, 0.1\n1, -2.0, 0.2\n")
    h = pyio.read_history(str(p))
    np.testing.assert_allclose(h["Res[Rho]"], [-1.0, -2.0])
    np.testing.assert_allclose(h["CL"], [0.1, 0.2])


def test_config_update(tmp_path):
    src = tmp_path / "a.cfg"
    src.write_text("MACH_NUMBER= 0.3\n% comment\nCFL_NUMBER= 5.0\n")
    out = tmp_path / "b.cfg"
    opts = pyio.update_config(str(src), str(out), {"MACH_NUMBER": 0.5})
    assert opts["MACH_NUMBER"] == "0.5"
    again = pyio.read_config_raw(str(out))
    assert again["CFL_NUMBER"] == "5.0"
    assert again["MACH_NUMBER"] == "0.5"
