"""Demonstrate the multicolor-vs-sequential LU-SGS parity attribution
(round-2 verdict item 5).

Runs the flat-plate 50-iteration advance from the shared partially-converged
reference restart twice — production multicolor SGS vs the reference-exact
sequential natural-order sweep (SU2_TPU_SEQ_SGS_TURB, linalg/seq_sgs.py) —
and prints the field/residual gaps vs the reference's iteration-1250 state.

Usage: JAX_PLATFORMS=cpu python scripts/seq_sgs_demo.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.io import restart as rio

FP = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"
FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def run(workdir):
    fix0 = np.load(os.path.join(FIX, "ref_restart_fp1200.npz"))
    cwd = os.getcwd()
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)
    try:
        rio.write_restart("restart_flow.dat",
                          np.zeros((fix0["u"].shape[0], 2)),
                          fix0["u"], fix0["turb"])
        sim = Simulation(Config(
            os.path.join(FP, "my_turbulent_flatplate_air.cfg"),
            overrides={
                "RESTART_SOL": "YES", "EXT_ITER": "50",
                "CONFIG_LIB_FILE": os.path.join(FP, "test_air.txt"),
                "MESH_FILENAME": os.path.join(
                    FP, "mesh_flatplate_turb_137x97.su2")}))
        u, _, hist, (q, _, _, _) = sim.run(50, quiet=True)
        ua = sim.to_file_order(np.asarray(u))
        qa = sim.to_file_order(np.asarray(q))
    finally:
        os.chdir(cwd)
    return ua, qa, np.asarray(hist)


def gaps(ua, qa, hist):
    ref50 = np.load(os.path.join(FIX, "ref_restart_fp1250.npz"))
    ru, rt = ref50["u"], ref50["turb"]
    out = {}
    for k in range(ru.shape[1]):
        sc = max(np.abs(ru[:, k]).max(), 1e-30)
        out[f"u{k}"] = np.abs(ua[:, k] - ru[:, k]).max() / sc
    for k, name in enumerate(["k", "omega"]):
        sc = np.abs(rt[:, k]).max()
        out[name] = np.abs(qa[:, k] - rt[:, k]).max() / sc
    out["res_rho_end_err"] = abs(hist[-1][0] - (-3.323689))
    out["res_rhoE_end_err"] = abs(hist[-1][3] - 2.120903)
    return out


def main():
    import tempfile

    os.environ.pop("SU2_TPU_SEQ_SGS_TURB", None)
    g_mc = gaps(*run(tempfile.mkdtemp(prefix="mc_")))
    os.environ["SU2_TPU_SEQ_SGS_TURB"] = "1"
    g_seq = gaps(*run(tempfile.mkdtemp(prefix="seq_")))
    os.environ.pop("SU2_TPU_SEQ_SGS_TURB", None)

    print(f"{'field':>16} {'multicolor':>12} {'sequential':>12} {'ratio':>8}")
    for k in g_mc:
        r = g_mc[k] / max(g_seq[k], 1e-300)
        print(f"{k:>16} {g_mc[k]:12.3e} {g_seq[k]:12.3e} {r:8.1f}x")


if __name__ == "__main__":
    main()
