"""Windowed explicit multi-family edge kernel (pallas/edge_fused.py
_edge_win_plan/_edge_win_call, SU2_TPU_WIN_EDGE): parity with the legacy
fused_edge_flux_pallas_multi roll path, interpret mode on CPU plus a
real-TPU compile/parity run in the multi-tile regime.

The windowed kernel replaces the host-side f_all family rolls and the
flux roll-subtract scatter with per-tile halo-window DMAs and in-VMEM
lane rotations; it is default-ON for single-shard TPU stencil meshes
>= 200k nodes.  The per-edge arithmetic (_explicit_side) is shared with
the legacy kernel, so the node-accumulated residual must agree to
rounding (the family summation order is identical).
"""

import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.ops import viscous as vis
from su2_tpu.pallas import edge_fused
from su2_tpu.pallas import edge_kernels as ek
from su2_tpu.solvers import ns
from su2_tpu import state as st

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pasr_state(combustion_dir, tmp_path_factory):
    from su2_tpu.io import restart as rio

    fix = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                               "ref_restart_nochem.npz"))
    coords = np.zeros((fix["u"].shape[0], 2))
    tmp = tmp_path_factory.mktemp("edgewin")
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        rio.write_restart("restart_flow.dat", coords, fix["u"], fix["turb"])
        cfg = Config(os.path.join(combustion_dir,
                                  "my_combustion_second_chem_PaSR.cfg"))
        sim = Simulation(cfg)
        q, mu_t, grad_k, sigma_k = sim.initial_turb_state()
    finally:
        os.chdir(cwd)
    lib, lay = sim.lib, sim.lay
    u, v, _ = st.cons2prim(lib, lay, sim.u0, sim.t0, sim.tparams,
                           turb_ke=q[:, 0])
    turb = vis.TurbFlowData(tke=q[:, 0], mu_t=mu_t,
                            grad_tke=grad_k[:, 0, :], sigma_k=sigma_k)
    return sim, v, turb, q[:, 1]


def _assemble(pasr_state, windowed: bool, monkeypatch):
    sim, v, turb, omega_t = pasr_state
    monkeypatch.setenv("SU2_TPU_WIN_EDGE", "1" if windowed else "0")
    ek.set_edge_kernel_mode(True)
    try:
        res, wallmask, trans, nonphys, lams = ns.ns_assemble(
            sim.lib, sim.lay, sim.mesh, sim.params, sim.bcs, v,
            turb=turb, omega_turb=omega_t,
            sigma_k_edge=turb.sigma_k[sim.mesh.edges[:, 0]],
            want_lambdas=True)
    finally:
        ek.set_edge_kernel_mode(False)
    return res, lams


@pytest.mark.slow
def test_windowed_matches_legacy_single_tile(pasr_state, monkeypatch):
    """Default plan on the 9k mesh (one tile): windowed == legacy."""
    res0, lams0 = _assemble(pasr_state, windowed=False, monkeypatch=monkeypatch)
    res1, lams1 = _assemble(pasr_state, windowed=True, monkeypatch=monkeypatch)
    # sanity: the plan actually applies on this mesh when forced
    assert edge_fused._edge_win_plan(pasr_state[0].mesh) is not None
    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max(axis=0)
    for k in range(r0.shape[1]):
        assert np.abs(r1[:, k] - r0[:, k]).max() <= 1e-9 * max(scale[k], 1e-6), k
    for a, b in zip(lams0, lams1):
        sc = np.abs(np.asarray(a)).max()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-11, atol=1e-12 * max(sc, 1.0))


@pytest.mark.slow
def test_windowed_matches_legacy_multi_tile(pasr_state, monkeypatch):
    """Forced small tile (several windows, clamped first/last DMA)."""
    sim = pasr_state[0]
    plan = edge_fused._edge_win_plan(sim.mesh)
    assert plan is None or plan[2] >= 1
    from su2_tpu.pallas.stencil_solve import _round128
    maxoff = max(int(o) for o in sim.mesh.fam_offsets)
    H = _round128(maxoff)
    T = 1024
    npad = _round128(sim.mesh.npoint)
    ntiles = -(-npad // T)
    assert ntiles >= 3
    orig_plan = edge_fused._edge_win_plan

    def forced_plan(mesh):
        return (T, H, ntiles) if orig_plan(mesh) is not None else None

    res0, _ = _assemble(pasr_state, windowed=False, monkeypatch=monkeypatch)
    monkeypatch.setattr(edge_fused, "_edge_win_plan", forced_plan)
    res1, _ = _assemble(pasr_state, windowed=True, monkeypatch=monkeypatch)
    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max(axis=0)
    for k in range(r0.shape[1]):
        assert np.abs(r1[:, k] - r0[:, k]).max() <= 1e-9 * max(scale[k], 1e-6), k


_TPU_SCRIPT = r"""
import os
import sys
sys.path.insert(0, "@ROOT@")
import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform != "cpu", jax.devices()

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.io.mesh import read_su2_mesh
from su2_tpu.adapt import refine_full
from su2_tpu.ops import viscous as vis
from su2_tpu.pallas import edge_fused
from su2_tpu.pallas import edge_kernels as ek
from su2_tpu.solvers import ns
from su2_tpu import state as st

_C = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_COMBUSTION"
cfg = Config(os.path.join(_C, "my_combustion_second_chem_PaSR.cfg"),
             overrides={"RESTART_SOL": "NO"})
raw = read_su2_mesh(cfg.resolve(cfg.mesh_filename))
for _ in range(2):
    raw, _, _ = refine_full(raw)          # 9k -> 142k nodes
sim = Simulation(cfg, dtype=jnp.float32, raw_mesh=raw)
q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
u, v, _ = st.cons2prim(sim.lib, sim.lay, sim.u0, sim.t0, sim.tparams,
                       turb_ke=q0[:, 0])
turb = vis.TurbFlowData(tke=q0[:, 0], mu_t=mu_t0,
                        grad_tke=grad_k0[:, 0, :], sigma_k=sigma_k0)

def assemble():
    ek.set_edge_kernel_mode(True)
    try:
        res, *_ = ns.ns_assemble(
            sim.lib, sim.lay, sim.mesh, sim.params, sim.bcs, v,
            turb=turb, omega_turb=q0[:, 1],
            sigma_k_edge=sigma_k0[sim.mesh.edges[:, 0]])
    finally:
        ek.set_edge_kernel_mode(False)
    return np.asarray(res)

os.environ["SU2_TPU_WIN_EDGE"] = "0"
r0 = assemble()
os.environ["SU2_TPU_WIN_EDGE"] = "1"
plan = edge_fused._edge_win_plan(sim.mesh)
assert plan is not None and plan[2] >= 2, plan   # multi-tile regime
r1 = assemble()
scale = max(np.abs(r0).max(), 1e-6)
d = np.abs(r1 - r0).max()
print("ntiles", plan[2], "max|dres|", d, "scale", scale)
assert d <= 1e-6 * scale, (d, scale)
print("OK")
""".replace("@ROOT@", ROOT)


def _tpu_available():
    probe = subprocess.run(
        [sys.executable, "-c", "import jax; print(jax.devices()[0].platform)"],
        capture_output=True, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        timeout=120)
    return probe.returncode == 0 and probe.stdout.strip() in ("tpu", "axon")


@pytest.mark.tpu
@pytest.mark.slow
def test_windowed_edge_compiles_on_tpu_multi_tile():
    """Real-TPU Mosaic compile + parity in the multi-tile windowed regime
    (142k nodes, default plan T=16384 -> ~9 tiles): the round-4 postmortem
    shape class (clamped window DMAs) for the explicit edge kernel."""
    if not _tpu_available():
        pytest.skip("no TPU attached")
    proc = subprocess.run(
        [sys.executable, "-c", _TPU_SCRIPT], capture_output=True, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "SU2_TPU_WIN_EDGE")},
        timeout=1800)
    assert proc.returncode == 0 and "OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])
