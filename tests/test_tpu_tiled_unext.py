"""TPU regression test: unextended-r tiled windows must Mosaic-compile in
the VMEM-resident-r regime.

Round-4 postmortem: `_tiled_sgs_matvec_mixed_call(r_unext=True)` compiled
fine when r rode in HBM (the 13-row flow system) but failed Mosaic's
128-alignment proof when XLA placed a small r (2 rows x ~590k lanes,
~4.7 MB) in VMEM — the clamped window start went through jnp.clip, which
the divisibility analysis can't see through.  The interpret-mode pins and
the HBM-regime smoke both passed, so nothing caught it until a real 565k
run.  This test compiles + runs exactly the failing regime (v=2, several
tiles, r_unext=True) on the real TPU in a subprocess, and checks the
result against the extended-r path bitwise.

Requires a real TPU; skipped otherwise (marker: tpu, slow-ish compile).
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, "@ROOT@")
import numpy as np
import jax
import jax.numpy as jnp
from su2_tpu.pallas import stencil_solve as stks

assert jax.devices()[0].platform != "cpu", jax.devices()

rng = np.random.default_rng(7)
v, ncolor = 2, 4
nx = 700
n = nx * 840                      # ~588k lanes: r is (2, npad) ~4.7 MB -> VMEM
npad = -(-n // 128) * 128
offsets = (-nx - 1, -nx, -nx + 1, -1, 1, nx - 1, nx, nx + 1)
k = len(offsets)
sel = (rng.standard_normal((k, v, v, npad)) * 0.1).astype(np.float32)
for kk, o in enumerate(offsets):
    p = np.arange(npad)
    bad = (p + o < 0) | (p + o >= n) | (p >= n)
    sel[kk, :, :, bad] = 0.0
sel_t = jnp.asarray(sel.reshape(k * v * v, npad))
diag = (rng.standard_normal((npad, v, v)) * 0.1).astype(np.float32) \
    + 3.0 * np.eye(v, dtype=np.float32)[None]
diag[n:] = 0.0
dinv = np.zeros_like(diag)
dinv[:n] = np.linalg.inv(diag[:n])
diag_t = jnp.asarray(diag.transpose(1, 2, 0).reshape(v * v, npad))
dinv_t = jnp.asarray(dinv.transpose(1, 2, 0).reshape(v * v, npad))
colors = np.arange(npad) % ncolor
masks_t = jnp.asarray(np.stack([(colors == c) & (np.arange(npad) < n)
                                for c in range(ncolor)]).astype(np.float32))
r = rng.standard_normal((v, npad)).astype(np.float32)
r[:, n:] = 0.0
r_t = jnp.asarray(r)

maxoff = max(abs(o) for o in offsets)
H = stks._round128((2 * ncolor) * maxoff)
W = min(stks._TILE_W_CAP, (stks._VMEM_LIMIT // 612) // 128 * 128)
T = W - 2 * H
ntiles = -(-npad // T)
E = ntiles * T + 2 * H
assert ntiles >= 3, (ntiles, T)
ext = lambda x: stks._extend_lanes(x, H, E)
npad_t = ntiles * T
padt = lambda x: jnp.pad(x, ((0, 0), (0, npad_t - npad)))

selp_t = sel_t.astype(jnp.bfloat16)
kw = dict(offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
          ntiles=ntiles, interpret=False)
z_u, w_u = stks._tiled_sgs_matvec_mixed_call(
    ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t),
    padt(r_t), r_unext=True, **kw)
z_e, w_e = stks._tiled_sgs_matvec_mixed_call(
    ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t),
    ext(r_t), r_unext=False, **kw)
zd = np.abs(np.asarray(z_u[:, :n]) - np.asarray(z_e[:, :n])).max()
wd = np.abs(np.asarray(w_u[:, :n]) - np.asarray(w_e[:, :n])).max()
print("max|dz|", zd, "max|dw|", wd)
assert zd == 0.0 and wd == 0.0, (zd, wd)
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
def test_tiled_unext_vmem_r_compiles_on_tpu():
    if not _tpu_available():
        pytest.skip("no TPU attached")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
        timeout=900)
    assert proc.returncode == 0 and "OK" in proc.stdout, (
        proc.stdout[-2000:], proc.stderr[-4000:])
