"""Force monitoring + forces_breakdown.dat (Pressure_Forces/Friction_Forces
and COutput::SetForces_Breakdown equivalents)."""

import numpy as np
import jax.numpy as jnp

from su2_tpu.state import Layout
from su2_tpu.solvers import forces as ff


class _Trans:
    def __init__(self, mu, kappa):
        self.mu = mu
        self.kappa = kappa


def _setup(aoa=0.0):
    """Two 3-node markers on a unit square: analytic pressure-only forces."""
    lay = Layout(ndim=2, ns=1)
    n = 6
    v = np.zeros((n, lay.nprim))
    v[:, lay.P] = [2.0, 2.0, 2.0, 3.0, 3.0, 3.0]
    v[:, lay.T] = 300.0
    grad = np.zeros((n, 2 + lay.ndim + lay.ns, 2))
    # uniform du/dy = 1 -> tau_xy = mu on a y-normal face
    grad[:, 1, 1] = 1.0
    trans = _Trans(mu=jnp.full((n,), 0.5), kappa=jnp.full((n,), 0.1))
    coords = np.array([[0.0, 0.0], [0.5, 0.0], [1.0, 0.0],
                       [0.0, 1.0], [0.5, 1.0], [1.0, 1.0]])
    # marker "bottom": stored normal +y (outward -y), areas 0.5/1/0.5... use
    # unit areas for simple sums
    markers = {
        "bottom": (jnp.asarray([0, 1, 2]),
                   jnp.asarray([[0.0, 0.5], [0.0, 1.0], [0.0, 0.5]]),
                   None),
        "top": (jnp.asarray([3, 4, 5]),
                jnp.asarray([[0.0, -0.5], [0.0, -1.0], [0.0, -0.5]]),
                None),
    }
    out = ff.surface_forces(
        None, lay, None, jnp.asarray(v), jnp.asarray(grad), trans, markers,
        p_inf=1.0, rho_inf=1.0, vel_inf=np.array([2.0, 0.0]), ref_area=1.0,
        viscous=True, mu_t=None, coords=coords, origin=(0.5, 0.5, 0.0),
        ref_len=2.0, aoa_deg=aoa)
    return out


def test_pressure_friction_split_and_moment():
    out = _setup()
    q_dyn = 0.5 * 1.0 * 4.0
    # pressure: bottom (p-pinf)=1 over area 2 outward -y => Fy=-2;
    # top (p-pinf)=2 over area 2 outward +y => Fy=+4; net +2
    cfy_p, cfy_f = out["splits"]["CFy"]
    assert abs(cfy_p - 2.0 / q_dyn) < 1e-12
    # friction: tau_xy = mu = 0.5; bottom outward n=(0,-1): f_x = -tau_xy*ny
    # = +0.5 per unit area * 2 = +1; top outward (0,+1): -1; net 0
    cfx_p, cfx_f = out["splits"]["CFx"]
    assert abs(cfx_p) < 1e-12 and abs(cfx_f) < 1e-12
    bm = out["per_marker"]["bottom"]
    assert abs(bm["CFx"][1] - 1.0 / q_dyn) < 1e-12
    assert abs(out["per_marker"]["top"]["CFx"][1] + 1.0 / q_dyn) < 1e-12
    # alpha = 0: CL == CFy, CD == CFx
    assert out["CL"] == out["CFy"] and out["CD"] == out["CFx"]
    # moment about (0.5, 0.5): bottom pressure Fy=-2 at x-arm 0 -> 0;
    # top Fy=+4 at x-arm 0 -> 0; friction Fx=+1 at dy=-0.5 -> dMz=+0.5;
    # top Fx=-1 at dy=+0.5 -> +0.5; total Mz = 1.0 / (q_dyn*ref_len)
    cmz_p, cmz_f = out["splits"]["CMz"]
    assert abs(cmz_p) < 1e-12
    assert abs(cmz_f - 1.0 / (q_dyn * 2.0)) < 1e-12
    # heat flux: grad T = 0 here
    assert out["HF_total"] == 0.0


def test_aoa_rotation():
    out0 = _setup(aoa=0.0)
    out = _setup(aoa=30.0)
    a = np.deg2rad(30.0)
    cd = out0["CFx"] * np.cos(a) + out0["CFy"] * np.sin(a)
    cl = -out0["CFx"] * np.sin(a) + out0["CFy"] * np.cos(a)
    assert abs(out["CD"] - cd) < 1e-12
    assert abs(out["CL"] - cl) < 1e-12


def test_breakdown_file(tmp_path):
    from su2_tpu.io.output import write_forces_breakdown

    out = _setup()
    p = tmp_path / "forces_breakdown.dat"
    write_forces_breakdown(str(p), None, out,
                           {"ndim": 2, "Free-stream temperature": "300 K."})
    text = p.read_text()
    assert "Forces breakdown:" in text
    assert "Surface name: bottom" in text
    assert "Surface name: top" in text
    # every row decomposes into pressure + friction
    for name in ("Total CL", "Total CD", "Total CMz", "Total CFx"):
        assert name in text
    # totals line carries the numeric total of the splits
    cfy = out["splits"]["CFy"]
    line = [l for l in text.splitlines()
            if l.startswith("Total CFy:")][0]
    assert f"{cfy[0] + cfy[1]: 12.6g}".strip() in line
