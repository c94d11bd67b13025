"""Parity of the fused TOTAL_CONDITIONS inlet solve (pallas/inlet_tc.py)
against the XLA secant/bisection chain in euler.inlet_state."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from su2_tpu.config import Config
from su2_tpu.chemistry import library as cl_lib
from su2_tpu.pallas import inlet_tc as itc

FLATPLATE = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"


@pytest.fixture(scope="module")
def setup():
    cfg = Config(os.path.join(FLATPLATE, "my_turbulent_flatplate_air.cfg"))
    lib = cl_lib.load_library(cfg.resolve(cfg.config_lib_file),
                              cfg.library_path or None, jnp.float64)
    return cfg, lib


def test_total_conditions_solve_matches_xla(setup):
    cfg, lib = setup
    (tag, (ttot, ptot, fdir)), = [
        (t, v) for t, v in cfg.marker_inlet.items()]
    ys = jnp.asarray(next(iter(cfg.inlet_mass_frac.values()))
                     if getattr(cfg, "inlet_mass_frac", None)
                     else cfg.freestream_mass_frac, jnp.float64)

    rng = np.random.default_rng(0)
    n = 97
    # domain-side states spanning subsonic inflow conditions
    riemann = jnp.asarray(rng.uniform(600.0, 1800.0, n))
    gamma = jnp.asarray(rng.uniform(1.30, 1.41, n))
    alpha = jnp.asarray(rng.uniform(0.85, 1.0, n))

    t_pal, rgas, htot = itc.total_conditions_t(
        lib, ys, float(ttot), riemann, gamma, alpha)

    # XLA reference: the same masked secant+bisection (euler.inlet_state's
    # TOTAL_CONDITIONS loops), extracted
    import jax
    from su2_tpu.chemistry import library as cl
    ysb = jnp.broadcast_to(ys, (n, lib.nspecies))
    gm1 = gamma - 1.0
    tot_enthalpy = cl.mixture_enthalpy(
        lib, jnp.full((n,), float(ttot), jnp.float64), ysb)
    rg = cl.mixture_rgas(lib, ysb)

    def f_of(t):
        hb = cl.mixture_enthalpy(lib, t, ysb)
        cb = jnp.sqrt(gamma * rg * t)
        vb = (riemann - 2.0 * cb / gm1) / alpha
        return hb + 0.5 * vb * vb - tot_enthalpy

    t = jnp.full((n,), float(ttot), jnp.float64)
    t_old = t + 1.0
    done = jnp.zeros((n,), bool)

    def sec(_, carry):
        t, t_old, done = carry
        fv = f_of(t)
        df = fv - f_of(t_old)
        safe = jnp.where(df == 0.0, 1.0, df)
        t_new = t - fv * (t - t_old) / safe
        conv = jnp.abs(t_new - t) < 1.0e-9
        return (jnp.where(done | conv, t, t_new),
                jnp.where(done, t_old, t), done | conv)

    t, _, done = jax.lax.fori_loop(0, 15, sec, (t, t_old, done))

    ta = jnp.full_like(t, 300.0)
    tb = jnp.full_like(t, float(ttot))
    tm = 0.5 * (ta + tb)
    bdone = jnp.zeros_like(t, dtype=bool)

    def bis(_, carry):
        ta, tb, tm, bdone = carry
        tmid = 0.5 * (ta + tb)
        fv = f_of(tmid)
        conv = jnp.abs(fv) < 1.0e-6
        hi = fv > 0.0
        return (jnp.where(bdone | conv, ta, jnp.where(hi, tmid, ta)),
                jnp.where(bdone | conv, tb, jnp.where(hi, tb, tmid)),
                jnp.where(bdone, tm, tmid), bdone | conv)

    ta, tb, tm, bdone = jax.lax.fori_loop(0, 100, bis, (ta, tb, tm, bdone))
    t_ref = jnp.where(done, t, tm)

    np.testing.assert_allclose(np.asarray(t_pal), np.asarray(t_ref),
                               rtol=1e-8)
    np.testing.assert_allclose(rgas, float(rg[0]), rtol=1e-12)
    np.testing.assert_allclose(htot, float(tot_enthalpy[0]), rtol=1e-12)
