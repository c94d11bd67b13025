"""Fluid-model (CFluidModel) tests: ideal gas, van der Waals, Peng-Robinson."""

import jax.numpy as jnp
import numpy as np
import pytest

from su2_tpu import fluid_models as fm

GAMMA, R = 1.4, 287.058
PC, TC, W = 3.588e6, 131.0, 0.035


def test_ideal_gas_roundtrip():
    gas = fm.IdealGas(GAMMA, R)
    p = jnp.asarray([1e5, 5e5])
    t = jnp.asarray([300.0, 600.0])
    s = gas.state_pt(p, t)
    np.testing.assert_allclose(np.asarray(s["P"]), np.asarray(p), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s["T"]), np.asarray(t), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s["a2"]),
                               GAMMA * R * np.asarray(t), rtol=1e-12)


def test_vdw_reduces_to_ideal_far_from_critical():
    gas = fm.VanDerWaalsGas(GAMMA, R, 1e12, 1.0)   # a, b ~ 0
    ideal = fm.IdealGas(GAMMA, R)
    rho = jnp.asarray([1.2]); e = jnp.asarray([2.1e5])
    sv = gas.state_rhoe(rho, e)
    si = ideal.state_rhoe(rho, e)
    for k in ("P", "T", "a2"):
        np.testing.assert_allclose(np.asarray(sv[k]), np.asarray(si[k]),
                                   rtol=1e-6)


def test_vdw_pt_roundtrip():
    gas = fm.VanDerWaalsGas(GAMMA, R, PC, TC)
    p = jnp.asarray([2e5]); t = jnp.asarray([280.0])
    s = gas.state_pt(p, t)
    np.testing.assert_allclose(np.asarray(s["P"]), np.asarray(p), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s["T"]), np.asarray(t), rtol=1e-4)
    assert 0.9 < float(s["Zed"][0]) <= 1.0   # slightly non-ideal


def test_pr_prho_roundtrip():
    gas = fm.PengRobinsonGas(GAMMA, R, PC, TC, W)
    p = jnp.asarray([3e5]); rho = jnp.asarray([3.9])
    s = gas.state_prho(p, rho)
    np.testing.assert_allclose(np.asarray(s["P"]), np.asarray(p), rtol=1e-8)
    # consistency: rhoe inverse recovers T and sound speed is real
    s2 = gas.state_rhoe(rho, s["e"])
    np.testing.assert_allclose(np.asarray(s2["T"]), np.asarray(s["T"]),
                               rtol=1e-10)
    assert float(s2["a2"][0]) > 0.0


def test_pr_reduces_to_ideal_far_from_critical():
    gas = fm.PengRobinsonGas(GAMMA, R, 1e14, 1.0, W)
    ideal = fm.IdealGas(GAMMA, R)
    rho = jnp.asarray([0.8]); e = jnp.asarray([1.9e5])
    sp = gas.state_rhoe(rho, e)
    si = ideal.state_rhoe(rho, e)
    for k in ("P", "T", "a2"):
        np.testing.assert_allclose(np.asarray(sp[k]), np.asarray(si[k]),
                                   rtol=1e-5)


def test_make_fluid_model_dispatch():
    class C:
        fluid_model = "PR_GAS"
        gamma_value = GAMMA
        gas_constant = R
        critical_pressure = PC
        critical_temperature = TC
        acentric_factor = W
    assert isinstance(fm.make_fluid_model(C()), fm.PengRobinsonGas)
    C.fluid_model = "VW_GAS"
    assert isinstance(fm.make_fluid_model(C()), fm.VanDerWaalsGas)
    C.fluid_model = "IDEAL_GAS"
    assert isinstance(fm.make_fluid_model(C()), fm.IdealGas)
