"""Fused chemistry-source kernel (pallas/chem_source.py) vs the XLA chain
(chemistry.library reaction_rates/omega_tensor/pasr_constants/
mass_production — reference reacting_model_library.cpp:99-227, :835-920)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from su2_tpu.chemistry import library as cl
from su2_tpu.pallas import chem_source as pcs


class _Prm:
    pasr = True
    pasr_lb = 0.2
    c_mu = 0.09


@pytest.fixture(scope="module")
def lib(combustion_dir):
    return cl.load_library(
        os.path.join(combustion_dir, "test_chem_second.txt"))


def _chain(lib, prm, t, rho, ys, omt):
    rf, rb, _ = cl.reaction_rates(lib, t, rho, ys)
    om = cl.omega_tensor(lib, rf, rb)
    if omt is not None:
        dfr = cl.dfr_drho(lib, rf, rb, rho, ys)
        k = cl.pasr_constants(lib, dfr, omt, prm.c_mu, prm.pasr_lb)
        return cl.mass_production(lib, om, k)
    return cl.mass_production(lib, om)


def _state(lib, n, dtype, seed=0):
    rng = np.random.default_rng(seed)
    t = jnp.asarray(rng.uniform(300.0, 2500.0, n), dtype)
    rho = jnp.asarray(rng.uniform(0.2, 2.0, n), dtype)
    ys = rng.dirichlet(np.ones(lib.nspecies), size=n)
    # exercise the vanishing-species guards
    ys[: n // 4, 0] = 0.0
    ys[n // 4: n // 2, 2] = 1e-16
    ys = jnp.asarray(ys, dtype)
    omt = jnp.asarray(rng.uniform(1.0, 1e4, n), dtype)
    return t, rho, ys, omt


@pytest.mark.parametrize("pasr", [True, False])
def test_chem_source_matches_chain_f64(lib, pasr):
    t, rho, ys, omt = _state(lib, 700, jnp.float64)
    omt = omt if pasr else None
    want = _chain(lib, _Prm, t, rho, ys, omt)
    got = pcs.chem_source(lib, _Prm, t, rho, ys, omt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-9, atol=1e-12)


def test_chem_source_matches_chain_f32(lib):
    lib32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32) if hasattr(x, "dtype")
        and jnp.issubdtype(x.dtype, jnp.floating) else x, lib)
    t, rho, ys, omt = _state(lib32, 700, jnp.float32, seed=3)
    want = np.asarray(_chain(lib32, _Prm, t, rho, ys, omt))
    got = np.asarray(pcs.chem_source(lib32, _Prm, t, rho, ys, omt))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=2e-5 * scale)
