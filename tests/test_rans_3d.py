"""3D implicit reactive RANS end-to-end (VERDICT round-2 item 1).

A 3D channel (box mesh) with the flat-plate 3-species air chemistry:
REACTIVE_NAVIER_STOKES + SST, MUSCL AUSM, implicit Euler flow + implicit
turb, no-slip heatflux wall at z_min.  Exercises the 3D viscous Jacobians
(ops/viscous.py 3D branch), 3D SST coupling and 3D weak/strong BCs that the
reference supports nDim-generically (solver_direct_reactive.cpp:4953,
numerics_direct_reactive.cpp:1337).
"""

import os
import textwrap

import numpy as np
import pytest

from su2_tpu.config import Config
from su2_tpu.driver import Simulation
from su2_tpu.geometry.structured import box_mesh

CFG = textwrap.dedent("""
    CONFIG_LIB_FILE = test_air.txt
    FREESTREAM_MASS_FRAC = (0.2197, 0.0302, 0.7501)
    SPECIES_ORDER = (O2, CO2, N2)
    PHYSICAL_PROBLEM= REACTIVE_NAVIER_STOKES
    KIND_TURB_MODEL= SST
    MACH_NUMBER= 0.2
    FREESTREAM_TEMPERATURE= 297.62
    FREESTREAM_VELOCITY= (69.1687, 0.0, 0.0)
    FREESTREAM_PRESSURE= 113303.0
    REYNOLDS_LENGTH= 1.000
    REYNOLDS_NUMBER= 500000
    FREESTREAM_TURBULENCEINTENSITY = 0.05
    FREESTREAM_TURB2LAMVISCRATIO = 10.0
    MARKER_HEATFLUX = (z_min, 0.0)
    MARKER_EULER= ( z_max, y_min, y_max )
    MARKER_INLET= ( inlet, 300.0, 100000.0, 1.0, 0.0, 0.0 )
    INLET_MASS_FRAC = (inlet, 0.2197, 0.0302, 0.7501)
    MARKER_OUTLET= ( outlet, 97250.0 )
    NUM_METHOD_GRAD= WEIGHTED_LEAST_SQUARES
    CFL_NUMBER= 2.0
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ERROR= 1E-6
    LINEAR_SOLVER_ITER= 5
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 2ND_ORDER
    SLOPE_LIMITER_FLOW= VENKATAKRISHNAN
    LIMITER_COEFF= 0.05
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    CONV_NUM_METHOD_TURB= SCALAR_UPWIND
    TIME_DISCRE_TURB= EULER_IMPLICIT
    MESH_FILENAME= unused.su2
""")


@pytest.mark.slow
def test_implicit_rans_3d_channel(flatplate_dir, tmp_path):
    cfg_path = tmp_path / "case3d.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(flatplate_dir)  # chemistry manifest paths
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=box_mesh(9, 5, 7, 2.0, 0.5, 0.5))
        u, _, hist, turb = sim.run(5, quiet=True)
    finally:
        os.chdir(cwd)
    hist = np.asarray(hist)
    assert np.isfinite(np.asarray(u)).all()
    assert np.isfinite(hist).all()
    assert (np.asarray(u)[:, sim.lay.RHO] > 0).all()
    # implicit 3D RANS converges from the freestream transient
    assert hist[-1][sim.lay.RHO] < hist[0][sim.lay.RHO] - 0.2
    # turbulence state stays physical
    q = np.asarray(turb[0] if isinstance(turb, tuple) else turb)
    assert np.isfinite(q).all()


@pytest.mark.slow
def test_fused_implicit_assembly_matches_xla_3d(flatplate_dir, tmp_path):
    """Round-4: the fused implicit edge kernel's 3D branch (edge-major
    viscous Jacobians generalized to the reference's 3D thin-shear tensor,
    numerics_direct_reactive.cpp:981-1090) pins to the XLA family-major
    assembly on the 3D box RANS case."""
    import jax.numpy as jnp
    from su2_tpu import state as st
    from su2_tpu.linalg import blockcsr
    from su2_tpu.ops import viscous as vis
    from su2_tpu.pallas import edge_kernels as ek
    from su2_tpu.solvers import ns

    cfg_path = tmp_path / "case3d.cfg"
    cfg_path.write_text(CFG)
    cwd = os.getcwd()
    os.chdir(flatplate_dir)
    try:
        sim = Simulation(Config(str(cfg_path)),
                         raw_mesh=box_mesh(9, 5, 7, 2.0, 0.5, 0.5))
    finally:
        os.chdir(cwd)
    assert sim.mesh.fam_offsets is not None
    q0, mu_t0, grad_k0, sigma_k0 = sim.initial_turb_state()
    rng = np.random.default_rng(11)
    u0 = np.asarray(sim.u0) * (1.0 + 0.02 * rng.standard_normal(
        sim.u0.shape))
    u, v, _ = st.cons2prim(sim.lib, sim.lay, jnp.asarray(u0), sim.t0,
                           sim.tparams, turb_ke=q0[:, 0])
    turb = vis.TurbFlowData(
        tke=q0[:, 0],
        mu_t=mu_t0 * (1 + rng.uniform(0, 1, mu_t0.shape)),
        grad_tke=jnp.asarray(rng.normal(0, 1e-3, grad_k0[:, 0, :].shape)),
        sigma_k=sigma_k0)
    n = v.shape[0]
    dt = jnp.full((n,), 1e-7, dtype=v.dtype)

    def assemble(fused):
        ek.set_edge_kernel_mode(fused)
        try:
            return ns.ns_assemble(sim.lib, sim.lay, sim.mesh, sim.params,
                                  sim.bcs, v, dt=dt, implicit=True,
                                  turb=turb)
        finally:
            ek.set_edge_kernel_mode(False)

    res0, wm0, _, _, jac0 = assemble(False)
    res1, wm1, _, _, jac1 = assemble(True)
    assert isinstance(jac0, blockcsr.FamilyJacobian)
    assert isinstance(jac1, blockcsr.StencilJacobianT)

    r0, r1 = np.asarray(res0), np.asarray(res1)
    scale = np.abs(r0).max()
    assert np.abs(r1 - r0).max() < 1e-9 * scale

    d0, d1 = np.asarray(jac0.diag), np.asarray(jac1.diag)
    dscale = np.abs(d0).max()
    assert np.abs(d1 - d0).max() < 1e-9 * dscale

    k = len(sim.mesh.stencil_offsets)
    nvar = sim.lay.nvar
    sel0 = np.asarray(blockcsr.family_sel(sim.mesh, jac0))
    sel1 = np.asarray(jac1.sel_t).reshape(k, nvar, nvar, n).transpose(
        0, 3, 1, 2)
    sscale = np.abs(sel0).max()
    assert np.abs(sel1 - sel0).max() < 1e-9 * sscale
