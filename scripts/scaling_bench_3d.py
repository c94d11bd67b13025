"""3D perf row (round-5 verdict item 5): implicit reactive RANS on a
hex-box channel (the tests/test_rans_3d.py case scaled up), one TPU chip.

Usage: python scripts/scaling_bench_3d.py [nx ny nz] (default 128 64 64
-> 524,288 nodes / ~0.5M cells).  Reference 3D branch being measured:
numerics_direct_reactive.cpp:1200-1409 (3D viscous Jacobians) through the
fused family kernels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_FP = "/root/reference/Test_Cases/TURBOLENT/TURBOLENT_FLAT_PLATE"

CFG = """
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
"""


def main():
    nx, ny, nz = ((int(a) for a in sys.argv[1:4]) if len(sys.argv) > 3
                  else (128, 64, 64))
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.geometry.structured import box_mesh

    import tempfile
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "case3d.cfg")
    with open(p, "w") as f:
        f.write(CFG)
    cwd = os.getcwd()
    os.chdir(_FP)
    try:
        t0 = time.time()
        raw = box_mesh(nx, ny, nz, 2.0, 0.5, 0.5)
        sim = Simulation(Config(p), dtype=jnp.float32, raw_mesh=raw)
        print(f"setup({raw.npoint}): {time.time()-t0:.1f}s", flush=True)
        q0, mu_t0, gk0, sk0 = sim.initial_turb_state()
        ig = jnp.zeros((10,), bool)

        def advance(state):
            carry, _ = sim.rans_multistep(*state, ig)
            return carry

        state = (sim.u0, sim.t0, q0, mu_t0, gk0, sk0)
        state = advance(state)
        jax.block_until_ready(state[0])
        n_iter = 100
        t0 = time.time()
        for _ in range(n_iter // 10):
            state = advance(state)
        jax.block_until_ready(state[0])
        dt = (time.time() - t0) / n_iter
        n = sim.u0.shape[0]
        fin = bool(jnp.isfinite(state[0]).all())
        print(f"| {n:7d} 3D | {dt*1e3:7.2f} ms/iter | {n/dt/1e6:6.3f} "
              f"Mcell/s | finite={fin} |", flush=True)
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
