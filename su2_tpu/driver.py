"""Simulation driver: setup + main loop (CDriver/CFluidDriver equivalent).

Builds geometry, chemistry library, solver parameters and the jitted step
function from a Config; runs the outer iteration loop with convergence
monitoring (reference: driver_structure.cpp StartSolver :2654, iteration
sequencing iteration_structure.cpp:531-550).
"""

from __future__ import annotations

import os
import sys
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu import state as st
from su2_tpu.chemistry import library as cl
from su2_tpu.config import Config
from su2_tpu.geometry.dual_grid import build_dual_grid
from su2_tpu.geometry.mesh_data import mesh_arrays
from dataclasses import replace as dataclasses_replace

from su2_tpu.ops import gradients, timestep
from su2_tpu.solvers import euler as es
from su2_tpu.solvers import ns
from su2_tpu.turbulence import sst
from su2_tpu.state import Layout, TSolveParams


class Simulation:
    """One flow zone: reactive Euler/NS (+SST) on a single device."""

    def __init__(self, cfg: Config, dtype=jnp.float64, ndevices: int | None = None,
                 devices=None, raw_mesh=None):
        if cfg.system_measurements == "US":
            # run internally in SI (see units.py; outputs dimensionless or SI)
            from su2_tpu.units import us_config_to_si
            us_config_to_si(cfg)
        self.cfg = cfg
        self.dtype = dtype
        self.ndevices = ndevices
        if (dtype == jnp.float32
                and jax.devices()[0].platform == "tpu"):
            # round-5: multi-chip runs keep the pallas production tiers —
            # pointwise kernels run per-shard under shard_map, the
            # windowed/tiled kernels exchange ppermute halo slabs
            # (pallas/context.py, parallel/tiled_shard.py); the driver
            # records the shard count for the dispatchers below
            from su2_tpu.pallas.context import set_pallas_shards
            set_pallas_shards(ndevices or 1)
            if ndevices is None:
                # enthalpy-table kernel: invoked on arbitrary (incl.
                # full-field) arrays from BC/library call sites that are
                # not shard-aware — single-chip only
                cl.set_enthalpy_mode("pallas")
            # fused node-state kernel: Cons2Prim secant/bisection + dT/dU +
            # dP/dU + Wilke transport in one pallas pass (pallas/node_state)
            st.set_node_state_mode("pallas")
            # fused lanes-as-edges explicit edge kernel (pallas/edge_fused.py):
            # AUSM + viscous + Stefan-Maxwell + SST closure in one pallas pass
            from su2_tpu.pallas import edge_kernels as _ek
            _ek.set_edge_kernel_mode(True)
            # fused SST assembly (pallas/sst_assemble.py) measured a wash
            # at 9k (XLA overlaps the ~40 small assembly fusions well; the
            # kernel + input stacking costs back what it saves) and its
            # full-field Mosaic compile blows up at 142k — off by default,
            # SU2_TPU_SST_ASSEMBLE=pallas to enable
            mode = os.environ.get("SU2_TPU_SST_ASSEMBLE")
            if mode:
                sst.set_assemble_mode(mode)
            # fused per-node chemistry source (Arrhenius + PaSR + ln-K
            # lookup in one pass, pallas/chem_source.py)
            from su2_tpu.pallas import chem_source as _pcs
            _pcs.set_chem_source_mode(True)
            # fused TOTAL_CONDITIONS inlet secant (pallas/inlet_tc.py) —
            # marker-batch kernel, not shard-aware: single-chip only
            if ndevices is None:
                from su2_tpu.pallas import inlet_tc as _itc
                _itc.set_inlet_tc_mode(True)
            # NOTE: the (nE, 13, 13) block kernel in pallas/edge_kernels.py
            # (implicit path) stays opt-out: lane padding makes it slower
            # than the XLA chain on v5e; the implicit AUSM+Jacobian path
            # uses ausm_flux_jac_pallas_t instead.
        if cfg.reactive:
            manifest = cfg.resolve(cfg.config_lib_file)
            self.lib = cl.load_library(manifest, cfg.library_path or None, dtype)
            assert self.lib.nspecies == cfg.nspecies, \
                f"mixture has {self.lib.nspecies} species, cfg lists {cfg.nspecies}"
        else:
            # standard solvers run on a single-species calorically perfect gas
            self.lib = cl.ideal_gas_library(
                gamma=cfg.gamma_value, r_gas=cfg.gas_constant,
                prandtl=cfg.prandtl_lam,
                mu_ref=cfg.mu_ref, t_ref_mu=cfg.mu_t_ref,
                s_mu=cfg.sutherland_constant,
                viscosity_model=cfg.viscosity_model,
                mu_constant=cfg.mu_constant,
                conductivity_model=cfg.conductivity_model,
                kt_constant=cfg.kt_constant, dtype=dtype)
            cfg.species_order = ["AIR"]
            cfg.nspecies = 1
            if not cfg.freestream_mass_frac:
                cfg.freestream_mass_frac = [1.0]
        # chemistry tables live on DEVICE: numpy leaves captured in jit
        # closures lower as host literals, which both bloats the serialized
        # module and breaks jax_use_simplified_jaxpr_constants (the
        # million-cell payload-cap workaround — see rans_multistep)
        self.lib = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x) if hasattr(x, "dtype") else x, self.lib)

        if raw_mesh is not None:
            raw = raw_mesh
        else:
            from su2_tpu.io.cgns_mesh import read_mesh
            raw = read_mesh(cfg.resolve(cfg.mesh_filename),
                            cfg.mesh_format)
        self.raw = raw
        self.perm = None
        self.pghost = None
        if ndevices is not None and ndevices > 1:
            from su2_tpu.parallel import sharding as shd
            from su2_tpu.geometry import stencil as stn
            from su2_tpu.parallel.partition import permute_raw_mesh
            # Prefer the static-stencil (row-major structured) ordering:
            # contiguous index bands are spatially compact AND every
            # neighbor access is a roll, which the GSPMD partitioner turns
            # into neighbor collective-permutes of boundary slabs — the
            # ppermute halo exchange of SURVEY §2.3 — instead of the
            # all-gathers that dynamic index gathers force.  RCB is the
            # fallback for genuinely unstructured meshes.
            sgrid = None
            if cfg.extra.get("STENCIL_ORDERING", "YES") != "NO":
                grid0 = build_dual_grid(raw)
                if 0 < len(stn.edge_offsets(grid0.edges)) <= stn.MAX_OFFSETS:
                    sgrid, self.perm = grid0, np.arange(raw.npoint)
                else:
                    sperm = stn.structured_order(raw)
                    if sperm is not None:
                        raw2 = permute_raw_mesh(raw, sperm)
                        grid2 = build_dual_grid(raw2)
                        if 0 < len(stn.edge_offsets(grid2.edges)) \
                                <= stn.MAX_OFFSETS:
                            raw, sgrid, self.perm = raw2, grid2, sperm
            if sgrid is not None:
                self.grid = shd.pad_grid(sgrid, ndevices)
            else:
                # RCB reorder for contiguous per-device spatial blocks
                raw, self.perm = shd.reorder_and_pad(raw, ndevices)
                self.grid = shd.pad_grid(build_dual_grid(raw), ndevices)
            self.dmesh = shd.cells_mesh(devices, ndevices)
            self.mesh = shd.shard_mesh_arrays(
                mesh_arrays(self.grid, dtype), self.dmesh)
        else:
            if cfg.marker_periodic:
                # rotational pairs get a ghost element layer on the raw
                # mesh (translation pairs merge dual CVs in _build below)
                from su2_tpu.geometry.periodic import rotational_ghost_layer
                raw, self.pghost = rotational_ghost_layer(raw, cfg)

            def _build(r):
                g = build_dual_grid(r)
                if cfg.marker_periodic:
                    from su2_tpu.geometry.periodic import \
                        apply_periodic_markers
                    g = apply_periodic_markers(g, cfg)
                if self.pghost is not None:
                    # rotationally periodic faces are interior now: their
                    # markers must not receive boundary treatment
                    rot_tags = set()
                    for ta, (tb, _c, ang, _t) in cfg.marker_periodic.items():
                        if any(abs(x) > 0 for x in ang):
                            rot_tags |= {ta, tb}
                    g = dataclasses_replace(
                        g,
                        bnd_nodes={t: v for t, v in g.bnd_nodes.items()
                                   if t not in rot_tags},
                        bnd_normal={t: v for t, v in g.bnd_normal.items()
                                    if t not in rot_tags},
                        bnd_nn={t: v for t, v in g.bnd_nn.items()
                                if t not in rot_tags})
                return g

            self.grid = _build(raw)
            # static-stencil renumbering (geometry/stencil.py): when the
            # as-read node order has no small neighbor-offset set but the
            # mesh is logically structured, renumber row-major so the
            # implicit solves run gather-free.  State arrays then live in
            # the renumbered order (like the multi-device RCB path);
            # self.perm maps back to file order at the IO boundaries.
            from su2_tpu.geometry import stencil as stn
            if cfg.extra.get("STENCIL_ORDERING", "YES") != "NO" \
                    and self.pghost is None \
                    and len(stn.edge_offsets(self.grid.edges)) \
                    > stn.MAX_OFFSETS:
                sperm = stn.structured_order(raw)
                if sperm is not None:
                    from su2_tpu.parallel.partition import permute_raw_mesh
                    raw2 = permute_raw_mesh(raw, sperm)
                    grid2 = _build(raw2)
                    if 0 < len(stn.edge_offsets(grid2.edges)) \
                            <= stn.MAX_OFFSETS:
                        raw, self.grid, self.perm = raw2, grid2, sperm
            self.dmesh = None
            self.mesh = mesh_arrays(self.grid, dtype)
            # million-cell meshes: lower closed-over mesh arrays as
            # PARAMETERS instead of inlined dense literals — the inlined
            # form serializes hundreds of MB of HLO that the axon
            # remote-compile endpoint rejects (HTTP 413).  The flag is
            # trace-context-keyed, so smaller sims in the same process are
            # unaffected semantically.
            if self.mesh.npoint >= 200_000:
                jax.config.update("jax_use_simplified_jaxpr_constants", True)
                # NOTE: auto-enabling the tiled pallas SST assembly here
                # was measured a net LOSS at 565k (29.2 vs 27.7 ms/iter —
                # the input stacking + windowed-DMA overhead eats the
                # fused-assembly gain, same wash as round 3's 9k
                # full-field finding).  It stays available and tested
                # behind SU2_TPU_SST_ASSEMBLE=pallas.
            # dense per-marker fields as setup-time device buffers (at 2M+
            # cells the trace-time numpy constants exceed the remote-compile
            # payload cap; see timestep.precompute_dense_markers)
            if self.pghost is not None:
                self.mesh = dataclasses_replace(
                    self.mesh,
                    pg_src=jnp.asarray(self.pghost.src, jnp.int32),
                    pg_rot=jnp.asarray(self.pghost.rot, dtype),
                    pg_start=int(self.pghost.start))
            timestep.precompute_dense_markers(self.mesh, dtype)
        self.lay = Layout(self.grid.ndim, cfg.nspecies)
        # Mach/AOA-derived freestream velocity: the config builds the 3D
        # convention (cos a cos b, sin b, sin a cos b) — SU2's AOA lives in
        # the x-z plane in 3D but in the x-y plane in 2D
        # (SetNondimensionalization nDim == 2 branch); the config cannot
        # know ndim, so rewrite the derived vector here
        if self.grid.ndim == 2 and not cfg.was_set("FREESTREAM_VELOCITY") \
                and cfg.mach_number > 0.0 and not cfg.reactive:
            import math
            vmag = float(np.linalg.norm(np.asarray(cfg.freestream_velocity)))
            al = math.radians(cfg.aoa)
            cfg.freestream_velocity = [vmag * math.cos(al),
                                       vmag * math.sin(al), 0.0]

        self.tparams = TSolveParams(
            tmin=cfg.temperature_min, tmax=cfg.temperature_max,
            clip_temp=cfg.clipping_temprature)

        # The reference's reactive nondimensionalization overrides the cfg
        # Mach with the freestream-derived value M = |v_inf|/a_inf
        # (SetMach(ModVel_FreeStream/SoundSpeed_FreeStream),
        # solver_direct_reactive.cpp:973).  It happens on the master rank
        # only (the README's "IMPORTANT REMARK" bug) — we replicate the
        # serial behavior, which is the well-defined one.  This feeds the
        # AUSM+-up reference-Mach clamp, so low-Mach faces see fa(M_inf).
        m_infty = cfg.mach_number
        if cfg.reactive:
            # pure-host evaluation (chemistry/host.py): no jit compile or
            # device readback at setup — the tunnel readback path stalls
            from su2_tpu.chemistry import host as clh
            _, _, _, _, a_inf = clh.freestream_scalars(
                self.lib, cfg.freestream_temperature,
                cfg.freestream_mass_frac)
            modvel = float(np.linalg.norm(
                np.asarray(cfg.freestream_velocity[:self.grid.ndim])))
            if modvel > 0.0 and a_inf > 0.0:
                m_infty = modvel / a_inf

        common = dict(
            lay=self.lay, tparams=self.tparams,
            m_infty=m_infty, cfl=cfg.cfl_number,
            max_dt=cfg.max_delta_time,
            muscl=cfg.muscl_flow, use_limiter=cfg.limiter_flow,
            limiter_kind=cfg.slope_limiter_flow,
            limiter_coeff=cfg.limiter_coeff,
            ref_elem_length=cfg.ref_elem_length,
            grad_method=cfg.num_method_grad,
            conv_method=(cfg.conv_num_method_flow
                         if cfg.conv_num_method_flow in
                         ("ROE", "HLLC", "JST", "LAX-FRIEDRICH")
                         else "AUSM"),
            jst_coeff=(cfg.ad_coeff_flow[1], cfg.ad_coeff_flow[2]),
            lax_coeff=cfg.ad_coeff_flow[0],
            entropy_fix=cfg.entropy_fix_coeff,
            reactive_sources=self.lib.nreactions > 0,
            pasr=cfg.kind_turb_model == "SST",
            pasr_lb=cfg.pasr_lb,
            c_mu=cfg.c_mu,
            axisymmetric=cfg.axisymmetric,
            gravity=cfg.gravity_force,
        )
        if cfg.axisymmetric and self.grid.ndim != 2:
            raise ValueError("AXISYMMETRIC= YES requires a 2D mesh "
                             "(x = axial, y = radial coordinate)")
        # moving grids (motion.py): ROTATING_FRAME is a steady static grid
        # velocity wired into the params here; RIGID_MOTION runs through
        # run_rigid_motion (coords/grid_vel as runtime args via remesh)
        self.motion = None
        if cfg.grid_movement:
            from su2_tpu import motion as mo
            self.motion = mo.from_config(cfg)
            if common["conv_method"] != "ROE":
                raise ValueError(
                    "GRID_MOVEMENT requires CONV_NUM_METHOD_FLOW= ROE "
                    "(the ALE flux is implemented in the Roe kernel)")
            if self.motion.kind == "ROTATING_FRAME":
                common["grid_vel"] = mo.rotating_frame_velocity(
                    self.motion, self.mesh.coords).astype(dtype)
                common["rotation_rate"] = self.motion.rotation_rate
                common["rotating_source"] = True
            elif self.motion.kind == "AEROELASTIC":
                # typical-section aeroelastic coupling — driven through
                # su2_tpu.aeroelastic.run_aeroelastic (round 4)
                pass
            elif self.motion.kind != "RIGID_MOTION":
                raise ValueError(
                    f"GRID_MOVEMENT_KIND= {self.motion.kind} not supported "
                    "(ROTATING_FRAME, RIGID_MOTION and AEROELASTIC are)")
        if cfg.viscous:
            self.params = ns.NSParams(
                prandtl_lam=cfg.prandtl_lam, prandtl_turb=cfg.prandtl_turb,
                lewis_turb=cfg.lewis_turb, **common)
        else:
            self.params = es.EulerParams(**common)
        self.bcs = es.build_bc_markers(cfg, self.lib, self.mesh, self.lay, dtype)
        self.lower, self.upper = es.clip_limits(self.lay, dtype)
        # sharded runs: dense masked BC fields (shard-local BC math —
        # zero marker-scale all-gathers, see solvers/bc_dense.py)
        self.dense_bc = None
        if self.mesh.n_shards > 1:
            from su2_tpu.solvers import bc_dense as _bcd
            self.dense_bc = _bcd.build(self.bcs, self.mesh, self.lay, dtype)

        self.turbulent = cfg.turbulent
        if self.turbulent:
            # wall distance to no-slip walls + freestream turbulence state
            wall_pts = []
            for tag in list(cfg.marker_isothermal) + list(cfg.marker_heatflux):
                wall_pts.append(self.grid.coords[self.grid.bnd_nodes[tag]])
            wall_pts = np.concatenate(wall_pts, axis=0) if wall_pts \
                else np.zeros((0, self.grid.ndim))
            wd = sst.wall_distance(self.grid.coords, wall_pts)
            # padded dummy nodes (multi-device pad_grid) carry unit volume
            # and off-domain coords: zero distance deactivates the SST/SA
            # source there (dist > 1e-10 gate), else their huge spurious
            # source rows inflate the turb RMS by orders of magnitude
            wd[self.raw.npoint:] = 0.0
            self.wall_dist = jnp.asarray(wd, dtype=dtype)
            if self.dmesh is not None:
                from su2_tpu.parallel import sharding as shd
                (self.wall_dist,) = shd.shard_state(self.dmesh, self.wall_dist)
            ys, t_inf, p_inf, rho_inf, vel_inf, _ = self.freestream_primitives()
            mu_inf = self._fs_mu_inf
            self.kine_inf, self.omega_inf, self.mut_inf = sst.freestream(
                cfg, rho_inf, vel_inf, mu_inf)
            if cfg.kind_turb_model == "SA":
                from su2_tpu.turbulence import sa
                self.nu_tilde_inf, self.mut_inf = sa.freestream(
                    cfg, rho_inf, mu_inf)
                self.kine_inf = 0.0
                tu = cfg.freestream_turbulenceintensity
                self.re_theta_inf = float(
                    1173.51 - 589.428 * tu + 0.2196 / (tu * tu)) \
                    if tu <= 1.3 else float(331.5 * (tu - 0.5658) ** -0.671)
            self.params = dataclasses_replace(self.params,
                                              tke_inf=self.kine_inf)
            self.scfg = sst.SSTConfig(
                grad_method=cfg.num_method_grad,
                cfl_red=cfg.cfl_reduction_turb,
                relax=cfg.relaxation_factor_turb,
                linear_solver=cfg.linear_solver,
                linear_iter=cfg.linear_solver_iter,
                linear_tol=cfg.linear_solver_error,
                linear_prec=cfg.linear_solver_prec)
            if os.environ.get("SU2_TPU_SEQ_SGS_FLOW"):
                # validation knob: reference-exact sequential LU-SGS for
                # the FLOW implicit solve (see linalg/seq_sgs.py)
                cfg.linear_solver_prec = "LU_SGS_SEQ"
            if os.environ.get("SU2_TPU_SEQ_SGS_TURB"):
                # validation knob: run the turb solve with the reference's
                # exact sequential natural-order LU-SGS sweep (host
                # callback, linalg/seq_sgs.py) to demonstrate the
                # multicolor-ordering parity deviation
                self.scfg = dataclasses_replace(
                    self.scfg, linear_prec="LU_SGS_SEQ", allow_pallas=False)

        # multicolor masks for the LU_SGS-class preconditioners
        self.color_masks = None
        any_implicit = cfg.implicit_flow or (self.turbulent
                                             and cfg.implicit_turb)
        if any_implicit and cfg.linear_solver_prec != "JACOBI":
            from su2_tpu.linalg import blockcsr
            colors = blockcsr.greedy_coloring(self.grid.node_nbrs)
            masks = [jnp.asarray(colors == c)
                     for c in range(int(colors.max()) + 1)]
            if self.dmesh is not None:
                from su2_tpu.parallel import sharding as shd
                masks = list(shd.shard_state(self.dmesh, *masks))
            self.color_masks = tuple(masks)
            if self.turbulent:
                self.scfg = dataclasses_replace(
                    self.scfg, color_masks=self.color_masks)

        # true linelet structure (wall-normal lines) when requested
        self.linelets = None
        if any_implicit and cfg.linear_solver_prec == "LINELET" \
                and self.dmesh is None:
            from su2_tpu.linalg import linelet as _ll
            self.linelets = _ll.build_linelets(self.mesh, bcs=self.bcs)

        self.history = None
        self.writer_state = None
        self.u0, self.t0 = self.freestream_solution()
        if cfg.restart_sol:
            try:
                self.u0, self.turb_restart = self.load_restart_state()
            except FileNotFoundError:
                print(f"There is no flow restart file!! "
                      f"{cfg.resolve(cfg.solution_flow_filename)}.")
                raise
        if self.dmesh is not None:
            from su2_tpu.parallel import sharding as shd
            self.u0, self.t0 = shd.shard_state(self.dmesh, self.u0, self.t0)
        if self.turbulent:
            self._step = jax.jit(self._make_rans_step())
        elif cfg.implicit_flow:
            self._step = jax.jit(self._make_implicit_step())
        else:
            self._step = jax.jit(self._make_explicit_step())
        self._explicit_step = self._step  # back-compat alias

    # ------------------------------------------------------------------
    def freestream_primitives(self):
        # one jitted evaluation + one readback: the eager op-by-op chain
        # costs ~100s of network round-trips on a tunneled TPU backend
        if getattr(self, "_fs_prims", None) is not None:
            return self._fs_prims
        cfg = self.cfg
        ys = jnp.asarray(cfg.freestream_mass_frac, dtype=self.dtype)
        t_inf = cfg.freestream_temperature
        p_inf = cfg.freestream_pressure

        # pure-host evaluation (chemistry/host.py): the jitted chain this
        # replaces cost a remote compile + a device->host readback at setup
        from su2_tpu.chemistry import host as clh
        rgas, h, mu, _, _ = clh.freestream_scalars(
            self.lib, t_inf, cfg.freestream_mass_frac)
        self._fs_mu_inf = float(mu)
        rho_inf = p_inf / (rgas * t_inf)
        vel_inf = np.array(cfg.freestream_velocity[:self.lay.ndim])
        e_int = h - rgas * t_inf
        energy_inf = e_int + 0.5 * float(vel_inf @ vel_inf)
        self._fs_prims = (ys, t_inf, p_inf, rho_inf, vel_inf, energy_inf)
        return self._fs_prims

    def freestream_solution(self):
        """SetFreeStream_Solution (solver_direct_reactive.cpp:2499-2521)."""
        ys, t_inf, p_inf, rho_inf, vel_inf, energy_inf = self.freestream_primitives()
        n = self.mesh.npoint
        lay = self.lay
        u = np.zeros((n, lay.nvar))
        u[:, lay.RHO] = rho_inf
        u[:, lay.RHOVX:lay.RHOVX + lay.ndim] = rho_inf * vel_inf
        u[:, lay.RHOE] = rho_inf * energy_inf
        u[:, lay.RHOS:lay.RHOS + lay.ns] = rho_inf * np.asarray(ys)
        t_guess = np.full(n, t_inf)
        return (jnp.asarray(u, dtype=self.dtype),
                jnp.asarray(t_guess, dtype=self.dtype))

    # ------------------------------------------------------------------
    def _make_explicit_step(self):
        lib, lay, mesh, prm, bcs = self.lib, self.lay, self.mesh, self.params, self.bcs
        # padded multi-device meshes: RMS divisor uses REAL node count
        # (padded dummy rows carry zero residual)
        rms_scale = float(np.sqrt(self.mesh.npoint / self.raw.npoint))
        tparams = self.tparams
        lower, upper = self.lower, self.upper
        color_masks = self.color_masks
        viscous_mode = self.cfg.viscous
        # multistage RK alphas (ExplicitRK_Iteration,
        # solver_direct_reactive.cpp:2456); single-stage == explicit Euler
        if self.cfg.time_discre_flow == "RUNGE-KUTTA_EXPLICIT":
            alphas = tuple(self.cfg.rk_alpha_coeff)
        else:
            alphas = (1.0,)

        def assemble(u, t_guess):
            if mesh.pg_src is not None:
                # rotational-periodic ghost refresh before every residual
                # evaluation (covers all RK stages)
                u, t_guess = self._pg_refresh_ut(u, t_guess)
            u, v, nonphys = st.cons2prim(lib, lay, u, t_guess, tparams)
            if viscous_mode:
                res, wall_mask, trans, _ = ns.ns_assemble(
                    lib, lay, mesh, prm, bcs, v, dense_bc=self.dense_bc)
            else:
                res, _ = es.total_residual(lib, lay, mesh, prm, bcs, v)
                wall_mask = trans = None
            return u, v, res, wall_mask, trans, nonphys

        def step(u, t_guess, cfl=None):
            cfl = prm.cfl if cfl is None else cfl
            u, v, res, wall_mask, trans, nonphys = assemble(u, t_guess)
            if viscous_mode:
                dpdu_full = st.dpdu(lib, lay, v)
                lam_v = ns.viscous_lambda(
                    lib, mesh, lay, prm, v, trans, dpdu_full, None)
                dt, min_dt, _ = timestep.local_time_step(
                    mesh, lay, v, cfl, prm.max_dt, lam_visc=lam_v,
                    grid_vel=prm.grid_vel)
                u = ns.enforce_wall_velocity(lay, u, wall_mask)
            else:
                dt, min_dt, _ = timestep.local_time_step(
                    mesh, lay, v, cfl, prm.max_dt, grid_vel=prm.grid_vel)
            u_old = u
            u_new, rms, rmax = es.explicit_euler_update(
                lay, mesh, u_old, res, dt, lower, upper, alpha=alphas[0])
            t_cur = v[:, lay.T]
            for alpha in alphas[1:]:
                if viscous_mode:
                    u_new = ns.enforce_wall_velocity(lay, u_new, wall_mask)
                _, v_k, res, wm_k, _, np_k = assemble(u_new, t_cur)
                t_cur = v_k[:, lay.T]
                nonphys = nonphys + np_k
                u_new, rms, rmax = es.explicit_euler_update(
                    lay, mesh, u_old, res, dt, lower, upper, alpha=alpha)
            if viscous_mode:
                u_new = ns.enforce_wall_velocity(lay, u_new, wall_mask)
            return (u_new, t_cur, rms_scale * rms, rmax,
                    nonphys.sum(), min_dt)

        return step

    def _make_implicit_step(self):
        lib, lay, mesh, prm, bcs = self.lib, self.lay, self.mesh, self.params, self.bcs
        rms_scale = float(np.sqrt(self.mesh.npoint / self.raw.npoint))
        tparams = self.tparams
        lower, upper = self.lower, self.upper
        color_masks = self.color_masks
        cfg = self.cfg
        viscous_mode = cfg.viscous

        def step(u, t_guess, cfl=None):
            from su2_tpu.linalg import blockcsr, krylov

            cfl = prm.cfl if cfl is None else cfl

            if mesh.pg_src is not None:
                u, t_guess = self._pg_refresh_ut(u, t_guess)
            u, v, nonphys = st.cons2prim(lib, lay, u, t_guess, tparams)
            if viscous_mode:
                dpdu_full = st.dpdu(lib, lay, v)
                trans0 = ns.viscous.node_transport(lib, lay, v)
                lam_v = ns.viscous_lambda(
                    lib, mesh, lay, prm, v, trans0, dpdu_full, None)
                dt, min_dt, _ = timestep.local_time_step(
                    mesh, lay, v, cfl, prm.max_dt, lam_visc=lam_v)
                res, wall_mask, trans, _, jac = ns.ns_assemble(
                    lib, lay, mesh, prm, bcs, v, dt, implicit=True,
                    dense_bc=self.dense_bc)
                u = ns.enforce_wall_velocity(lay, u, wall_mask)
                rhs = -res
                mv, pc, pm, solve = blockcsr.make_solver_ops(
                    mesh, jac, cfg.linear_solver_prec, color_masks,
                    linelets=self.linelets,
                    linear_iter=cfg.linear_solver_iter)
                if cfg.linear_solver == "BCGSTAB":
                    sol, _, iters = krylov.bcgstab(
                        mv, pc, rhs, max_iter=cfg.linear_solver_iter,
                        tol=cfg.linear_solver_error)
                elif solve is not None:
                    # whole FGMRES cycle in one pallas launch
                    sol, _, iters = solve(rhs, cfg.linear_solver_iter,
                                          cfg.linear_solver_error)
                else:
                    sol, _, iters = krylov.fgmres(
                        mv, pc, rhs, max_iter=cfg.linear_solver_iter,
                        tol=cfg.linear_solver_error, precond_matvec=pm)
                u_new = jnp.clip(u + cfg.relaxation_factor_flow * sol,
                                 lower, upper)
                u_new = ns.enforce_wall_velocity(lay, u_new, wall_mask)
                rms = jnp.sqrt(jnp.mean(rhs * rhs, axis=0))
                rmax = jnp.abs(rhs).max(axis=0)
            else:
                dt, min_dt, _ = timestep.local_time_step(
                    mesh, lay, v, cfl, prm.max_dt)
                u_new, rms, rmax, iters = es.implicit_euler_update(
                    lib, lay, mesh, prm, bcs, u, v, dt, lower, upper,
                    relax=cfg.relaxation_factor_flow,
                    linear_solver=cfg.linear_solver,
                    linear_iter=cfg.linear_solver_iter,
                    linear_tol=cfg.linear_solver_error,
                    precond=cfg.linear_solver_prec,
                    color_masks=color_masks)
            return (u_new, v[:, lay.T], rms_scale * rms, rmax,
                    nonphys.sum(), min_dt)

        return step

    def _make_rans_step(self):
        """Segregated REACTIVE_RANS outer iteration: flow system (with SST
        closures) then SST system on the updated flow state
        (iteration_structure.cpp:531-550)."""
        from su2_tpu.linalg import blockcsr, krylov
        from su2_tpu.ops import viscous as vis

        lib, lay, mesh, prm, bcs = self.lib, self.lay, self.mesh, self.params, self.bcs
        # padded multi-device meshes: RMS divisor uses REAL node count
        # (padded dummy rows carry zero residual)
        rms_scale = float(np.sqrt(self.mesh.npoint / self.raw.npoint))
        tparams = self.tparams
        lower, upper = self.lower, self.upper
        color_masks = self.color_masks
        cfg = self.cfg
        scfg = self.scfg
        dist = self.wall_dist
        implicit_flow = cfg.implicit_flow

        ignition = cfg.ignition
        t_ign = cfg.ignition_temperature
        fuel_i = lay.YS + cfg.fuel_index
        ox_i = lay.YS + cfg.oxidizer_index

        is_sst = cfg.kind_turb_model == "SST"
        dual_order = {"DUAL_TIME_STEPPING-1ST_ORDER": 1,
                      "DT_STEPPING_1ST": 1,
                      "DUAL_TIME_STEPPING-2ND_ORDER": 2,
                      "DT_STEPPING_2ND": 2}.get(cfg.unsteady_simulation, 0)
        dt_phys = cfg.unst_timestep

        def step(u, t_guess, q, mu_t, grad_k, sigma_k, ignite, cfl=None,
                 u_n=None, u_nm1=None):
            # ---------- flow system ----------
            cfl = prm.cfl if cfl is None else cfl
            if mesh.pg_src is not None:
                # rotational-periodic ghost refresh (Set_MPI_Solution
                # rotation as a pure function of the state)
                u = self._pg_refresh_u(u)
                t_guess = t_guess.at[mesh.pg_start:].set(
                    t_guess[mesh.pg_src])
                q = q.at[mesh.pg_start:].set(q[mesh.pg_src])
                mu_t = mu_t.at[mesh.pg_start:].set(mu_t[mesh.pg_src])
                sigma_k = sigma_k.at[mesh.pg_start:].set(
                    sigma_k[mesh.pg_src])
                if is_sst:
                    # grad_k carries the (k, omega) gradient PAIR (N, 2, d)
                    # — spatial vectors, rotated; for SA(+LM) the slot
                    # carries scalar model state (nu_tilde aux / gamma,
                    # Re_theta), which must be copied, not rotated
                    gk = jnp.einsum("ned,nqd->nqe",
                                    mesh.pg_rot.astype(grad_k.dtype),
                                    grad_k[mesh.pg_src])
                else:
                    gk = grad_k[mesh.pg_src]
                grad_k = grad_k.at[mesh.pg_start:].set(gk)
            tke = q[:, 0] if is_sst else jnp.zeros_like(q[:, 0])
            omega_t = q[:, 1]
            # one fused preprocessing pass (SetPrimitive_Variables +
            # dT/dU + dP/dU + transport); with IGNITION the primitive T is
            # overridden afterwards, so the derived fields must be
            # recomputed from the modified v and the bundle is not reused
            nsd = st.node_state(lib, lay, u, t_guess, tparams, turb_ke=tke)
            u, v, nonphys = nsd.u, nsd.v, nsd.nonphys
            if ignition:
                nsd = None
                # force T -> T_ign in fuel-rich cells during the ignition
                # window (SetPrimitive_Variables, solver_direct_reactive.cpp
                # :1013-1024; only the primitive T is overridden, like the
                # reference's SetTemperature)
                cond = ignite & (v[:, fuel_i] > 0.4) & (v[:, ox_i] > 0.2) \
                    & (v[:, lay.T] < t_ign)
                v = v.at[:, lay.T].set(jnp.where(cond, t_ign, v[:, lay.T]))
            turb = vis.TurbFlowData(
                tke=tke, mu_t=mu_t,
                grad_tke=grad_k[:, 0, :] if is_sst else grad_k,
                sigma_k=sigma_k)
            sigma_k_edge = sigma_k[mesh.edges[:, 0]]
            dpdu_full = st.dpdu(lib, lay, v) if nsd is None else nsd.dpdu

            def flow_dt(lam_v, lam_c=None):
                d, mind, _ = timestep.local_time_step(
                    mesh, lay, v, cfl, prm.max_dt, lam_visc=lam_v,
                    lam_inv=lam_c)
                d = timestep.apply_time_marching(
                    d, mind, cfg.unsteady_simulation, cfg.unst_timestep,
                    cfg.unst_cfl_number)
                if dual_order and not implicit_flow:
                    # pseudo time step bounded by the physical step
                    # (SetTime_Step dual-time branch, :2160-2166)
                    d = jnp.minimum(d, 2.0 / 3.0 * dt_phys)
                return d, mind

            if implicit_flow:
                if nsd is None:
                    trans0 = vis.node_transport(lib, lay, v)
                else:
                    trans0 = vis.Transport(mu=nsd.mu, kappa=nsd.kappa,
                                           dij=None)
                lam_v = ns.viscous_lambda(lib, mesh, lay, prm, v, trans0,
                                          dpdu_full, turb)
                dt, min_dt = flow_dt(lam_v)
                res, wall_mask, trans, grad, jac, flow_fb = ns.ns_assemble(
                    lib, lay, mesh, prm, bcs, v, dt, implicit=True,
                    turb=turb, omega_turb=omega_t, sigma_k_edge=sigma_k_edge,
                    nsd=nsd, want_bc_states=True, dense_bc=self.dense_bc)
                if dual_order:
                    res, jac = ns.add_dual_time(
                        lay, mesh, res, jac, u, u_n, u_nm1, dt_phys, dual_order)
                u = ns.enforce_wall_velocity(lay, u, wall_mask)
                rhs = -res
                mv, pc, pm, solve = blockcsr.make_solver_ops(
                    mesh, jac, cfg.linear_solver_prec, color_masks,
                    linelets=self.linelets,
                    linear_iter=cfg.linear_solver_iter)
                if cfg.linear_solver == "BCGSTAB":
                    sol, _, _ = krylov.bcgstab(
                        mv, pc, rhs, max_iter=cfg.linear_solver_iter,
                        tol=cfg.linear_solver_error)
                elif solve is not None:
                    # whole FGMRES cycle in one pallas launch
                    sol, _, _ = solve(rhs, cfg.linear_solver_iter,
                                      cfg.linear_solver_error)
                else:
                    sol, _, _ = krylov.fgmres(
                        mv, pc, rhs, max_iter=cfg.linear_solver_iter,
                        tol=cfg.linear_solver_error, precond_matvec=pm)
                u_new = jnp.clip(u + cfg.relaxation_factor_flow * sol,
                                 lower, upper)
                rms = jnp.sqrt(jnp.mean(rhs * rhs, axis=0))
                rmax = jnp.abs(rhs).max(axis=0)
            else:
                res, wall_mask, trans, grad, lams, flow_fb = ns.ns_assemble(
                    lib, lay, mesh, prm, bcs, v, turb=turb,
                    omega_turb=omega_t, sigma_k_edge=sigma_k_edge,
                    want_lambdas=True, nsd=nsd, want_bc_states=True,
                    dense_bc=self.dense_bc)
                if lams is not None:
                    # fused edge kernel returned the interior spectral-radius
                    # sums for free; add the boundary-vertex terms
                    lam_c = timestep.boundary_lambda_inv(
                        mesh, lay, v, lams[0])
                    lam_v = ns.viscous_lambda_boundary(
                        lib, mesh, lay, prm, v, trans, dpdu_full, turb,
                        lams[1])
                else:
                    lam_c = None
                    lam_v = ns.viscous_lambda(lib, mesh, lay, prm, v, trans,
                                              dpdu_full, turb)
                dt, min_dt = flow_dt(lam_v, lam_c)
                if dual_order:
                    res, _ = ns.add_dual_time(
                        lay, mesh, res, None, u, u_n, u_nm1, dt_phys, dual_order)
                u = ns.enforce_wall_velocity(lay, u, wall_mask)
                u_new, rms, rmax = es.explicit_euler_update(
                    lay, mesh, u, res, dt, lower, upper)
            u_new = ns.enforce_wall_velocity(lay, u_new, wall_mask)

            # ---------- turbulence system on the updated flow ----------
            return turb_phase(u_new, v, tke, q, mu_t, grad_k, sigma_k,
                              dt, flow_fb, rms, rmax, nonphys.sum(),
                              min_dt)

        turb_phase = self._make_turb_phase()
        return step

    # ------------------------------------------------------------------
    def _make_turb_phase(self):
        """Single-grid turbulence phase of the segregated outer iteration
        (CSingleGridIntegration, integration_time.cpp:777), on the
        post-update flow state.  Shared by the plain RANS step and the
        RANS FAS-multigrid drive (where the flow ran the MG cycle first,
        integration_time.cpp:42-125 with the finest-grid handoff :111).

        (Empirically pinned vs the rebuilt reference binary: the turb
        stage sees the POST-update flow — 1-iteration turb fields match
        to <2e-8 except documented wall-omega rows; an all-pre-update
        variant was tested and REGRESSES iteration-0 parity, see
        BASELINE.md round-3 notes.)"""
        from su2_tpu.ops import viscous as vis

        lib, lay, mesh, prm = self.lib, self.lay, self.mesh, self.params
        bcs = self.bcs
        cfg, scfg = self.cfg, self.scfg
        dist = self.wall_dist
        tparams = self.tparams
        rms_scale = float(np.sqrt(self.mesh.npoint / self.raw.npoint))
        is_sst = cfg.kind_turb_model == "SST"

        def turb_phase(u_new, v, tke, q, mu_t, grad_k, sigma_k, dt,
                       flow_fb, rms, rmax, nonphys0, min_dt):
            if mesh.pg_src is not None:
                u_new = self._pg_refresh_u(u_new)
            rho_old = v[:, lay.PRHO]
            # reduced pass: the turb system reads v, X_s, mu and gamma-1
            # only; the full bundle is rebuilt at the next iteration's head
            # (with the updated tke in the temperature secant)
            nsd2 = st.node_state_lite(lib, lay, u_new, v[:, lay.T], tparams,
                                      turb_ke=tke)
            u_new, v_new, nonphys2 = nsd2.u, nsd2.v, nsd2.nonphys
            qgrad = vis.ns_gradient_vars(lib, lay, v_new, xs=nsd2.xs)
            # ride the (k, omega) gradients in the same WLS/GG sweep when
            # the methods match (per-variable math is independent)
            merge_gq = is_sst and scfg.grad_method == cfg.num_method_grad
            gvel_t = None
            if merge_gq:
                nq = qgrad.shape[1]
                qcat = jnp.concatenate([qgrad, q], axis=1)
                # feature-major rows fast path (tiled stencil sweeps): the
                # turb phase reads only the velocity-gradient block and the
                # (k, omega) block — convert those 6 rows instead of
                # retiling the whole (nP, nq+2, d) array
                gall_rows = es.compute_gradient_rows(mesh, prm, qcat)
                if gall_rows is not None:
                    ndm = mesh.ndim
                    gvel_t = gradients.rows_to_grad(
                        gall_rows[ndm:(1 + ndm) * ndm], ndm, ndm)
                    gq_turb = gradients.rows_to_grad(
                        gall_rows[nq * ndm:], 2, ndm)
                    grad_new = None
                else:
                    gall = es.compute_gradients(mesh, prm, qcat)
                    grad_new, gq_turb = gall[:, :nq, :], gall[:, nq:, :]
            else:
                grad_new = es.compute_gradients(mesh, prm, qgrad)
                gq_turb = None
            if gvel_t is not None:
                strain, vort = sst.strain_and_vorticity_g(gvel_t)
            else:
                strain, vort = sst.strain_and_vorticity(lay, grad_new)
            trans_new = vis.Transport(mu=nsd2.mu, kappa=None, dij=None)
            if cfg.kind_turb_model == "SA":
                from su2_tpu.turbulence import sa
                gamma_eff = None
                lm_state = grad_k
                if cfg.kind_trans_model == "LM":
                    # LM transition: in the SA branch the (otherwise unused)
                    # grad_k slot carries (gamma, Re_theta_t) and sigma_k
                    # carries gamma_eff (see initial_turb_state)
                    from su2_tpu.turbulence import translm
                    lm_state, lm_rms, gamma_eff = translm.lm_step(
                        lay, mesh, scfg, bcs, grad_k, v_new, grad_new,
                        trans_new.mu, mu_t, dist, dt,
                        cfg.freestream_turbulenceintensity,
                        self.re_theta_inf)
                    sigma_k = gamma_eff
                nu_new, turb_rms, mu_t_new = sa.sa_step(
                    lay, mesh, scfg, bcs, q[:, 0], v_new, grad_new,
                    trans_new.mu, vort, dist, dt, self.nu_tilde_inf,
                    gamma_trans=gamma_eff)
                q_new = jnp.stack([nu_new, jnp.zeros_like(nu_new)], axis=1)
                turb_rms = jnp.concatenate([turb_rms, turb_rms])
                return (u_new, v_new[:, lay.T], q_new, mu_t_new,
                        lm_state, sigma_k, rms_scale * rms, rmax,
                        rms_scale * turb_rms,
                        nonphys0 + nonphys2.sum(), min_dt)
            q_new, turb_rms, outs = sst.sst_step(
                lay, mesh, scfg, bcs, q, v_new, grad_new,
                trans_new.mu, mu_t, strain, dist, rho_old, dt,
                self.kine_inf, self.omega_inf,
                lib=lib, dpdu_e=nsd2.gm1, tke_inf=prm.tke_inf,
                gq=gq_turb, flow_fb=flow_fb, dense_bc=self.dense_bc,
                gq_prev=grad_k, gvel=gvel_t)
            return (u_new, v_new[:, lay.T], q_new, outs["mu_t"],
                    outs["gq"], outs["sigma_k"], rms_scale * rms, rmax,
                    rms_scale * turb_rms,
                    nonphys0 + nonphys2.sum(), min_dt)

        return turb_phase

    # ------------------------------------------------------------------
    # million-cell compile payload: jit closure constants (the per-node
    # mesh geometry, wall distance, color masks, dense marker fields) are
    # inlined into the serialized StableHLO as dense literals — ~300 B/node,
    # ~700 MB at 2.26M cells, which the axon remote-compile endpoint
    # rejects (HTTP 413).  Above _MESH_ARGS_MIN_NODES the multistep entry
    # points thread them as jit ARGUMENTS instead: the step maker runs
    # UNDER the trace with the traced buffer pytree temporarily bound on
    # self, so every closure captures tracers (parameters), not literals.
    # Boundary-sized constants (marker node lists/normals, BC ghost
    # tables) stay static — bgather's contiguous-run slices need static
    # indices, and they are O(sqrt N).
    _MESH_ARGS_MIN_NODES = 200_000

    def _use_mesh_args(self) -> bool:
        env = os.environ.get("SU2_TPU_MESH_ARGS", "")
        if env == "1":
            return True
        if env == "0":
            return False
        # round-5: sharded simulations compose with the mesh-as-arguments
        # tier — the buffers from shard_mesh_arrays are committed with
        # NamedShardings, so jit infers the in_shardings and GSPMD
        # partitions the traced rolls exactly as in the constant-closure
        # form (pinned by tests/test_parallel.py sharded mesh-args tests)
        return self.mesh.npoint >= self._MESH_ARGS_MIN_NODES

    def _big_buffers(self):
        """The per-node device buffers passed as jit arguments (pytree)."""
        return {
            "mesh": dataclasses_replace(self.mesh, markers=None,
                                        marker_nn=None),
            "dense_cache": dict(getattr(self.mesh, "dense_marker_cache",
                                        None) or {}),
            "wall_dist": self.__dict__.get("wall_dist"),
            "color_masks": self.color_masks,
        }

    def _bind_buffers(self, bufs):
        """Swap the (traced) buffer pytree onto self; returns a restore
        callable.  Only meaningful under an active trace of the multistep
        entry points."""
        saved = (self.mesh, self.__dict__.get("wall_dist"),
                 self.color_masks, self.__dict__.get("scfg"))
        mesh = dataclasses_replace(bufs["mesh"], markers=self.mesh.markers,
                                   marker_nn=self.mesh.marker_nn)
        if bufs["dense_cache"]:
            object.__setattr__(mesh, "dense_marker_cache",
                               bufs["dense_cache"])
        self.mesh = mesh
        if bufs["wall_dist"] is not None:
            self.wall_dist = bufs["wall_dist"]
        if bufs["color_masks"] is not None:
            self.color_masks = tuple(bufs["color_masks"])
            if saved[3] is not None and saved[3].color_masks is not None:
                self.scfg = dataclasses_replace(
                    self.scfg, color_masks=self.color_masks)

        def restore():
            self.mesh, wd, self.color_masks, scfg = saved
            if wd is not None or "wall_dist" in self.__dict__:
                self.wall_dist = wd
            if scfg is not None:
                self.scfg = scfg

        return restore

    def rans_multistep(self, u, t_guess, q, mu_t, grad_k, sigma_k, ignites,
                       cfl=None):
        """K coupled iterations as ONE device program (lax.scan over the
        RANS step).  Amortizes host dispatch: the 9k-cell flagship step is
        ~5.4 ms of device work but ~7.3 ms wall when driven one call per
        iteration.  `ignites` is a (K,) bool array (the per-iteration
        IGNITION window flag); returns the final carry plus stacked
        per-iteration (rms, rmax, turb_rms, nerr, min_dt) histories."""
        if getattr(self, "_multistep_jit", None) is None:
            self._multistep_args = self._use_mesh_args()
            if self._multistep_args:
                def multi(bufs, u, t, q, mu_t, gk, sk, ignites, cfl):
                    restore = self._bind_buffers(bufs)
                    try:
                        raw_step = self._make_rans_step()

                        def body(carry, ignite):
                            out = raw_step(*carry, ignite, cfl=cfl)
                            return out[:6], out[6:]

                        return jax.lax.scan(
                            body, (u, t, q, mu_t, gk, sk), ignites)
                    finally:
                        restore()
            else:
                raw_step = self._make_rans_step()

                def multi(u, t, q, mu_t, gk, sk, ignites, cfl):
                    def body(carry, ignite):
                        out = raw_step(*carry, ignite, cfl=cfl)
                        return out[:6], out[6:]

                    carry, ys = jax.lax.scan(
                        body, (u, t, q, mu_t, gk, sk), ignites)
                    return carry, ys

            self._multistep_jit = jax.jit(multi)
        if self._multistep_args:
            return self._multistep_jit(self._big_buffers(), u, t_guess, q,
                                       mu_t, grad_k, sigma_k, ignites, cfl)
        return self._multistep_jit(u, t_guess, q, mu_t, grad_k, sigma_k,
                                   ignites, cfl)

    def flow_multistep(self, u, t_guess, k: int, cfl=None):
        """K flow-only iterations (explicit or implicit, no turbulence) as
        ONE device program; same dispatch-amortization as rans_multistep.
        Returns the final (u, t) plus stacked (rms, rmax, nerr, min_dt)."""
        if getattr(self, "_flow_multistep_jit", None) is None:
            implicit = self.cfg.time_discre_flow == "EULER_IMPLICIT"
            self._flow_multistep_args = self._use_mesh_args()
            if self._flow_multistep_args:
                def multi(bufs, u, t, cfl, k):
                    restore = self._bind_buffers(bufs)
                    try:
                        raw_step = (self._make_implicit_step() if implicit
                                    else self._make_explicit_step())

                        def body(carry, _):
                            out = raw_step(*carry, cfl=cfl)
                            return out[:2], out[2:]

                        return jax.lax.scan(body, (u, t), None, length=k)
                    finally:
                        restore()

                self._flow_multistep_jit = jax.jit(multi, static_argnums=4)
            else:
                raw_step = (self._make_implicit_step() if implicit
                            else self._make_explicit_step())

                def multi(u, t, cfl, k):
                    def body(carry, _):
                        out = raw_step(*carry, cfl=cfl)
                        return out[:2], out[2:]

                    carry, ys = jax.lax.scan(body, (u, t), None, length=k)
                    return carry, ys

                self._flow_multistep_jit = jax.jit(multi, static_argnums=3)
        if self._flow_multistep_args:
            return self._flow_multistep_jit(self._big_buffers(), u, t_guess,
                                            cfl, k)
        return self._flow_multistep_jit(u, t_guess, cfl, k)

    # ------------------------------------------------------------------
    def load_restart_state(self):
        """RESTART_SOL=YES: read the SU2-format restart (Load_Restart,
        solver_direct_reactive.cpp:566; SST columns
        solver_direct_turbulent.cpp:2839)."""
        from su2_tpu.io import restart as rio
        path = self.cfg.resolve(self.cfg.solution_flow_filename)
        nturb = 2 if self.cfg.turbulent else 0
        u, turb = rio.read_restart(path, self.lay.ndim, self.lay.nvar, nturb)
        if getattr(self, "perm", None) is not None:
            u = u[self.perm]
            turb = turb[self.perm] if turb is not None else None
        n = self.mesh.npoint
        if u.shape[0] < n:      # padded multi-device mesh
            pad = np.asarray(self.u0[u.shape[0]:n])
            u = np.vstack([u, pad])
        return jnp.asarray(u, dtype=self.dtype), turb

    def to_file_order(self, arr):
        """Map a per-node state array from the internal (renumbered/padded)
        node order back to the mesh-file order — the order all external
        artifacts (restart files, reference fixtures, surface data) use."""
        arr = np.asarray(arr)
        n_real = self.raw.npoint
        if getattr(self, "perm", None) is not None:
            out_arr = np.empty((n_real,) + arr.shape[1:], arr.dtype)
            out_arr[self.perm] = arr[:n_real]
            return out_arr
        return arr[:n_real]

    def enable_output(self, out_dir: str | None = None):
        """Turn on history/restart/volume/surface writing (COutput role)."""
        import os as _os
        from su2_tpu.io.output import HistoryWriter
        base = out_dir or _os.getcwd()
        self.out_dir = base
        nturb = 2 if self.turbulent else 0
        self.history = HistoryWriter(
            _os.path.join(base, self.cfg.conv_filename + ".dat"),
            self.lay.nvar, nturb, cfl=self.cfg.cfl_number)
        self.writer_state = True

    def write_solution(self, u, t_guess, turb=None, suffix=""):
        import os as _os
        from su2_tpu.io import output as out, restart as rio
        from su2_tpu import state as st_

        base = getattr(self, "out_dir", _os.getcwd())
        if getattr(self, "_c2p_jit", None) is None:
            self._c2p_jit = jax.jit(lambda uu, tt, ke: st_.cons2prim(
                self.lib, self.lay, uu, tt, self.tparams, turb_ke=ke))
            self._c2p_jit_nok = jax.jit(lambda uu, tt: st_.cons2prim(
                self.lib, self.lay, uu, tt, self.tparams))
        u2, v, _ = (self._c2p_jit(u, t_guess, turb[0][:, 0])
                    if turb is not None else self._c2p_jit_nok(u, t_guess))
        coords = self.raw.coords
        unpermute = self.to_file_order
        un = unpermute(u2)
        turb_np = unpermute(turb[0]) if turb is not None else None
        rname = self.cfg.restart_flow_filename
        if suffix:
            # unsteady per-iteration naming (GetUnsteady_FileName: _%05d)
            stem, ext = _os.path.splitext(rname)
            rname = f"{stem}_{suffix}{ext}"
        rio.write_restart(_os.path.join(base, rname), coords, un, turb_np)
        fields = out._volume_fields(self, u2, v,
                                    turb[0] if turb is not None else None,
                                    turb[1] if turb is not None else None)
        fields = {k: unpermute(c) for k, c in fields.items()}
        if self.cfg.output_format == "PARAVIEW":
            out.write_paraview_volume(
                _os.path.join(base, self.cfg.volume_flow_filename + ".vtk"),
                self.raw, fields)
        elif self.cfg.output_format == "FIELDVIEW":
            out.write_fieldview_volume(
                _os.path.join(base, self.cfg.volume_flow_filename + ".uns"),
                self.raw, fields, mach=self.cfg.mach_number,
                aoa=self.cfg.aoa, reynolds=self.cfg.reynolds_number)
        elif self.cfg.output_format == "TECPLOT_BINARY":
            out.write_tecplot_binary_volume(
                _os.path.join(base, self.cfg.volume_flow_filename + ".plt"),
                self.raw, fields)
        elif self.cfg.output_format == "CGNS_SOL":
            from su2_tpu.io.cgns_out import write_cgns_volume
            write_cgns_volume(
                _os.path.join(base, self.cfg.volume_flow_filename + ".cgns"),
                self.raw, fields)
        else:
            out.write_tecplot_volume(
                _os.path.join(base, self.cfg.volume_flow_filename + ".dat"),
                self.raw, fields)
        plot_markers = self.cfg.marker_plotting or list(self.raw.markers)
        nodes = np.unique(np.concatenate(
            [np.asarray(self.mesh.markers[t][0]) for t in plot_markers
             if t in self.mesh.markers])) if plot_markers else np.array([], int)
        if getattr(self, "perm", None) is not None and len(nodes):
            nodes = np.sort(self.perm[nodes])   # back to original numbering
        if len(nodes):
            out.write_surface_csv(
                _os.path.join(base, self.cfg.surface_flow_filename + ".dat"),
                self.raw, fields, nodes)

    def run_unsteady(self, n_steps: int | None = None, quiet=False):
        """Dual-time-stepping outer loop (DT_STEPPING_1ST/2ND): for each
        physical step, UNST_INT_ITER pseudo-time inner iterations
        (CDriver unsteady loop + SetResidual_DualTime)."""
        assert self.turbulent, "unsteady loop currently drives the RANS step"
        cfg = self.cfg
        dt_phys = cfg.unst_timestep
        if n_steps is None:
            n_steps = max(1, int(cfg.unst_time / dt_phys))
        u = self.u0
        t_guess = self.t0
        q, mu_t, grad_k, sigma_k = self.initial_turb_state()
        u_n = u
        u_nm1 = u
        hist = []
        for step_i in range(n_steps):
            for inner in range(cfg.unst_int_iter):
                ignite = jnp.asarray(False)
                (u, t_guess, q, mu_t, grad_k, sigma_k, rms, rmax, trms,
                 nerr, min_dt) = self._step(u, t_guess, q, mu_t, grad_k,
                                            sigma_k, ignite,
                                            u_n=u_n, u_nm1=u_nm1)
            rms_np = np.asarray(rms)
            if np.isnan(rms_np).any():
                raise RuntimeError(
                    f"NaN residual at iteration {it} "
                    "(SU2 detects the first NaN in the residual and "
                    "exits, solver_direct_reactive.cpp:2861)")
            log_rms = np.log10(np.maximum(rms_np, 1e-300))
            hist.append(log_rms)
            if not quiet:
                print(f"phys step {step_i:5d} t={dt_phys*(step_i+1):.4e}  "
                      f"Res[Rho]: {log_rms[self.lay.RHO]: .6f}")
            if self.writer_state is not None \
                    and (step_i + 1) % self.cfg.wrt_sol_freq_dualtime == 0:
                self.write_solution(u, t_guess, (q, mu_t),
                                    suffix=f"{step_i:05d}")
            u_nm1 = u_n
            u_n = u
        return u, t_guess, np.array(hist), (q, mu_t, grad_k, sigma_k)

    def run_rigid_motion(self, n_steps: int | None = None, quiet=True,
                         monitor_tags=None):
        """Unsteady rigid-motion (ALE) dual-time loop for the inviscid
        standard path (GRID_MOVEMENT_KIND= RIGID_MOTION: rotation +
        pitching + translation, su2_tpu/motion.py; reference:
        Rigid_Rotation/Rigid_Pitching/Rigid_Translation,
        grid_movement_structure.cpp:1955-2550 + the ALE fluxes).

        TPU-native structure: ONE compiled inner-iteration program taking
        coords(t) and grid_vel(t) as runtime arguments — mesh metrics are
        recomputed inside the trace from coordinates via the differentiable
        remesh (geometry/diffgeo.py), so physical steps never retrace.
        Rigid motion keeps volumes constant, so the analytic grid
        velocities satisfy the GCL discretely.

        Returns (u, t_guess, hist, per_step) with per_step a list of
        (t_phys, coords, forces|None)."""
        import dataclasses as _dc

        from su2_tpu import motion as mo
        from su2_tpu.adjoint import _rebuild_bcs
        from su2_tpu.geometry.diffgeo import build_diffgeo, remesh

        assert self.motion is not None and self.motion.kind == "RIGID_MOTION"
        assert not self.turbulent, "rigid motion: inviscid standard path"
        cfg = self.cfg
        mot = self.motion
        dt_phys = cfg.unst_timestep
        dual_order = {"DUAL_TIME_STEPPING-1ST_ORDER": 1, "DT_STEPPING_1ST": 1,
                      "DUAL_TIME_STEPPING-2ND_ORDER": 2,
                      "DT_STEPPING_2ND": 2}.get(cfg.unsteady_simulation, 1)
        if n_steps is None:
            n_steps = max(1, int(cfg.unst_time / dt_phys))
        dgeo = build_diffgeo(self.raw, self.grid)
        base_mesh = self.mesh
        coords0 = base_mesh.coords
        lib, lay, prm, tparams = self.lib, self.lay, self.params, self.tparams
        lower, upper = self.lower, self.upper

        @jax.jit
        def inner(u, t_guess, coords, gvel, u_n, u_nm1):
            # null the stencil fast-path geometry (gg_snormal/wls/fam are
            # precomputed from the BASE coords; consumers must fall back to
            # the exact edge forms evaluated from the remeshed metrics)
            mesh = _dc.replace(
                remesh(base_mesh, dgeo, coords),
                gg_snormal=None, wls_coeff=None, stencil_pvec=None,
                fam_normal=None, fam_evec=None, fam_offsets=None)
            bcs = _rebuild_bcs(self.bcs, mesh)
            prm_t = _dc.replace(prm, grid_vel=gvel)
            u2, v, nonphys = st.cons2prim(lib, lay, u, t_guess, tparams)
            res, _ = es.total_residual(lib, lay, mesh, prm_t, bcs, v)
            res, _ = ns.add_dual_time(lay, mesh, res, None, u2, u_n, u_nm1,
                                      dt_phys, dual_order)
            dt, min_dt, _ = timestep.local_time_step(
                mesh, lay, v, prm.cfl, prm.max_dt, grid_vel=gvel)
            dt = jnp.minimum(dt, 2.0 / 3.0 * dt_phys)
            u_new, rms, _ = es.explicit_euler_update(
                lay, mesh, u2, res, dt, lower, upper)
            return u_new, v[:, lay.T], rms

        u, t_guess = self.u0, self.t0
        u_n = u
        u_nm1 = u
        hist = []
        per_step = []
        for step_i in range(n_steps):
            t_phys = (step_i + 1) * dt_phys
            coords_t = mo.rigid_coords_2d(mot, coords0, t_phys).astype(
                self.dtype)
            gvel = mo.rigid_grid_velocity_2d(mot, coords_t, t_phys).astype(
                self.dtype)
            for _ in range(cfg.unst_int_iter):
                u, t_guess, rms = inner(u, t_guess, coords_t, gvel,
                                        u_n, u_nm1)
            log_rms = np.log10(np.maximum(np.asarray(rms), 1e-300))
            hist.append(log_rms)
            if not quiet:
                print(f"motion step {step_i:5d} t={t_phys:.4e}  "
                      f"Res[Rho]: {log_rms[lay.RHO]: .4f}")
            forces = None
            if monitor_tags:
                forces = self._moving_forces(u, t_guess, coords_t,
                                             dgeo, monitor_tags)
            per_step.append((float(t_phys), coords_t, forces))
            u_nm1 = u_n
            u_n = u
        return u, t_guess, np.array(hist), per_step

    def _moving_forces(self, u, t_guess, coords, dgeo, tags):
        """Inviscid force coefficients on the DISPLACED geometry."""
        from su2_tpu.adjoint import _rebuild_bcs
        from su2_tpu.geometry.diffgeo import remesh
        from su2_tpu.solvers import forces as ff
        from su2_tpu.ops import viscous as vis

        mesh = remesh(self.mesh, dgeo, coords)
        _, v, _ = st.cons2prim(self.lib, self.lay, u, t_guess, self.tparams)
        markers = {}
        bcs = _rebuild_bcs(self.bcs, mesh)
        for tag in tags:
            nodes, normal = mesh.markers[tag]
            markers[tag] = (nodes, normal, self.mesh.marker_nn[tag])
        ys, t_inf, p_inf, rho_inf, vel_inf, _ = self.freestream_primitives()
        ref_area = self.cfg.ref_area if self.cfg.ref_area > 0 else 1.0
        return ff.surface_forces(
            self.lib, self.lay, mesh, v, None, None, markers,
            p_inf, rho_inf, vel_inf, ref_area, viscous=False,
            coords=mesh.coords, ref_len=self.cfg.ref_length,
            aoa_deg=self.cfg.aoa)

    def forces_inputs(self, u, t_guess, turb=None):
        """(v, grad, trans, mu_t) for surface-force/traction evaluation —
        shared by force monitoring and the FSI traction transfer."""
        from su2_tpu.ops import viscous as vis

        u2, v, _ = st.cons2prim(
            self.lib, self.lay, u, t_guess, self.tparams,
            turb_ke=turb[0][:, 0] if turb is not None else None)
        grad = es.compute_gradients(
            self.mesh, self.params, vis.ns_gradient_vars(self.lib, self.lay, v))
        trans = vis.node_transport(self.lib, self.lay, v)
        return v, grad, trans, (turb[1] if turb is not None else None)

    def monitor_forces(self, u, t_guess, turb=None):
        """Force coefficients over MARKER_MONITORING (COutput monitoring)."""
        from su2_tpu.solvers import forces as ff

        v, grad, trans, _ = self.forces_inputs(u, t_guess, turb)
        markers = {}
        for tag in self.cfg.marker_monitoring:
            if tag in self.mesh.markers:
                nodes, normal = self.mesh.markers[tag]
                nn = self.mesh.marker_nn[tag]
                if self.pghost is not None:
                    # exclude the rotational-periodic ghost strip from the
                    # force integration (the reference excludes halo
                    # vertices from force sums)
                    keep = np.asarray(nodes) < self.pghost.start
                    nodes = nodes[jnp.asarray(keep)]
                    normal = normal[jnp.asarray(keep)]
                    nn = nn[jnp.asarray(keep)]
                markers[tag] = (nodes, normal, nn)
        ys, t_inf, p_inf, rho_inf, vel_inf, _ = self.freestream_primitives()
        ref_area = self.cfg.ref_area if self.cfg.ref_area > 0 else 1.0
        return ff.surface_forces(
            self.lib, self.lay, self.mesh, v, grad, trans, markers,
            p_inf, rho_inf, vel_inf, ref_area, viscous=self.cfg.viscous,
            mu_t=turb[1] if turb is not None else None,
            coords=self.mesh.coords,
            origin=(self.cfg.ref_origin_moment_x,
                    self.cfg.ref_origin_moment_y,
                    self.cfg.ref_origin_moment_z),
            ref_len=self.cfg.ref_length, aoa_deg=self.cfg.aoa)

    def write_forces_breakdown(self, u, t_guess, turb=None, path=None):
        """forces_breakdown.dat at end of run (SetForces_Breakdown)."""
        from su2_tpu.io import output as out

        forces = self.monitor_forces(u, t_guess, turb)
        ys, t_inf, p_inf, rho_inf, vel_inf, e_inf = \
            self.freestream_primitives()
        fs = {
            "ndim": self.lay.ndim,
            "Free-stream static pressure": f"{p_inf:g} Pa.",
            "Free-stream temperature": f"{t_inf:g} K.",
            "Free-stream density": f"{rho_inf:g} kg/m^3.",
            "Free-stream velocity":
                f"({', '.join(f'{x:g}' for x in vel_inf)}) m/s. "
                f"Magnitude: {float(np.linalg.norm(vel_inf)):g} m/s.",
            "Free-stream total energy per unit mass":
                f"{e_inf:g} m^2/s^2.",
            "Mach number (non-dim)": f"{self.cfg.mach_number:g}",
            "Angle of attack (AoA)": f"{self.cfg.aoa:g} deg.",
            "Reference area": f"{self.cfg.ref_area:g} m^2.",
            "Reference length (moments)": f"{self.cfg.ref_length:g} m.",
        }
        out.write_forces_breakdown(
            path or self.cfg.breakdown_filename, self.cfg, forces, fs)
        return forces

    def _pg_refresh_u(self, u):
        """Rotational-periodic ghost rows of the conserved state: scalars
        copied, momentum rotated (Set_MPI_Solution rotation)."""
        mesh, lay = self.mesh, self.lay
        rows = u[mesh.pg_src]
        mom = jnp.einsum("nvc,nc->nv", mesh.pg_rot.astype(u.dtype),
                         rows[:, lay.RHOVX:lay.RHOVX + lay.ndim])
        rows = rows.at[:, lay.RHOVX:lay.RHOVX + lay.ndim].set(mom)
        return u.at[mesh.pg_start:].set(rows)

    def _pg_refresh_ut(self, u, t_guess):
        mesh = self.mesh
        return (self._pg_refresh_u(u),
                t_guess.at[mesh.pg_start:].set(t_guess[mesh.pg_src]))

    def initial_turb_state(self):
        n = self.mesh.npoint
        if self.cfg.kind_turb_model == "SA":
            q0 = jnp.tile(jnp.asarray([[self.nu_tilde_inf, 0.0]],
                                      dtype=self.dtype), (n, 1))
        else:
            q0 = jnp.tile(jnp.asarray([[self.kine_inf, self.omega_inf]],
                                      dtype=self.dtype), (n, 1))
        if getattr(self, "turb_restart", None) is not None:
            qr = np.asarray(self.turb_restart)
            q0 = q0.at[:qr.shape[0]].set(jnp.asarray(qr, dtype=self.dtype))
        mu_t0 = jnp.full((n,), min(self.mut_inf, 1.0), dtype=self.dtype)
        if self.cfg.kind_turb_model == "SST":
            # full (k, omega) gradient pair: the carry feeds both the flow
            # side (grad_tke = [:, 0]) and the next step's stored-blending
            # evaluation (sst_step gq_prev)
            grad_k0 = jnp.zeros((n, 2, self.lay.ndim), dtype=self.dtype)
        else:
            grad_k0 = jnp.zeros((n, self.lay.ndim), dtype=self.dtype)
        sigma_k0 = jnp.full((n,), sst.SIGMA_K1, dtype=self.dtype)
        if self.cfg.kind_turb_model == "SA" \
                and self.cfg.kind_trans_model == "LM":
            # SA+LM reuses the grad_k/sigma_k slots for the transition state
            grad_k0 = jnp.tile(jnp.asarray(
                [[1.0, self.re_theta_inf]], dtype=self.dtype), (n, 1))
            sigma_k0 = jnp.ones((n,), dtype=self.dtype)
        if getattr(self, "turb_restart", None) is not None \
                and self.cfg.kind_turb_model == "SST":
            # recompute mu_t / blending / grad k from the restarted state
            # (the reference's turb LoadRestart ends in Postprocessing);
            # jitted: the eager chain costs minutes of per-op round-trips
            # on a tunneled TPU backend
            from su2_tpu.ops import viscous as vis
            lay = self.lay

            def _turb_post(u0, t0, q0):
                u2, v, _ = st.cons2prim(self.lib, lay, u0, t0,
                                        self.tparams, turb_ke=q0[:, 0])
                grad = es.compute_gradients(
                    self.mesh, self.params,
                    vis.ns_gradient_vars(self.lib, lay, v))
                strain, _ = sst.strain_and_vorticity(lay, grad)
                gq = es.compute_gradients(self.mesh, self.params, q0,
                                          vel_rows=None)
                trans = vis.node_transport(self.lib, lay, v)
                f1, f2, _ = sst.blending(q0[:, 0], q0[:, 1], gq[:, 0, :],
                                         gq[:, 1, :], trans.mu,
                                         v[:, lay.PRHO], self.wall_dist)
                mu_t = sst.eddy_viscosity(v[:, lay.PRHO], q0[:, 0], q0[:, 1],
                                          strain, f2)
                return (mu_t, gq,
                        f1 * sst.SIGMA_K1 + (1.0 - f1) * sst.SIGMA_K2)

            mu_t0, grad_k0, sigma_k0 = jax.jit(_turb_post)(
                self.u0, self.t0, q0)
        if self.dmesh is not None:
            from su2_tpu.parallel import sharding as shd
            return shd.shard_state(self.dmesh, q0, mu_t0, grad_k0, sigma_k0)
        return q0, mu_t0, grad_k0, sigma_k0

    # ------------------------------------------------------------------
    def _run_multigrid(self, niter, u, t_guess, quiet, log_every,
                       it0=0, rms0=None):
        """MGLEVEL>0 drive: FAS V/W cycles on the mean flow
        (CMultiGridIntegration::MultiGrid_Cycle, integration_time.cpp:175)."""
        from su2_tpu.multigrid import Multigrid

        if getattr(self, "_mg", None) is None:
            pre = self.cfg.mg_pre_smooth
            post = self.cfg.mg_post_smooth
            self._mg = Multigrid(
                self, n_levels=self.cfg.mglevel + 1,
                pre_smooth=max(1, int(pre[0])) if pre else 2,
                post_smooth=int(post[0]) if post else 0,
                damp_restriction=self.cfg.mg_damp_restriction,
                damp_prolongation=self.cfg.mg_damp_prolongation,
                cycle="W" if self.cfg.mgcycle == "W_CYCLE" else "V")
        hist = []
        start = time.time()
        for it_rel in range(niter):
            it = it0 + it_rel
            u, t_guess, rms = self._mg.step(u, t_guess)
            rms_np = np.asarray(rms)
            if np.isnan(rms_np).any():
                raise RuntimeError(f"NaN residual at MG cycle {it}")
            log_rms = np.log10(np.maximum(rms_np, 1e-300))
            hist.append(log_rms)
            if self.history is not None and it % self.cfg.wrt_con_freq == 0:
                self.history.write(it, log_rms, None,
                                   lin_iters=self.cfg.linear_solver_iter)
            if rms0 is None:
                rms0 = log_rms.copy()
            if not quiet and it % log_every == 0:
                print(f"{it:6d}  MG Res[Rho]: {log_rms[self.lay.RHO]: .6f}  "
                      f"Res[RhoE]: {log_rms[self.lay.RHOE]: .6f}  "
                      f"({time.time()-start:.1f}s)")
            if (self.cfg.conv_criteria == "RESIDUAL"
                    and it > self.cfg.startconv_iter):
                if (log_rms[self.lay.RHO] < self.cfg.residual_minval or
                        rms0[self.lay.RHO] - log_rms[self.lay.RHO]
                        > self.cfg.residual_reduction):
                    break
        return u, t_guess, np.array(hist)

    def _run_multigrid_rans(self, niter, u, t_guess, turb_state, quiet,
                            log_every, it0=0, rms0=None):
        """MGLEVEL>0 RANS drive: mean-flow FAS V/W cycle with the
        turbulence closure FROZEN during the cycle and restricted
        volume-weighted to every coarse level (SetRestricted_EddyVisc,
        integration_time.cpp:875-896), followed by the single-grid
        turbulence phase on the finest mesh (the reference's
        CSingleGridIntegration with the finest-grid flow handoff,
        integration_time.cpp:42-125, :111).  The turb BC ghost states are
        rebuilt from the post-cycle flow state (flow_fb=None) — under MG
        there is no single flow-BC evaluation whose ghost batch spans the
        whole cycle."""
        from su2_tpu.multigrid import Multigrid
        from su2_tpu.ops import viscous as vis

        if getattr(self, "_mg", None) is None:
            pre = self.cfg.mg_pre_smooth
            post = self.cfg.mg_post_smooth
            self._mg = Multigrid(
                self, n_levels=self.cfg.mglevel + 1,
                pre_smooth=max(1, int(pre[0])) if pre else 2,
                post_smooth=int(post[0]) if post else 0,
                damp_restriction=self.cfg.mg_damp_restriction,
                damp_prolongation=self.cfg.mg_damp_prolongation,
                cycle="W" if self.cfg.mgcycle == "W_CYCLE" else "V",
                turbulent=True)
        if getattr(self, "_mg_rans_step", None) is None:
            lib, lay, mesh, prm = self.lib, self.lay, self.mesh, self.params
            tparams = self.tparams
            is_sst = self.cfg.kind_turb_model == "SST"
            cycle = self._mg.cycle_fn
            turb_phase = self._make_turb_phase()

            def mg_step(u, t_guess, q, mu_t, grad_k, sigma_k):
                tke = q[:, 0] if is_sst else jnp.zeros_like(q[:, 0])
                omega_t = q[:, 1]
                nsd = st.node_state(lib, lay, u, t_guess, tparams,
                                    turb_ke=tke)
                u2, v, nonphys = nsd.u, nsd.v, nsd.nonphys
                turbfd = vis.TurbFlowData(
                    tke=tke, mu_t=mu_t,
                    grad_tke=grad_k[:, 0, :] if is_sst else grad_k,
                    sigma_k=sigma_k)
                trans0 = vis.Transport(mu=nsd.mu, kappa=nsd.kappa, dij=None)
                lam_v = ns.viscous_lambda(lib, mesh, lay, prm, v, trans0,
                                          nsd.dpdu, turbfd)
                dt, min_dt, _ = timestep.local_time_step(
                    mesh, lay, v, prm.cfl, prm.max_dt, lam_visc=lam_v)
                u_new, t_new, rms = cycle(u2, t_guess, turbfd, omega_t)
                # per-equation max residual is not tracked inside the MG
                # cycle; reuse the RMS row (only CFL adaptation reads it,
                # which the MG drive does not run)
                return turb_phase(u_new, v, tke, q, mu_t, grad_k, sigma_k,
                                  dt, None, rms, rms, nonphys.sum(),
                                  min_dt)

            self._mg_rans_step = jax.jit(mg_step)

        q, mu_t, grad_k, sigma_k = turb_state
        hist = []
        start = time.time()
        for it_rel in range(niter):
            it = it0 + it_rel
            (u, t_guess, q, mu_t, grad_k, sigma_k, rms, _rmax, turb_rms,
             nerr, _mdt) = self._mg_rans_step(u, t_guess, q, mu_t, grad_k,
                                              sigma_k)
            rms_np = np.asarray(rms)
            if np.isnan(rms_np).any():
                raise RuntimeError(f"NaN residual at MG cycle {it}")
            log_rms = np.log10(np.maximum(rms_np, 1e-300))
            log_trms = np.log10(np.maximum(np.asarray(turb_rms), 1e-300))
            hist.append(log_rms)
            if self.history is not None and it % self.cfg.wrt_con_freq == 0:
                self.history.write(it, log_rms, log_trms,
                                   lin_iters=self.cfg.linear_solver_iter)
            if rms0 is None:
                rms0 = log_rms.copy()
            if not quiet and it % log_every == 0:
                print(f"{it:6d}  MG Res[Rho]: {log_rms[self.lay.RHO]: .6f}"
                      f"  Res[kine]: {log_trms[0]: .6f}"
                      f"  ({time.time()-start:.1f}s)")
            if (self.cfg.conv_criteria == "RESIDUAL"
                    and it > self.cfg.startconv_iter):
                if (log_rms[self.lay.RHO] < self.cfg.residual_minval or
                        rms0[self.lay.RHO] - log_rms[self.lay.RHO]
                        > self.cfg.residual_reduction):
                    break
        return u, t_guess, np.array(hist), (q, mu_t, grad_k, sigma_k)

    def run(self, niter: int | None = None, log_every: int = 1,
            u=None, t_guess=None, turb_state=None, quiet=False,
            chunk: int = 1, it0: int = 0, rms0=None):
        """Main iteration loop.  `it0`/`rms0` continue a previous segment:
        iteration numbering (logs, history file, ignition window,
        convergence start) is absolute (it0+i), and the residual-reduction
        criterion measures against the passed first-iteration rms."""
        niter = niter if niter is not None else self.cfg.ext_iter
        u = self.u0 if u is None else u
        t_guess = self.t0 if t_guess is None else t_guess
        if self.cfg.mglevel > 0:
            # FAS multigrid drive (reference: CMultiGridIntegration,
            # integration_time.cpp:42-125).  The FAS cycle smooths with
            # the configured time integration (explicit multistage OR
            # implicit Euler, round-4) on every level; configurations it
            # cannot honor fail loudly instead of silently running
            # single-grid (round-2 verdict item 4).
            if self.turbulent:
                # round-5: mean-flow FAS inside RANS cases — turbulence
                # frozen+restricted on coarse levels, single-grid turb
                # phase on the finest mesh (integration_time.cpp:42-125,
                # SetRestricted_EddyVisc :875, turb handoff :111)
                if self.cfg.ignition:
                    raise ValueError(
                        "MGLEVEL> 0 with IGNITION= YES is not supported: "
                        "the ignition T-override is a finest-grid forcing "
                        "the FAS cycle cannot honor; set MGLEVEL= 0")
                ts = (turb_state if turb_state is not None
                      else self.initial_turb_state())
                return self._run_multigrid_rans(
                    niter, u, t_guess, ts, quiet, log_every,
                    it0=it0, rms0=rms0)
            # round-4: FAS under EULER_IMPLICIT smooths implicitly on
            # every level (Multigrid._smooth_implicit) — the explicit-only
            # restriction is lifted
            return self._run_multigrid(niter, u, t_guess, quiet, log_every,
                                       it0=it0, rms0=rms0)
        if self.turbulent:
            q, mu_t, grad_k, sigma_k = (turb_state if turb_state is not None
                                        else self.initial_turb_state())
        if chunk > 1 and not self.cfg.cfl_adapt:
            return self._run_chunked(
                niter, chunk, log_every, u, t_guess,
                (q, mu_t, grad_k, sigma_k) if self.turbulent else None,
                quiet, it0=it0, rms0=rms0)
        hist = []
        start = time.time()
        turb_rms = None
        adapt = self.cfg.cfl_adapt
        cfl_now = float(self.cfg.cfl_number)
        rho_res_old = None
        for it_rel in range(niter):
            it = it0 + it_rel
            cfl_arg = jnp.asarray(cfl_now, dtype=self.dtype) if adapt else None
            if self.turbulent:
                ignite = jnp.asarray(
                    self.cfg.ignition and it < self.cfg.ignition_iter)
                (u, t_guess, q, mu_t, grad_k, sigma_k, rms, rmax, turb_rms,
                 nerr, min_dt) = self._step(u, t_guess, q, mu_t, grad_k,
                                            sigma_k, ignite, cfl=cfl_arg)
            else:
                u, t_guess, rms, rmax, nerr, min_dt = self._step(
                    u, t_guess, cfl=cfl_arg)
            rms_np = np.asarray(rms)
            if np.isnan(rms_np).any():
                raise RuntimeError(
                    f"NaN residual at iteration {it} "
                    "(SU2 detects the first NaN in the residual and "
                    "exits, solver_direct_reactive.cpp:2861)")
            log_rms = np.log10(np.maximum(rms_np, 1e-300))
            hist.append(log_rms)
            if adapt:
                # CFL adaption (SetCFL_Number, output_structure.cpp:5975):
                # CFL *= (res_old/res_new)^power, power from CFL_ADAPT_PARAM
                p = self.cfg.cfl_adapt_param
                rho_new = max(float(np.asarray(rms)[self.lay.RHO]), 1e-300)
                rho_old = rho_new if rho_res_old is None else rho_res_old
                div = rho_old / rho_new
                power = p[0] if div < 1.0 else p[1]
                if abs(rho_new - rho_old) <= rho_new * 1e-8 and it != 0:
                    div, power = 0.1, p[1]
                cfl_now *= div ** power
                cfl_now = min(max(cfl_now, 1.001 * p[2]), 0.999 * p[3])
                rho_res_old = rho_new
                self.cfl_now = cfl_now
            if self.history is not None and it % self.cfg.wrt_con_freq == 0:
                tr = (np.log10(np.maximum(np.asarray(turb_rms), 1e-300))
                      if turb_rms is not None else None)
                forces = None
                if self.cfg.marker_monitoring:
                    forces = self.monitor_forces(
                        u, t_guess,
                        (q, mu_t) if self.turbulent else None)
                self.history.write(it, log_rms, tr, forces=forces,
                                   lin_iters=self.cfg.linear_solver_iter)
            if self.writer_state is not None and it > 0 \
                    and it % self.cfg.wrt_sol_freq == 0:
                self.write_solution(u, t_guess,
                                    (q, mu_t) if self.turbulent else None)
            if rms0 is None:
                rms0 = log_rms.copy()
            if not quiet and it % log_every == 0:
                msg = (f"{it:6d}  Res[Rho]: {log_rms[self.lay.RHO]: .6f}  "
                       f"Res[RhoE]: {log_rms[self.lay.RHOE]: .6f}  ")
                if turb_rms is not None:
                    tr = np.log10(np.maximum(np.asarray(turb_rms), 1e-300))
                    msg += f"Res[k]: {tr[0]: .4f}  Res[w]: {tr[1]: .4f}  "
                msg += (f"dt_min: {float(min_dt):.3e}  nonphys: {int(nerr)}  "
                        f"({time.time()-start:.1f}s)")
                print(msg)
            # convergence: residual order reduction / min value, or a Cauchy
            # series on a monitored functional (integration_structure.cpp:425)
            if self.cfg.conv_criteria == "RESIDUAL" and it > self.cfg.startconv_iter:
                if (log_rms[self.lay.RHO] < self.cfg.residual_minval or
                        rms0[self.lay.RHO] - log_rms[self.lay.RHO]
                        > self.cfg.residual_reduction):
                    break
            elif (self.cfg.conv_criteria == "CAUCHY"
                  and self.cfg.marker_monitoring
                  and it > self.cfg.startconv_iter):
                f = self.monitor_forces(
                    u, t_guess, (q, mu_t) if self.turbulent else None)
                func = f["CD"] if self.cfg.cauchy_func_flow == "DRAG" else f["CL"]
                if not hasattr(self, "_cauchy_hist"):
                    self._cauchy_hist = []
                self._cauchy_hist.append(func)
                ne = self.cfg.cauchy_elems
                if len(self._cauchy_hist) > ne:
                    diffs = np.abs(np.diff(self._cauchy_hist[-ne:]))
                    if diffs.mean() < self.cfg.cauchy_eps:
                        break
        if self.turbulent:
            return u, t_guess, np.array(hist), (q, mu_t, grad_k, sigma_k)
        return u, t_guess, np.array(hist)

    def _run_chunked(self, niter, chunk, log_every, u, t_guess, turb_state,
                     quiet, it0: int = 0, rms0=None):
        """Chunked driver loop: K iterations per device program via
        rans_multistep / flow_multistep.  Host-side work (history lines,
        convergence checks, solution writes) happens at chunk boundaries
        from the stacked per-iteration residual histories; the RESIDUAL
        criterion is detected at the exact in-chunk iteration (history is
        truncated there), but the returned state is the end-of-chunk state
        — up to chunk-1 extra iterations of integration."""
        turbulent = turb_state is not None
        if turbulent:
            q, mu_t, grad_k, sigma_k = turb_state
        cfg = self.cfg
        hist = []
        start = time.time()
        it = 0
        converged = False
        # keep one chunk size -> one compiled program; trailing remainder
        # iterations run through the per-iteration path
        while it < niter:
            k = min(chunk, niter - it)
            if k < chunk:
                break
            if turbulent:
                if cfg.ignition:
                    ignites = (np.arange(it0 + it, it0 + it + k)
                               < cfg.ignition_iter)
                else:
                    ignites = np.zeros(k, bool)
                carry, ys = self.rans_multistep(
                    u, t_guess, q, mu_t, grad_k, sigma_k,
                    jnp.asarray(ignites))
                u, t_guess, q, mu_t, grad_k, sigma_k = carry
                trms_a = np.asarray(ys[2])
                nerr_a = np.asarray(ys[3])
                mind_a = np.asarray(ys[4])
                log_trms_a = np.log10(np.maximum(trms_a, 1e-300))
            else:
                (u, t_guess), ys = self.flow_multistep(u, t_guess, k)
                nerr_a = np.asarray(ys[2])
                mind_a = np.asarray(ys[3])
                log_trms_a = None
            rms_a = np.asarray(ys[0])
            if np.isnan(rms_a).any():
                bad = int(np.where(np.isnan(rms_a).any(axis=1))[0][0])
                raise RuntimeError(
                    f"NaN residual at iteration {it0 + it + bad} "
                    "(SU2 detects the first NaN in the residual and "
                    "exits, solver_direct_reactive.cpp:2861)")
            log_rms_a = np.log10(np.maximum(rms_a, 1e-300))
            converged = False
            for j in range(k):
                gi = it0 + it + j
                hist.append(log_rms_a[j])
                if rms0 is None:
                    rms0 = log_rms_a[j].copy()
                if self.history is not None and gi % cfg.wrt_con_freq == 0:
                    self.history.write(
                        gi, log_rms_a[j],
                        log_trms_a[j] if turbulent else None,
                        lin_iters=cfg.linear_solver_iter)
                if not quiet and gi % log_every == 0:
                    msg = (f"{gi:6d}  Res[Rho]: "
                           f"{log_rms_a[j][self.lay.RHO]: .6f}  "
                           f"Res[RhoE]: {log_rms_a[j][self.lay.RHOE]: .6f}  ")
                    if turbulent:
                        msg += (f"Res[k]: {log_trms_a[j][0]: .4f}  "
                                f"Res[w]: {log_trms_a[j][1]: .4f}  ")
                    msg += (f"dt_min: {float(mind_a[j]):.3e}  "
                            f"nonphys: {int(nerr_a[j])}  "
                            f"({time.time()-start:.1f}s)")
                    print(msg)
                if cfg.conv_criteria == "RESIDUAL" and gi > cfg.startconv_iter:
                    cur = log_rms_a[j][self.lay.RHO]
                    if (cur < cfg.residual_minval or
                            rms0[self.lay.RHO] - cur
                            > cfg.residual_reduction):
                        converged = True
                        break
            it += k
            if converged:
                break
            if (self.writer_state is not None
                    and (it0 + it) % cfg.wrt_sol_freq == 0):
                self.write_solution(
                    u, t_guess, (q, mu_t) if turbulent else None)
        if it < niter and not converged:   # trailing remainder
            out = self.run(niter - it, log_every, u, t_guess,
                           (q, mu_t, grad_k, sigma_k) if turbulent else None,
                           quiet, it0=it0 + it, rms0=rms0)
            if turbulent:
                u, t_guess, h2, (q, mu_t, grad_k, sigma_k) = out
            else:
                u, t_guess, h2 = out
            hist.extend(list(h2))
        if turbulent:
            return u, t_guess, np.array(hist), (q, mu_t, grad_k, sigma_k)
        return u, t_guess, np.array(hist)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m su2_tpu.driver <config.cfg> [niter]")
        return 1
    cfg = Config(argv[0])
    niter = int(argv[1]) if len(argv) > 1 else None
    # SU2_TPU_DEVICES=N shards the mesh over N devices (the mpirun -n N
    # analog; structured-band sharding, parallel/sharding.py)
    env_dev = os.environ.get("SU2_TPU_DEVICES")
    ndevices = int(env_dev) if env_dev else None
    # SU2_TPU_DTYPE=float64 selects the high-precision tier — on TPU the
    # f64 arithmetic is XLA-emulated (double-float), the path that makes
    # the reference's RESIDUAL_REDUCTION= 6 criterion reachable on chip
    # (the f32 tier plateaus at ~4.6 orders; see BASELINE.md).  Without it
    # the production tier is f32 (pallas kernels on TPU).
    if os.environ.get("SU2_TPU_DTYPE") == "float64":
        from su2_tpu.precision import enable_x64
        enable_x64()
        dtype = jnp.float64
    else:
        dtype = jnp.float32
    sim = Simulation(cfg, dtype=dtype, ndevices=ndevices)
    sim.enable_output()
    # Device-chunked main loop: K iterations per XLA program (lax.scan),
    # amortizing the per-call host dispatch (the flagship combustion step
    # is ~0.5 ms of device work but ~6 ms of tunnel latency per call).
    # Per-iteration path when the host needs state every iteration:
    # adaptive CFL (host feedback loop) or per-iteration force monitoring
    # in the history file.  Override with SU2_TPU_CHUNK=<K> (1 disables).
    env_chunk = os.environ.get("SU2_TPU_CHUNK")
    if env_chunk is not None:
        chunk = max(1, int(env_chunk))
    elif cfg.cfl_adapt or cfg.marker_monitoring:
        chunk = 1
    else:
        chunk = 25
    out = sim.run(niter, chunk=chunk)
    if sim.turbulent:
        u, t_guess, hist, turb_state = out
        sim.write_solution(u, t_guess, (turb_state[0], turb_state[1]))
    else:
        u, t_guess, hist = out
        sim.write_solution(u, t_guess)
    if cfg.marker_monitoring:
        sim.write_forces_breakdown(
            u, t_guess,
            (turb_state[0], turb_state[1]) if sim.turbulent else None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
