"""Partitioned fluid-structure interaction driver.

Re-implementation of the reference's CFSIDriver::Run
(SU2_CFD/src/driver_structure.cpp:4172) as a host-level fixed-point loop
composing the framework's existing pieces:

  flow zone (Simulation)  --tractions-->  structure zone (elasticity FEM)
        ^                                        |
        +---------- interface displacements <----+

Per FSI subiteration (same order as the reference):
  1. Transfer_Displacements (driver_structure.cpp:4420): interpolate the
     predicted structural interface displacement to the flow marker and
     propagate it into the flow volume mesh (deform.deform_coords =
     CVolumetricMovement::SetVolume_Deformation).
  2. Fluid subiteration: rebuild the dual grid on the displaced coordinates
     and advance the flow (warm-started from the previous state).
  3. Transfer_Tractions (driver_structure.cpp:4441): per-vertex wall
     traction t = -(p - p_inf) n_f + tau . n_f with the INTO-FLUID area
     normal n_f (CTransfer_FlowTraction::GetDonor_Variable,
     transfer_physics.cpp:384-456), conservatively rescaled so the total
     transferred force matches the flow-side integral.
  4. Structural subiteration: linear-elastic FEM with the transferred nodal
     loads (solvers/elasticity.py).
  5. Relaxation_Displacements with Aitken's dynamic coefficient
     (CFEM_ElasticitySolver::ComputeAitken_Coefficient,
     solver_direct_elasticity.cpp:3882):
         w_0   = clip(w_restart, min_init, max_init)
         w_k+1 = clip(-w_k * <dU_k, dU_k+1 - dU_k> / |dU_k+1 - dU_k|^2,
                      0.1, 1.0)
     where dU = dispCalc - dispPred, then
         dispPred += w * (dispCalc - dispPred)   (SetAitken_Relaxation).
  6. FSI convergence on log10 RMS of (dispCalc - dispPred)
     (CIntegration::Convergence_Monitoring_FSI).

The flow state (not just the mesh) carries across subiterations exactly as
the reference keeps its solver containers alive across the FSI loop.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from su2_tpu import transfer
from su2_tpu.io.mesh import RawMesh
from su2_tpu.solvers import elasticity


def marker_node_set(raw: RawMesh, tag: str) -> np.ndarray:
    """Unique node ids of a RawMesh boundary marker."""
    elems = np.asarray(raw.markers[tag])
    return np.unique(elems[elems >= 0])


@dataclass
class StructuralZone:
    """The FEA zone: mesh, material, clamped markers, wet interface."""
    raw: RawMesh
    e_mod: float
    nu: float
    clamp_tags: list
    interface_tag: str
    n_cg_iter: int = 2000

    def __post_init__(self):
        self.interface_nodes = marker_node_set(self.raw, self.interface_tag)
        mask = np.zeros(self.raw.npoint, dtype=bool)
        for t in self.clamp_tags:
            mask[marker_node_set(self.raw, t)] = True
        self.clamp_mask = mask


@dataclass
class FSIHistory:
    aitken: list = field(default_factory=list)
    log_res: list = field(default_factory=list)
    tip: list = field(default_factory=list)


class FSIDriver:
    """Two-zone partitioned FSI (flow zone 0, structure zone 1), steady.

    flow_factory(coords) -> Simulation: rebuilds the flow zone on displaced
    RawMesh coordinates (the caller owns cfg/mesh generation so any flow
    configuration works).  flow_interface_tag names the wet flow marker.
    """

    def __init__(self, flow_factory, flow_raw: RawMesh,
                 flow_interface_tag: str, struct: StructuralZone,
                 n_fsi_iter: int = 12, flow_iters: int = 200,
                 relax_method: str = "AITKEN_DYNAMIC",
                 aitken_init: float = 0.5, aitken_max_init: float = 0.5,
                 aitken_min_init: float = 0.0,
                 fsi_tol_orders: float = 5.0):
        self.flow_factory = flow_factory
        self.flow_raw = flow_raw
        self.flow_tag = flow_interface_tag
        self.struct = struct
        self.n_fsi = n_fsi_iter
        self.flow_iters = flow_iters
        self.relax_method = relax_method
        self.w_restart = aitken_init
        self.w_max0, self.w_min0 = aitken_max_init, aitken_min_init
        self.fsi_tol = fsi_tol_orders

        # interface interpolators both ways (non-matching grids supported;
        # the toy cases use coincident nodes where NN transfer is exact)
        sim0 = flow_factory(np.asarray(flow_raw.coords))
        fnodes, _ = sim0.mesh.markers[flow_interface_tag]
        self.flow_if_nodes = np.asarray(fnodes)
        cf = np.asarray(flow_raw.coords)[self.flow_if_nodes]
        cs = np.asarray(struct.raw.coords)[struct.interface_nodes]
        self.s2f = transfer.nearest_neighbor(cs, cf)
        self.f2s = transfer.nearest_neighbor(cf, cs)
        self._sim0 = sim0

    # -- step 1: displacements ------------------------------------------
    def _displace_flow_mesh(self, disp_pred: np.ndarray) -> RawMesh:
        from dataclasses import replace as dc_replace

        d_if = transfer.transfer_field(
            self.s2f, disp_pred[self.struct.interface_nodes])
        marker_disp = np.zeros((self.flow_raw.npoint, self.flow_raw.ndim))
        marker_disp[self.flow_if_nodes] = np.asarray(d_if)
        from su2_tpu.deform import deform_coords
        new_coords = np.asarray(deform_coords(
            self._sim0.mesh, marker_disp, n_iter=400))
        return dc_replace(self.flow_raw, coords=new_coords)

    # -- step 3: tractions ----------------------------------------------
    def _wall_tractions(self, sim, u, t_guess, turb) -> np.ndarray:
        """Per-vertex traction FORCE vectors on the flow interface marker
        (area-weighted; the dual-face vertex normal carries the area)."""
        from su2_tpu.solvers.forces import _marker_forces

        v, grad, trans, mu_t = sim.forces_inputs(u, t_guess, turb)
        nodes, normal = sim.mesh.markers[self.flow_tag]
        _, _, p_inf, _, _, _ = sim.freestream_primitives()
        _, _, _, _, fvec_p, fvec_f = _marker_forces(
            sim.lay, v, grad, trans, np.asarray(nodes), np.asarray(normal),
            p_inf, mu_t, sim.cfg.viscous)
        return fvec_p + fvec_f

    def _transfer_loads(self, trac: np.ndarray) -> np.ndarray:
        loads = np.zeros((self.struct.raw.npoint, self.struct.raw.ndim))
        t_s = np.asarray(transfer.transfer_field(self.f2s, trac))
        # conservative rescaling per component: NN duplication on
        # non-matching interfaces must not change the total load
        tot_f = trac.sum(axis=0)
        tot_s = t_s.sum(axis=0)
        scale = np.where(np.abs(tot_s) > 1e-300, tot_f / np.where(
            np.abs(tot_s) > 1e-300, tot_s, 1.0), 1.0)
        loads[self.struct.interface_nodes] = t_s * scale
        return loads

    # -- main loop -------------------------------------------------------
    def run(self, quiet: bool = True):
        st = self.struct
        n_s = st.raw.npoint
        disp_pred = np.zeros((n_s, st.raw.ndim))
        disp_pred_old = np.zeros_like(disp_pred)
        disp_calc_old = np.zeros_like(disp_pred)
        w = min(max(self.w_restart, self.w_min0), self.w_max0)
        hist = FSIHistory()
        flow_state = None
        sim = None

        for it in range(self.n_fsi):
            # 1. displacements -> flow mesh
            raw_disp = self._displace_flow_mesh(disp_pred)
            sim = self.flow_factory(raw_disp.coords)
            # 2. fluid subiteration (warm start)
            if flow_state is None:
                out = sim.run(self.flow_iters, quiet=True)
            else:
                out = sim.run(self.flow_iters, quiet=True,
                              u=flow_state[0], t_guess=flow_state[1],
                              turb_state=flow_state[2])
            if len(out) == 4:
                u, t_guess, _, turb = out
            else:
                u, t_guess, _ = out
                turb = None
            flow_state = (u, t_guess, turb)
            # 3. tractions -> structural loads
            loads = self._transfer_loads(
                self._wall_tractions(sim, u, t_guess, turb))
            # 4. structural subiteration
            disp_calc = np.asarray(elasticity.solve_elasticity(
                st.raw, st.clamp_mask, np.zeros_like(disp_pred),
                e_mod=st.e_mod, nu=st.nu, loads=loads,
                n_iter=st.n_cg_iter))
            # 5. Aitken relaxation
            if self.relax_method == "AITKEN_DYNAMIC" and it > 0:
                du = disp_calc_old - disp_pred_old
                du1 = disp_calc - disp_pred
                dd = du1 - du
                den = float((dd * dd).sum())
                if den > 1e-15:
                    w = -w * float((du * dd).sum()) / den
                w = min(max(w, 0.1), 1.0)
            elif self.relax_method == "FIXED_PARAMETER":
                w = self.w_restart
            disp_pred_old = disp_pred.copy()
            disp_calc_old = disp_calc.copy()
            resid = disp_calc - disp_pred
            disp_pred = disp_pred + w * resid
            # 6. convergence monitor
            rms = float(np.sqrt((resid * resid).mean()))
            ref = max(float(np.abs(disp_calc).max()), 1e-300)
            log_res = np.log10(max(rms / ref, 1e-300))
            hist.aitken.append(w)
            hist.log_res.append(log_res)
            hist.tip.append(float(np.abs(disp_calc).max()))
            if not quiet:
                print(f"FSI iter {it:3d}  w={w:.4f}  "
                      f"log10|dU|/|U| = {log_res:.4f}")
            if log_res < -self.fsi_tol:
                break
        return disp_pred, (sim, *flow_state), hist
