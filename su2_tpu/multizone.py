"""Multi-zone coupling driver.

Reference capability: the multizone CDriver machinery + CInterpolator /
CTransfer (driver_structure.cpp multizone loop, interpolation_structure.cpp,
transfer_physics.cpp) used for FSI and conjugate-heat problems.

This driver couples scalar (heat) zones with a Dirichlet-Neumann partition:
the donor zone supplies interface temperature, the receiver returns the
interface heat flux; interface fields move through the static-gather
Interpolator (transfer.py), so non-matching interface discretizations work.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu import transfer
from su2_tpu.geometry.mesh_data import MeshArrays
from su2_tpu.solvers import scalar


@dataclass
class HeatZone:
    mesh: MeshArrays
    alpha: float
    dirichlet_nodes: np.ndarray
    dirichlet_vals: np.ndarray
    interface_tag: str


class ConjugateHeatDriver:
    """Two heat zones exchanging T (A->B) and flux-consistent T gradients
    implicitly through alternating steady Poisson solves."""

    def __init__(self, zone_a: HeatZone, zone_b: HeatZone):
        self.a, self.b = zone_a, zone_b
        na, _ = zone_a.mesh.markers[zone_a.interface_tag]
        nb, _ = zone_b.mesh.markers[zone_b.interface_tag]
        self.if_a = np.asarray(na)
        self.if_b = np.asarray(nb)
        ca = np.asarray(zone_a.mesh.coords)[self.if_a]
        cb = np.asarray(zone_b.mesh.coords)[self.if_b]
        # donor tables both ways (nearest-neighbor; isoparametric for lines
        # is available in transfer.py when the interface has elements)
        self.a_to_b = transfer.nearest_neighbor(ca, cb)
        self.b_to_a = transfer.nearest_neighbor(cb, ca)

    def run(self, n_outer: int = 60, relax: float = 0.6):
        """Dirichlet-Neumann iteration: zone A takes interface temperature,
        zone B takes the (discrete) interface heat flux; at convergence the
        interface nodes satisfy the coupled balance lap_A + lap_B = 0
        (CTransfer conjugate-heat pattern)."""
        t_if_a = jnp.zeros(len(self.if_a), dtype=jnp.float64)
        hist = []
        t_a = t_b = None
        for _ in range(n_outer):
            # A: Dirichlet at the interface
            nodes_a = np.concatenate([self.a.dirichlet_nodes, self.if_a])
            vals_a = jnp.concatenate([
                jnp.asarray(self.a.dirichlet_vals, dtype=jnp.float64),
                t_if_a])
            t_a = scalar.solve_poisson(
                self.a.mesh, jnp.zeros(self.a.mesh.npoint),
                jnp.asarray(nodes_a), vals_a, n_iter=800, tol=1e-14)
            # discrete flux into A through its interface CV boundary
            q_a = scalar.laplacian(self.a.mesh, t_a)[jnp.asarray(self.if_a)]
            # B: Neumann at the interface (conjugate flux), far Dirichlet.
            # Conservative rescaling: interpolation duplicates donors on
            # non-matching interfaces; preserve the TOTAL interface flux
            # (the reference's conservative CTransfer option)
            q_b = transfer.transfer_field(self.a_to_b, q_a)
            tot_a = jnp.sum(q_a)
            tot_b = jnp.sum(q_b)
            q_b = q_b * jnp.where(jnp.abs(tot_b) > 1e-300,
                                  tot_a / tot_b, 1.0)
            src = jnp.zeros(self.b.mesh.npoint, dtype=jnp.float64)
            src = src.at[jnp.asarray(self.if_b)].add(q_b)
            t_b = scalar.solve_poisson(
                self.b.mesh, jnp.zeros(self.b.mesh.npoint),
                jnp.asarray(self.b.dirichlet_nodes),
                jnp.asarray(self.b.dirichlet_vals, dtype=jnp.float64),
                n_iter=800, tol=1e-14, point_sources=src)
            # updated interface temperature back to A, relaxed
            t_back = transfer.transfer_field(self.b_to_a,
                                             t_b[jnp.asarray(self.if_b)])
            delta = float(jnp.abs(t_back - t_if_a).max())
            hist.append(delta)
            t_if_a = (1.0 - relax) * t_if_a + relax * t_back
            if delta < 1e-12:
                break
        return t_a, t_b, np.asarray(hist)
