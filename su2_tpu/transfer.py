"""Multi-zone interpolation + transfer.

Reference capability: CInterpolator (nearest-neighbor, isoparametric) in
Common/src/interpolation_structure.cpp and the CTransfer containers in
SU2_CFD/src/transfer_*.cpp (FSI / multizone coupling).

Setup (donor search) runs on the host with the ADT; the transfer itself is
a static gather + weighted sum, so it jits into the coupled step like every
other kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from su2_tpu.geometry.adt import ADT


@dataclass(frozen=True)
class Interpolator:
    """Static donor table: target value = sum_k w_k donor[idx_k]."""
    donor_idx: jax.Array    # (nT, K) int32
    weights: jax.Array      # (nT, K)

    def apply(self, donor_field: jax.Array) -> jax.Array:
        return jnp.einsum("tk,tk...->t...", self.weights,
                          donor_field[self.donor_idx])


def nearest_neighbor(donor_coords: np.ndarray,
                     target_coords: np.ndarray) -> Interpolator:
    """CNearestNeighbor equivalent (interpolation_structure.cpp:262)."""
    tree = ADT(donor_coords)
    idx, _ = tree.query(target_coords)
    return Interpolator(
        donor_idx=jnp.asarray(idx[:, None], dtype=jnp.int32),
        weights=jnp.ones((len(idx), 1)))


def isoparametric_lines(donor_coords: np.ndarray, donor_lines: np.ndarray,
                        target_coords: np.ndarray) -> Interpolator:
    """CIsoparametric for 2D boundary line elements: project each target
    point on the closest donor segment, linear weights along it
    (interpolation_structure.cpp:471)."""
    p0 = donor_coords[donor_lines[:, 0]]
    p1 = donor_coords[donor_lines[:, 1]]
    d = p1 - p0
    len2 = np.maximum((d * d).sum(axis=1), 1e-300)
    nt = len(target_coords)
    idx = np.zeros((nt, 2), dtype=np.int64)
    w = np.zeros((nt, 2))
    for k, q in enumerate(np.asarray(target_coords)):
        t = np.clip(((q - p0) * d).sum(axis=1) / len2, 0.0, 1.0)
        proj = p0 + t[:, None] * d
        dist2 = ((proj - q) ** 2).sum(axis=1)
        e = int(np.argmin(dist2))
        idx[k] = donor_lines[e]
        w[k] = (1.0 - t[e], t[e])
    return Interpolator(donor_idx=jnp.asarray(idx, dtype=jnp.int32),
                        weights=jnp.asarray(w))


def transfer_field(interp: Interpolator, donor_field) -> jax.Array:
    """CTransfer::Broadcast equivalent: move a (nDonor, ...) field to the
    target side."""
    return interp.apply(jnp.asarray(donor_field))
