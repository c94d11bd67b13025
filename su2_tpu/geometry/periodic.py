"""Periodic boundaries by dual-CV merging.

Reference capability: MARKER_PERIODIC + SU2_MSH's periodic ghost-layer setup
(CPhysicalGeometry periodic donor search, Common/src/geometry_structure.cpp;
solver-side rotation/translation in the Set_MPI_* halo exchanges).

TPU-native design: instead of ghost layers exchanged every iteration, the
paired boundary vertices are merged into single dual CVs at setup — edges
crossing the cut are re-glued, volumes summed, and the periodic markers
disappear.  Periodicity then costs nothing at runtime and is exact for
translational periodicity (dual-face normals are translation-invariant;
the duplicated half-faces along the cut share states and unit direction, so
their fluxes sum exactly to the full-face flux).  Rotational periodicity
needs a frame rotation per crossing edge and is left for a later round.
"""

from __future__ import annotations

from dataclasses import replace as dc_replace

import numpy as np

from su2_tpu.geometry.dual_grid import DualGrid, _adjacency_tables


def match_periodic_nodes(grid: DualGrid, tag_a: str, tag_b: str,
                         translation, tol: float = 1e-8) -> np.ndarray:
    """(nPair, 2) node pairs with coords[b] == coords[a] + translation."""
    a_nodes = np.asarray(grid.bnd_nodes[tag_a])
    b_nodes = np.asarray(grid.bnd_nodes[tag_b])
    a_xy = grid.coords[a_nodes] + np.asarray(translation)[:grid.ndim]
    b_xy = grid.coords[b_nodes]
    pairs = []
    for k, bx in zip(b_nodes, b_xy):
        d2 = ((a_xy - bx) ** 2).sum(axis=1)
        m = int(np.argmin(d2))
        if d2[m] > tol * tol:
            raise ValueError(
                f"periodic match failed for node {k}: nearest donor at "
                f"distance {np.sqrt(d2[m]):.3e}")
        pairs.append((int(a_nodes[m]), int(k)))
    return np.asarray(pairs, dtype=np.int64)


def merge_periodic(grid: DualGrid, pairs: np.ndarray,
                   tag_a: str, tag_b: str) -> DualGrid:
    """Merge each (a, b) pair into the single CV a; b becomes an orphan
    placeholder node (no edges, unit volume) so all array shapes and node
    ids stay static."""
    remap = np.arange(grid.npoint, dtype=np.int64)
    remap[pairs[:, 1]] = pairs[:, 0]

    edges = remap[np.asarray(grid.edges)]
    swap = edges[:, 0] > edges[:, 1]
    normals = np.asarray(grid.edge_normal).copy()
    normals[swap] *= -1.0
    edges = np.stack([np.minimum(edges[:, 0], edges[:, 1]),
                      np.maximum(edges[:, 0], edges[:, 1])], axis=1)

    volume = np.asarray(grid.volume).copy()
    volume[pairs[:, 0]] += volume[pairs[:, 1]]
    volume[pairs[:, 1]] = 1.0      # orphan placeholder

    node_edges, node_sign, node_nbrs = _adjacency_tables(
        grid.npoint, edges, None)

    bnd_nodes = {t: v for t, v in grid.bnd_nodes.items()
                 if t not in (tag_a, tag_b)}
    bnd_normal = {t: v for t, v in grid.bnd_normal.items()
                  if t not in (tag_a, tag_b)}
    bnd_nn = {t: v for t, v in grid.bnd_nn.items()
              if t not in (tag_a, tag_b)}
    # corner nodes of remaining markers may have been remapped (e.g. a wall
    # meeting the periodic cut): point their entries at the surviving node
    for t in bnd_nodes:
        bnd_nodes[t] = remap[np.asarray(bnd_nodes[t])]
        bnd_nn[t] = remap[np.asarray(bnd_nn[t])]
    # a surviving corner CV absorbs its pair's wall-vertex normal: merge
    # duplicate marker entries
    for t in list(bnd_nodes):
        nodes, inv = np.unique(bnd_nodes[t], return_inverse=True)
        acc = np.zeros((len(nodes), grid.ndim))
        np.add.at(acc, inv, np.asarray(bnd_normal[t]))
        nn = np.zeros(len(nodes), dtype=np.int64)
        nn[inv] = np.asarray(bnd_nn[t])
        bnd_nodes[t], bnd_normal[t], bnd_nn[t] = nodes, acc, nn

    return dc_replace(
        grid, volume=volume, edges=edges, edge_normal=normals,
        node_edges=node_edges, node_edge_sign=node_sign,
        node_nbrs=node_nbrs, bnd_nodes=bnd_nodes, bnd_normal=bnd_normal,
        bnd_nn=bnd_nn)


def apply_periodic_markers(grid: DualGrid, cfg) -> DualGrid:
    """Consume MARKER_PERIODIC pairs from the config
    (config_structure.cpp periodic option: marker, donor, rotation center,
    rotation angles, translation)."""
    for tag_a, (tag_b, rot_c, rot_a, trans) in cfg.marker_periodic.items():
        if any(abs(x) > 0 for x in rot_a):
            raise NotImplementedError(
                "rotationally periodic markers (translation only for now)")
        pairs = match_periodic_nodes(grid, tag_b, tag_a, trans)
        grid = merge_periodic(grid, pairs, tag_b, tag_a)
    return grid
