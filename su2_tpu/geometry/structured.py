"""Synthetic structured meshes (as unstructured RawMesh) for tests/dryruns."""

from __future__ import annotations

import numpy as np

from su2_tpu.io.mesh import RawMesh


def channel_mesh(nx: int, ny: int, lx: float = 1.0, ly: float = 0.25) -> RawMesh:
    """(nx x ny)-node quad channel with markers inlet (x=0), outlet (x=lx),
    lower_wall (y=0), upper_wall (y=ly)."""
    xs, ys = np.meshgrid(np.linspace(0, lx, nx), np.linspace(0, ly, ny),
                         indexing="ij")
    coords = np.stack([xs.ravel(), ys.ravel()], axis=1)

    def nid(i, j):
        return i * ny + j

    elems = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            elems.append([nid(i, j), nid(i + 1, j), nid(i + 1, j + 1), nid(i, j + 1)])
    elems = np.array(elems)

    def line_marker(pairs):
        return np.array(pairs)

    inlet = [[nid(0, j + 1), nid(0, j)] for j in range(ny - 1)]
    outlet = [[nid(nx - 1, j), nid(nx - 1, j + 1)] for j in range(ny - 1)]
    lower = [[nid(i, 0), nid(i + 1, 0)] for i in range(nx - 1)]
    upper = [[nid(i + 1, ny - 1), nid(i, ny - 1)] for i in range(nx - 1)]
    markers = {"inlet": line_marker(inlet), "outlet": line_marker(outlet),
               "lower_wall": line_marker(lower), "upper_wall": line_marker(upper)}
    mtypes = {k: np.full(len(v), 3, dtype=np.int32) for k, v in markers.items()}
    return RawMesh(ndim=2, coords=coords,
                   elem_types=np.full(len(elems), 9, dtype=np.int32),
                   elem_nodes=elems, markers=markers, marker_types=mtypes)
