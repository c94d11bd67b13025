"""Grid adaptation: isotropic h-refinement of 2D meshes.

Reference capability: CGridAdaptation (Common/src/grid_adaptation_structure.cpp)
+ the SU2_MSH tool.  Supported here: FULL refinement (every tri -> 4 tris,
quad -> 4 quads via edge midpoints, conforming by construction) and
sensor-driven selection reported for future hanging-node templates; the
solution is prolonged to the refined mesh by midpoint averaging
(SetHomothety_Adaptation-style).
"""

from __future__ import annotations

import numpy as np

from su2_tpu.io.mesh import RawMesh


def _midpoint_table(coords):
    table: dict[tuple[int, int], int] = {}
    new_pts: list[np.ndarray] = []

    def mid(a, b):
        key = (min(a, b), max(a, b))
        if key not in table:
            table[key] = len(coords) + len(new_pts)
            new_pts.append(0.5 * (coords[a] + coords[b]))
        return table[key]

    return table, new_pts, mid


def refine_full(mesh: RawMesh):
    """Uniform conforming refinement.

    Returns (refined mesh, parent element map, node_parents) where
    node_parents[new_node_id] is the tuple of coarse node ids whose average
    created it (used for exact prolongation).
    """
    assert mesh.ndim == 2, "h-refinement is 2D for now"
    coords = mesh.coords
    table, new_pts, mid = _midpoint_table(coords)
    node_parents: dict[int, tuple] = {}

    elems, types, parent = [], [], []
    for k in range(mesh.nelem):
        t = int(mesh.elem_types[k])
        n = mesh.elem_nodes[k]
        if t == 5:      # triangle -> 4 triangles
            a, b, c = int(n[0]), int(n[1]), int(n[2])
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            node_parents.update({ab: (a, b), bc: (b, c), ca: (c, a)})
            for tri in ((a, ab, ca), (ab, b, bc), (ca, bc, c), (ab, bc, ca)):
                elems.append(tri)
                types.append(5)
                parent.append(k)
        elif t == 9:    # quad -> 4 quads (edge midpoints + centroid)
            a, b, c, d = (int(x) for x in n[:4])
            ab, bc, cd, da = mid(a, b), mid(b, c), mid(c, d), mid(d, a)
            node_parents.update({ab: (a, b), bc: (b, c),
                                 cd: (c, d), da: (d, a)})
            ctr = len(coords) + len(new_pts)
            new_pts.append(0.25 * (coords[a] + coords[b]
                                   + coords[c] + coords[d]))
            node_parents[ctr] = (a, b, c, d)
            for quad in ((a, ab, ctr, da), (ab, b, bc, ctr),
                         (ctr, bc, c, cd), (da, ctr, cd, d)):
                elems.append(quad)
                types.append(9)
                parent.append(k)
        else:
            raise NotImplementedError(f"refinement of VTK type {t}")

    markers, mtypes = {}, {}
    for tag, melems in mesh.markers.items():
        lines = []
        for row in melems:
            a, b = int(row[0]), int(row[1])
            m = mid(a, b)       # midpoint already exists from element split
            node_parents.setdefault(m, (a, b))
            lines.append([a, m])
            lines.append([m, b])
        markers[tag] = np.asarray(lines)
        mtypes[tag] = np.full(len(lines), 3, dtype=np.int32)

    new_coords = np.concatenate([coords, np.asarray(new_pts)]) \
        if new_pts else coords.copy()

    maxn = max(len(e) for e in elems)
    en = np.full((len(elems), maxn), -1, dtype=np.int64)
    for k, e in enumerate(elems):
        en[k, :len(e)] = e
    refined = RawMesh(ndim=2, coords=new_coords,
                      elem_types=np.asarray(types, dtype=np.int32),
                      elem_nodes=en, markers=markers, marker_types=mtypes)
    return refined, np.asarray(parent), node_parents


def gradient_sensor(mesh_arrays, field) -> np.ndarray:
    """Per-node adaptation sensor |grad field| * Vol^(1/2) (GRAD_FLOW-style,
    grid_adaptation_structure.cpp sensor construction)."""
    import jax.numpy as jnp
    from su2_tpu.ops import gradients

    g = gradients.green_gauss(mesh_arrays, jnp.asarray(field)[:, None])
    mag = np.asarray(jnp.linalg.norm(g[:, 0, :], axis=1))
    return mag * np.sqrt(np.asarray(mesh_arrays.volume))


def prolong_solution(mesh: RawMesh, refined: RawMesh, u: np.ndarray,
                     node_parents: dict):
    """Node-based prolongation: old nodes keep values; new nodes average
    their parent nodes (exact for edge midpoints / quad centers)."""
    n_old = mesh.npoint
    out = np.zeros((refined.npoint,) + u.shape[1:], dtype=u.dtype)
    out[:n_old] = u
    for p, parents in node_parents.items():
        out[p] = u[list(parents)].mean(axis=0)
    return out
