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


def refine_adaptive(mesh: RawMesh, elem_tag: np.ndarray):
    """Sensor-driven conforming h-refinement with transition templates.

    Reference: CGridAdaptation's homothetic adaptation
    (grid_adaptation_structure.cpp TriangleDivision/RectDivision templates):
    tagged elements split all edges (red); neighbors with hanging midpoints
    use green transition templates — triangles have a template for every
    midpoint pattern (1 -> 2, 2 -> 3, 3 -> 4 tris); quads keep the
    two-opposite-midpoints 2-quad template and fan-triangulate every other
    pattern (no propagation, so a tagged band refines locally).

    Returns (refined mesh, parent element map, node_parents) like
    refine_full."""
    assert mesh.ndim == 2, "h-refinement is 2D for now"
    nelem = mesh.nelem

    def elem_edges(k):
        t = int(mesh.elem_types[k])
        n = mesh.elem_nodes[k]
        nn = 3 if t == 5 else 4
        return [(int(n[a]), int(n[(a + 1) % nn])) for a in range(nn)]

    def key(a, b):
        return (min(a, b), max(a, b))

    tagged = np.asarray(elem_tag, bool)
    split: set = set()
    for k in np.nonzero(tagged)[0]:
        for e in elem_edges(k):
            split.add(key(*e))

    coords = mesh.coords
    table, new_pts, mid = _midpoint_table(coords)
    node_parents: dict[int, tuple] = {}

    def midp(a, b):
        m = mid(a, b)
        node_parents.setdefault(m, (a, b))
        return m

    elems, types, parent = [], [], []

    def emit(nodes, t, k):
        elems.append(nodes)
        types.append(t)
        parent.append(k)

    for k in range(nelem):
        t = int(mesh.elem_types[k])
        n = mesh.elem_nodes[k]
        if t == 5:
            a, b, c = int(n[0]), int(n[1]), int(n[2])
            pat = [key(a, b) in split, key(b, c) in split,
                   key(c, a) in split]
            if tagged[k] or all(pat):
                ab, bc, ca = midp(a, b), midp(b, c), midp(c, a)
                for tri in ((a, ab, ca), (ab, b, bc), (ca, bc, c),
                            (ab, bc, ca)):
                    emit(tri, 5, k)
            elif not any(pat):
                emit((a, b, c), 5, k)
            else:
                # rotate so the split pattern starts at edge (a, b)
                for _ in range(3):
                    if pat[0]:
                        break
                    a, b, c = b, c, a
                    pat = pat[1:] + pat[:1]
                if sum(pat) == 1:                    # green: 2 triangles
                    ab = midp(a, b)
                    emit((a, ab, c), 5, k)
                    emit((ab, b, c), 5, k)
                else:                                # 2 midpoints: 3 tris
                    if not pat[1]:                   # split edges ab, ca
                        a, b, c = c, a, b            # -> edges ab, bc split
                    ab, bc = midp(a, b), midp(b, c)
                    emit((a, ab, c), 5, k)
                    emit((ab, bc, c), 5, k)
                    emit((ab, b, bc), 5, k)
        elif t == 9:
            a, b, c, d = (int(x) for x in n[:4])
            if tagged[k]:
                ab, bc, cd, da = (midp(a, b), midp(b, c),
                                  midp(c, d), midp(d, a))
                ctr = len(coords) + len(new_pts)
                new_pts.append(0.25 * (coords[a] + coords[b]
                                       + coords[c] + coords[d]))
                node_parents[ctr] = (a, b, c, d)
                for quad in ((a, ab, ctr, da), (ab, b, bc, ctr),
                             (ctr, bc, c, cd), (da, ctr, cd, d)):
                    emit(quad, 9, k)
            else:
                pat = [key(*e) in split for e in elem_edges(k)]
                if not any(pat):
                    emit((a, b, c, d), 9, k)
                elif pat == [True, False, True, False]:   # ab, cd split
                    ab, cd = midp(a, b), midp(c, d)
                    emit((a, ab, cd, d), 9, k)
                    emit((ab, b, c, cd), 9, k)
                elif pat == [False, True, False, True]:   # bc, da split
                    bc, da = midp(b, c), midp(d, a)
                    emit((a, b, bc, da), 9, k)
                    emit((da, bc, c, d), 9, k)
                else:
                    # green transition: fan-triangulate the boundary
                    # polygon (corners + midpoints) from a corner whose
                    # adjacent edges are both unsplit; when no such corner
                    # exists (3-4 split edges) fan from a new centroid
                    # node — a corner apex would emit zero-area triangles
                    # (corner, adjacent midpoint, next corner are collinear)
                    corners = [a, b, c, d]
                    poly = []
                    for ei in range(4):
                        poly.append(corners[ei])
                        if pat[ei]:
                            poly.append(midp(corners[ei],
                                             corners[(ei + 1) % 4]))
                    apex = None
                    for ci in range(4):
                        if not pat[ci] and not pat[(ci - 1) % 4]:
                            apex = poly.index(corners[ci])
                            break
                    m = len(poly)
                    if apex is not None:
                        for s in range(1, m - 1):
                            tri = (poly[apex], poly[(apex + s) % m],
                                   poly[(apex + s + 1) % m])
                            emit(tri, 5, k)
                    else:
                        ctr = len(coords) + len(new_pts)
                        new_pts.append(0.25 * (coords[a] + coords[b]
                                               + coords[c] + coords[d]))
                        node_parents[ctr] = (a, b, c, d)
                        for s in range(m):
                            emit((ctr, poly[s], poly[(s + 1) % m]), 5, k)
        else:
            raise NotImplementedError(f"refinement of VTK type {t}")

    markers, mtypes = {}, {}
    for tag, melems in mesh.markers.items():
        lines = []
        for row in melems:
            a, b = int(row[0]), int(row[1])
            if key(a, b) in split:
                m = midp(a, b)
                lines.append([a, m])
                lines.append([m, b])
            else:
                lines.append([a, b])
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
