"""Static-stencil discovery: turn unstructured sparsity into lane shifts.

TPU-native replacement for the index-gather half of the reference's
block-CSR machinery (Common/src/matrix_structure.cpp): when the mesh's
node numbering places every neighbor at one of a few constant index
offsets (any logically-structured mesh, once ordered), the sparse
neighbor product  y[p] += B[p,q] x[q]  becomes

    y += sum_k  M_k * roll(x, -o_k)

with K static offsets o_k — no gathers, no scatter, pure elementwise
work that XLA fuses and a Pallas kernel turns into VPU lane rotates.

Discovery runs on the host at setup:

1. If the as-read ordering already has a small offset set (programmatic
   meshes, SU2 structured exports like the flat plate's {+-1, +-137}),
   use it directly — no renumbering.
2. Otherwise, for all-quad 2D meshes, recover the logical (i, j) grid
   coordinates by BFS over quads (each quad imposes ij[a] + ij[c] ==
   ij[b] + ij[d] on its cyclic corners) and renumber row-major.  The
   shipped combustion mesh (mesh_stretched.su2) is a scrambled 90x100
   grid that collapses to offsets {+-1, +-100}.
3. Meshes with no small stencil keep the gather-based path.
"""

from __future__ import annotations

from collections import deque

import numpy as np

# Above this many distinct offsets the roll form loses to the gather form
# (each offset is a full (nP, v, v) elementwise pass).
MAX_OFFSETS = 8


def edge_offsets(edges: np.ndarray) -> np.ndarray:
    """Sorted distinct signed index offsets of an edge list (both
    directions)."""
    e = np.asarray(edges)
    if e.size == 0:
        return np.zeros((0,), dtype=np.int64)
    d = e[:, 1].astype(np.int64) - e[:, 0].astype(np.int64)
    return np.unique(np.concatenate([d, -d]))


def structured_order(mesh) -> np.ndarray | None:
    """Recover a row-major structured ordering of an all-quad 2D mesh.

    Returns perm (perm[k] = original node id of new node k) or None when
    the mesh is not a single logically-rectangular quad grid.
    """
    types = np.asarray(mesh.elem_types)
    if mesh.ndim != 2 or not np.all(types == 9):
        return None
    n = mesh.npoint
    quads = np.asarray(mesh.elem_nodes)[:, :4]

    edge2q: dict = {}
    for qi in range(quads.shape[0]):
        q = quads[qi]
        for a in range(4):
            k = (min(q[a], q[(a + 1) % 4]), max(q[a], q[(a + 1) % 4]))
            edge2q.setdefault(k, []).append(qi)

    ij = np.full((n, 2), np.iinfo(np.int64).max, dtype=np.int64)
    unset = np.iinfo(np.int64).max
    q0 = quads[0]
    ij[q0[0]] = (0, 0)
    ij[q0[1]] = (1, 0)
    ij[q0[2]] = (1, 1)
    ij[q0[3]] = (0, 1)
    filled = np.zeros(quads.shape[0], dtype=bool)
    filled[0] = True
    dq = deque([0])
    while dq:
        qi = dq.popleft()
        q = quads[qi]
        for a in range(4):
            u, v = q[a], q[(a + 1) % 4]
            k = (min(u, v), max(u, v))
            for qj in edge2q[k]:
                if filled[qj]:
                    continue
                r = quads[qj]
                # direction away from the filled quad = -(offset from this
                # edge to its opposite edge inside quad qi)
                d = ij[u] - ij[q[(a + 3) % 4]]
                ok = True
                for p in range(4):
                    node = r[p]
                    if node == u or node == v:
                        continue
                    prev, nxt = r[(p - 1) % 4], r[(p + 1) % 4]
                    if prev == u or nxt == u:
                        cand = ij[u] + d
                    elif prev == v or nxt == v:
                        cand = ij[v] + d
                    else:       # non-adjacent listing: not a simple quad
                        ok = False
                        break
                    if ij[node][0] != unset and not np.all(ij[node] == cand):
                        return None          # inconsistent grid coords
                    ij[node] = cand
                if not ok:
                    return None
                filled[qj] = True
                dq.append(qj)

    if not filled.all() or np.any(ij[:, 0] == unset):
        return None                          # disconnected / partial
    ij -= ij.min(axis=0)
    ni, nj = ij.max(axis=0) + 1
    if ni * nj != n:
        return None                          # not logically rectangular
    keys = ij[:, 0] * nj + ij[:, 1]
    if len(np.unique(keys)) != n:
        return None
    return np.argsort(keys, kind="stable")


def discover(raw_mesh, edges: np.ndarray,
             max_offsets: int = MAX_OFFSETS):
    """(perm | None, offsets | None) for a raw mesh + its dual-grid edges.

    perm is None when the natural ordering already works; offsets is None
    when no small stencil exists (keep the gather path).
    """
    offs = edge_offsets(edges)
    if 0 < len(offs) <= max_offsets:
        return None, tuple(int(o) for o in offs)
    perm = structured_order(raw_mesh)
    if perm is None:
        return None, None
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    offs = edge_offsets(inv[np.asarray(edges)])
    if 0 < len(offs) <= max_offsets:
        return perm, tuple(int(o) for o in offs)
    return None, None


def stencil_select(edges: np.ndarray, npoint: int,
                   offsets: tuple) -> np.ndarray:
    """(K, nP) int32 index into concat([off_ij, off_ji, zero]) such that
    sel[k, p] names the block of row p whose column is p + offsets[k]
    (2*nE = the zero pad when p has no neighbor at that offset)."""
    e = np.asarray(edges)
    ne = e.shape[0]
    koff = {o: k for k, o in enumerate(offsets)}
    sel = np.full((len(offsets), npoint), 2 * ne, dtype=np.int64)
    d = e[:, 1].astype(np.int64) - e[:, 0].astype(np.int64)
    eid = np.arange(ne, dtype=np.int64)
    kf = np.array([koff[int(o)] for o in d])
    kb = np.array([koff[int(-o)] for o in d])
    sel[kf, e[:, 0]] = eid            # row i, column j: off_ij block
    sel[kb, e[:, 1]] = eid + ne       # row j, column i: off_ji block
    return sel.astype(np.int32)
