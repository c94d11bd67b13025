"""shard_map composition of the tiled (windowed-DMA) pallas kernels.

Round-5 verdict item 1(b): the tiled stencil kernels (gradients, SGS
sweeps, windowed edge) were built around overlapping lane windows with an
H-lane halo — exactly the structure a contiguous-band domain decomposition
needs.  Under sharding, each shard runs the SAME extended-lanes kernel on
its local block; the halo columns that the single-chip kernel zero-pads
become a neighbor slab exchange over ICI (`jax.lax.ppermute` — the
SURVEY §2.3 halo, replacing the reference's SEND_RECEIVE markers +
Sendrecv, solver_direct_reactive.cpp:1530-1999).

Correctness: the single-shard tiled kernels are bitwise-pinned to the
full-field kernels on their owner regions given a halo of the kernel's
dependency radius; a shard boundary is just another window boundary, so
owner-region results are unchanged when the halo carries true neighbor
values instead of zeros (pinned 8-dev == 1-dev in tests/test_parallel.py).

The first/last shards receive ZEROS from ppermute (no source in the
permutation), matching `_extend_lanes`' zero extension at the global array
ends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def cells_axis_mesh(n_shards: int) -> Mesh:
    """The 1-D device mesh the solver arrays are sharded over (same device
    order as parallel.sharding.cells_mesh)."""
    return Mesh(np.array(jax.devices()[:n_shards]), axis_names=("cells",))


def halo_extend(x_t: jnp.ndarray, H: int, E: int, axis: str = "cells"):
    """Extend a local lane-major block (rows, loc) with H halo columns from
    each neighbor shard: [left(H) | x | right(H) | zeros to E].

    Inside shard_map over `axis`.  Boundary shards receive zeros (ppermute
    with no source), matching the single-chip zero extension."""
    nsh = jax.lax.axis_size(axis)
    loc = x_t.shape[-1]
    hh = min(H, loc)
    # left halo of shard s = last H lanes of shard s-1  (s-1 -> s)
    left = jax.lax.ppermute(x_t[:, -hh:], axis,
                            [(i, i + 1) for i in range(nsh - 1)])
    # right halo of shard s = first H lanes of shard s+1  (s+1 -> s)
    right = jax.lax.ppermute(x_t[:, :hh], axis,
                             [(i + 1, i) for i in range(nsh - 1)])
    if hh < H:                                  # tiny shards: zero-fill
        z = jnp.zeros(x_t.shape[:-1] + (H - hh,), x_t.dtype)
        left = jnp.concatenate([z, left], axis=-1)
        right = jnp.concatenate([right, z], axis=-1)
    tail = E - 2 * H - loc
    parts = [left, x_t, right]
    if tail > 0:
        parts.append(jnp.zeros(x_t.shape[:-1] + (tail,), x_t.dtype))
    return jnp.concatenate(parts, axis=-1)


def sharded_lane_call(n_shards: int, fn, out_rows: int, *lane_ops):
    """Run `fn(*local_lane_ops) -> lane-major array (or pytree of them)`
    under shard_map over the cells axis.  Every operand is lane-major
    (rows, nP) sharded on its LAST axis; outputs are lane-major sharded
    the same way.  `fn` is responsible for its own halo_extend calls."""
    from jax import shard_map

    mesh = cells_axis_mesh(n_shards)
    spec = P(None, "cells")
    wrapped = shard_map(fn, mesh=mesh,
                        in_specs=tuple(spec for _ in lane_ops),
                        out_specs=spec, check_vma=False)
    return wrapped(*lane_ops)
