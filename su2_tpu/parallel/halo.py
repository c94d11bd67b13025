"""Explicit neighbor halo exchange: shard_map + ppermute over ICI.

The TPU-native analog of the reference's SEND_RECEIVE-marker Sendrecv halos
(solver_direct_reactive.cpp:1530-1999): each shard owns a contiguous RCB
block of nodes; the cell states its frontier edges need from other shards are
exchanged with point-to-point ppermute steps around the device ring, and
scalar reductions (min dt, RMS residuals — the reference's Allreduce) are
psum/pmin inside the same shard_map.

This module provides the communication primitives; the GSPMD-sharded step in
:mod:`su2_tpu.parallel.sharding` is the default path, with these kernels as
the hand-scheduled upgrade for frontier-heavy meshes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map as _shard_map


def ring_exchange(dmesh: Mesh, axis: str, send_idx: jnp.ndarray,
                  recv_slots: jnp.ndarray, halo_size: int):
    """Build a halo-exchange function over the device ring.

    send_idx: (D, D, H) — send_idx[s, r] are local indices (into shard s's
    owned block) of values shard s must send to shard r (padded with 0).
    recv_slots: (D, D, H) — where shard s places values received from r in
    its halo buffer (padded with halo_size, the trash slot).

    Returns exchange(owned) -> halo, usable inside jit: owned is the
    (N, ...) array sharded over `axis`; halo is (D*halo..., ...) ... the
    returned function must be called INSIDE shard_map (it operates on the
    per-shard view).
    """
    d = dmesh.devices.size

    def exchange_local(owned_local, my_send_idx, my_recv_slots):
        """Per-shard body: owned_local (n_local, ...), my_send_idx (1, D, H),
        my_recv_slots (1, D, H).  Returns halo (1, halo_size+1, ...) with the
        last row as trash."""
        my_send_idx = my_send_idx[0]
        my_recv_slots = my_recv_slots[0]
        halo = jnp.zeros((halo_size + 1,) + owned_local.shape[1:],
                         dtype=owned_local.dtype)
        buf = owned_local[my_send_idx]          # (D, H, ...) values for each receiver
        for step in range(1, d):
            # send to rank+step, receive from rank-step
            perm = [(s, (s + step) % d) for s in range(d)]
            # what I send to my (rank+step) neighbor: buf[(rank+step)%d]
            my_rank = jax.lax.axis_index(axis)
            dest = (my_rank + step) % d
            src = (my_rank - step) % d
            send_vals = jnp.take(buf, dest, axis=0)          # (H, ...)
            recv_vals = jax.lax.ppermute(send_vals, axis, perm)
            slots = jnp.take(my_recv_slots, src, axis=0)     # (H,)
            halo = halo.at[slots].set(recv_vals)
        return halo[None]

    return exchange_local


def make_halo_exchange(dmesh: Mesh, send_idx, recv_slots, halo_size: int,
                       feature_shape=()):
    """shard_map-wrapped halo exchange: global (N, *feat) sharded array in,
    (D*(halo_size+1), *feat) halo blocks out (sharded the same way)."""
    axis = dmesh.axis_names[0]
    ex = ring_exchange(dmesh, axis, send_idx, recv_slots, halo_size)

    def global_fn(owned, sidx, rslots):
        return _shard_map(
            ex, mesh=dmesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis))(owned, sidx, rslots)

    return global_fn


def pmin_scalar(dmesh: Mesh, x_fn):
    """Example reduction wrapper: global min across shards inside shard_map."""
    axis = dmesh.axis_names[0]

    def fn(x):
        def body(xl):
            return jax.lax.pmin(jnp.min(xl), axis)
        return _shard_map(body, mesh=dmesh, in_specs=P(axis),
                          out_specs=P())(x)

    return fn
