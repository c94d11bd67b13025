"""Process-level pallas dispatch context.

The pallas fast-path dispatchers are pure functions of arrays and cannot
see the jit-level GSPMD shardings at trace time, so the driver records the
simulation's shard count here (set_pallas_shards) and each dispatcher
wraps its kernel in shard_map when n > 1:

- pointwise kernels (node_state, chem_source): per-shard call, no
  communication at all;
- windowed/tiled kernels (edge_fused, gradients_tiled, stencil_solve):
  per-shard call with ppermute halo slabs (parallel/tiled_shard.py).

Single-shard behavior is unchanged (default 1).
"""

_PALLAS_N_SHARDS = 1


def set_pallas_shards(n: int) -> None:
    global _PALLAS_N_SHARDS
    _PALLAS_N_SHARDS = int(n)


def pallas_shards() -> int:
    return _PALLAS_N_SHARDS
