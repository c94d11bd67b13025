import numpy as np
import jax
import jax.numpy as jnp
import pytest

from su2_tpu.parallel import partition, sharding


def test_rcb_balance_and_perm():
    rng = np.random.default_rng(0)
    coords = rng.normal(0, 1, (1000, 2))
    perm = partition.rcb_order(coords, 8)
    assert sorted(perm.tolist()) == list(range(1000))
    sizes = partition.partition_counts(1000, 8)
    assert sizes.sum() == 1000 and sizes.max() - sizes.min() <= 1


def test_multichip_matches_single_device():
    """One coupled RANS step on a tiny channel: 8 virtual devices vs 1."""
    import __graft_entry__ as g

    sim1 = g._flagship_sim(jnp.float64, tiny=True)
    q0 = sim1.initial_turb_state()
    out1 = sim1._step(sim1.u0, sim1.t0, *q0, jnp.asarray(False))
    u1 = np.asarray(out1[0])

    sim8 = g._flagship_sim(jnp.float64, ndevices=8, tiny=True)
    q8 = sim8.initial_turb_state()
    out8 = sim8._step(sim8.u0, sim8.t0, *q8, jnp.asarray(False))
    u8 = np.asarray(out8[0])

    n_real = u1.shape[0]
    # sim8's nodes are RCB-permuted: u8[k] corresponds to u1[perm[k]]
    np.testing.assert_allclose(u8[:n_real], u1[sim8.perm], rtol=1e-10,
                               atol=1e-10 * np.abs(u1).max())


def test_multichip_real_combustion_case(combustion_dir):
    """8 virtual devices vs 1 on the SHIPPED combustion mesh (9000 nodes,
    pads to 9008): regression pin for the pad-row NaN bug — coincident
    dummy-node coordinates made the viscous edge-projection divide 0/0 on
    dummy edges, and the pad NaNs spread into real rows through 0*NaN in
    the roll-based stencil sweeps.  Both sims renumber into the same
    structured order, so rows compare directly."""
    import os
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    cfg = Config(os.path.join(combustion_dir, "my_combustion_no_chem.cfg"))
    sim1 = Simulation(cfg, dtype=jnp.float64)
    sim8 = Simulation(cfg, dtype=jnp.float64, ndevices=8)
    assert sim8.mesh.n_shards == 8
    q1 = sim1.initial_turb_state()
    q8 = sim8.initial_turb_state()
    o1 = sim1._step(sim1.u0, sim1.t0, *q1, jnp.asarray(False))
    o8 = sim8._step(sim8.u0, sim8.t0, *q8, jnp.asarray(False))
    u1, u8 = np.asarray(o1[0]), np.asarray(o8[0])
    q1n, q8n = np.asarray(o1[2]), np.asarray(o8[2])
    n = u1.shape[0]
    assert not np.isnan(u8).any() and not np.isnan(q8n).any()
    # reported RMS residuals match too — regression pin for the pad-row
    # turb-source bug (unit-volume dummy nodes with nonzero wall distance
    # fired the SST source and inflated the 8-dev turb RMS by 4 orders)
    np.testing.assert_allclose(np.asarray(o8[6]), np.asarray(o1[6]),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(o8[8]), np.asarray(o1[8]),
                               rtol=1e-9)
    sc = np.abs(u1).max(axis=0)
    sc[sc == 0] = 1.0
    np.testing.assert_array_less(
        np.abs(u8[:n] - u1) / sc[None, :], 1e-9)
    scq = np.abs(q1n).max(axis=0)
    np.testing.assert_array_less(
        np.abs(q8n[:n] - q1n) / scq[None, :], 1e-12)


@pytest.mark.slow
def test_halo_ring_exchange():
    """shard_map + ppermute halo exchange moves the right values."""
    from jax.sharding import Mesh
    from su2_tpu.parallel import halo

    d = 8
    dmesh = Mesh(np.array(jax.devices()[:d]), axis_names=("cells",))
    n_local = 4
    owned = jnp.arange(d * n_local, dtype=jnp.float64).reshape(d * n_local, 1)
    hsize = 2
    # shard s requests owned-local index (s mod n_local) from every r
    send_idx = np.zeros((d, d, 1), dtype=np.int32)
    recv_slots = np.full((d, d, 1), hsize, dtype=np.int32)
    for s in range(d):
        for r in range(d):
            if r == (s + 1) % d:
                send_idx[s, r, 0] = 2        # s sends its local idx 2 to s+1
    for s in range(d):
        src = (s - 1) % d
        recv_slots[s, src, 0] = 0            # place value from s-1 at slot 0

    ex = halo.make_halo_exchange(dmesh, None, None, hsize)
    halos = ex(owned, jnp.asarray(send_idx), jnp.asarray(recv_slots))
    halos = np.asarray(halos).reshape(d, hsize + 1, 1)
    for s in range(d):
        src = (s - 1) % d
        expect = src * n_local + 2
        assert halos[s, 0, 0] == expect, (s, halos[s])


def test_sharded_step_uses_neighbor_collectives():
    """Structured-band sharding: the coupled step's neighbor traffic rides
    collective-permutes (roll slab exchanges — the ppermute halo of SURVEY
    §2.3), not full-field all-gathers.  Boundary scatter-adds use pad+add
    forms (ops/bgather.py) so none of them all-gather either."""
    import re
    import __graft_entry__ as g

    sim8 = g._flagship_sim(jnp.float64, ndevices=8, tiny=True)
    assert sim8.mesh.n_shards == 8
    assert sim8.mesh.stencil_offsets is not None   # structured path engaged
    q8 = sim8.initial_turb_state()
    step = sim8._make_rans_step()
    txt = jax.jit(step).lower(sim8.u0, sim8.t0, *q8,
                              jnp.asarray(False)).compile().as_text()
    n_cp = len(re.findall(r"\bcollective-permute\b", txt))
    # ZERO all-gathers of ANY shape: interior neighbor traffic rides
    # collective-permutes and the BC section is the dense shard-local path
    # (solvers/bc_dense.py) — the 22 marker-scale all-gathers of the
    # replicated-marker-batch path are gone (VERDICT round-2 item 3)
    ags = re.findall(r"all-gather(?:-start)?\(", txt)
    assert n_cp > 0, "no collective-permutes: halo exchange path not engaged"
    assert len(ags) == 0, f"{len(ags)} all-gathers in sharded step HLO"


# ---------------------------------------------------------------------------
# Round 5: multi-chip composition with the production tiers
# ---------------------------------------------------------------------------

def test_sharded_tiled_gradient_matches_roll_path(combustion_dir,
                                                  monkeypatch):
    """The shard_map'd tiled gradient sweep (gradients_tiled.
    _gradient_tiled_rows_sharded, ppermute halo slabs) matches the GSPMD
    roll path on the SHIPPED combustion mesh over 8 virtual devices —
    multi-tile per shard (forced small window)."""
    import os
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation
    from su2_tpu.ops import gradients
    from su2_tpu.pallas import gradients_tiled as gt

    cfg = Config(os.path.join(combustion_dir, "my_combustion_no_chem.cfg"))
    sim = Simulation(cfg, dtype=jnp.float64, ndevices=8)
    ma = sim.mesh
    assert ma.n_shards == 8 and ma.stencil_offsets is not None
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.standard_normal((ma.npoint, 4)))
    from su2_tpu.parallel import sharding as shd
    (q,) = shd.shard_state(sim.dmesh, q)

    monkeypatch.setenv("SU2_TPU_TILED_GRAD", "0")
    ref = np.asarray(gradients.weighted_least_squares(ma, q))
    ref_gg = np.asarray(gradients.green_gauss(ma, q))

    monkeypatch.setenv("SU2_TPU_TILED_GRAD", "1")
    # force several tiles per 1126-lane shard
    monkeypatch.setattr(gt, "_TILE_W_CAP", 1024 + 2 * 128)
    out = np.asarray(gradients.weighted_least_squares(ma, q))
    out_gg = np.asarray(gradients.green_gauss(ma, q))
    for a, b in ((out, ref), (out_gg, ref_gg)):
        sc = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=1e-11, atol=1e-13 * sc)
    # rows form too (the production fast path at >= 200k nodes)
    rows = gradients.gradient_rows(ma, q, "WEIGHTED_LEAST_SQUARES")
    assert rows is not None
    np.testing.assert_allclose(
        np.asarray(gradients.rows_to_grad(rows, 4, 2)), ref,
        rtol=1e-11, atol=1e-13 * max(np.abs(ref).max(), 1.0))


def test_sharded_mesh_args_multistep_matches_constant_closure(
        combustion_dir, monkeypatch):
    """Round-5 verdict item 1(a): the mesh-as-arguments tier composes with
    sharding — SU2_TPU_MESH_ARGS=1 on an 8-device sim must match the
    sharded constant-closure multistep (the buffers are committed with
    NamedShardings, so jit infers in_shardings and GSPMD partitions the
    traced rolls identically)."""
    import os
    from su2_tpu.config import Config
    from su2_tpu.driver import Simulation

    cfg = Config(os.path.join(combustion_dir, "my_combustion_no_chem.cfg"))

    def run(mode):
        monkeypatch.setenv("SU2_TPU_MESH_ARGS", mode)
        sim = Simulation(cfg, dtype=jnp.float64, ndevices=8)
        q = sim.initial_turb_state()
        ig = jnp.zeros((2,), bool)
        carry, ys = sim.rans_multistep(sim.u0, sim.t0, *q, ig)
        assert sim._multistep_args == (mode == "1")
        return np.asarray(carry[0]), np.asarray(ys[0])

    u_c, rms_c = run("0")
    u_a, rms_a = run("1")
    sc = np.abs(u_c).max(axis=0)
    sc[sc == 0] = 1.0
    # f64 path: the two program forms differ only in constant folding
    assert (np.abs(u_a - u_c) / sc[None, :]).max() < 1e-9
    assert np.abs(rms_a - rms_c).max() < 1e-9
