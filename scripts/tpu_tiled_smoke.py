"""Smoke-test the round-4 tiled/streaming kernels on the real TPU:
Mosaic-compile + run the tiled sweep/matvec and tiled SST assembly on
synthetic band systems large enough to use several tiles, and compare
against the XLA reference arithmetic."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from su2_tpu.pallas import stencil_solve as stks  # noqa: E402

assert jax.devices()[0].platform != "cpu", jax.devices()


def xla_sgs_matvec(sel_t, dinv_t, diag_t, masks_t, r_t, offsets, v, ncolor):
    """Reference arithmetic (jnp.roll form of _sgs_body + matvec)."""
    def roll(x, off):
        return jnp.roll(x, -off, axis=-1)

    def offdiag(sel, x):
        out = None
        for kk, off in enumerate(offsets):
            xs = roll(x, off)
            blk = sel[kk * v * v:(kk + 1) * v * v]
            y = jnp.stack([
                sum(blk[a * v + b] * xs[b] for b in range(v))
                for a in range(v)], axis=0)
            out = y if out is None else out + y
        return out

    def bapply(blocks, x):
        return jnp.stack(
            [sum(blocks[a * v + b] * x[b] for b in range(v))
             for a in range(v)], axis=0)

    z = jnp.zeros_like(r_t)
    order = list(range(ncolor)) + list(range(ncolor - 2, -1, -1))
    for c in order:
        acc = r_t - offdiag(sel_t.astype(r_t.dtype), z)
        zn = bapply(dinv_t, acc)
        m = masks_t[c][None, :]
        z = jnp.where(m > 0.5, zn, z)
    w = bapply(diag_t, z) + offdiag(sel_t, z)
    return z, w


def main():
    rng = np.random.default_rng(0)
    v, ncolor = 2, 4
    nx = 700
    n = nx * 600            # 420k lanes — several tiles
    npad = -(-n // 128) * 128
    offsets = (-nx - 1, -nx, -nx + 1, -1, 1, nx - 1, nx, nx + 1)
    k = len(offsets)
    sel = (rng.standard_normal((k, v, v, npad)) * 0.1).astype(np.float32)
    for kk, o in enumerate(offsets):
        p = np.arange(npad)
        bad = (p + o < 0) | (p + o >= n) | (p >= n)
        sel[kk, :, :, bad] = 0.0
    sel_t = jnp.asarray(sel.reshape(k * v * v, npad))
    diag = (rng.standard_normal((npad, v, v)) * 0.1).astype(np.float32) \
        + 3.0 * np.eye(v, dtype=np.float32)[None]
    diag[n:] = 0.0
    dinv = np.zeros_like(diag)
    dinv[:n] = np.linalg.inv(diag[:n])
    diag_t = jnp.asarray(diag.transpose(1, 2, 0).reshape(v * v, npad))
    dinv_t = jnp.asarray(dinv.transpose(1, 2, 0).reshape(v * v, npad))
    colors = np.arange(npad) % ncolor
    masks = np.stack([(colors == c) & (np.arange(npad) < n)
                      for c in range(ncolor)]).astype(np.float32)
    masks_t = jnp.asarray(masks)
    r = rng.standard_normal((v, npad)).astype(np.float32)
    r[:, n:] = 0.0
    r_t = jnp.asarray(r)

    maxoff = max(abs(o) for o in offsets)
    H = stks._round128((2 * ncolor) * maxoff)
    bpl = 612
    W = (stks._VMEM_LIMIT // bpl) // 128 * 128
    T = W - 2 * H
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    print(f"n={n} npad={npad} T={T} H={H} ntiles={ntiles}", flush=True)
    ext = lambda x: stks._extend_lanes(x, H, E)

    selp_t = sel_t.astype(jnp.bfloat16)
    args = (ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t),
            ext(masks_t), ext(r_t))
    kw = dict(offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
              ntiles=ntiles, interpret=False)
    t0 = time.time()
    z_o, w_o = stks._tiled_sgs_matvec_mixed_call(*args, **kw)
    z_o.block_until_ready()
    print(f"tiled mixed compile+run {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        z_o, w_o = stks._tiled_sgs_matvec_mixed_call(*args, **kw)
        w_o.block_until_ready()
        print(f"  tiled mixed run {1e3*(time.time()-t0):.2f} ms", flush=True)

    # XLA reference (bf16 sweep + f32 matvec arithmetic)
    @jax.jit
    def ref(selp_t, sel_t, dinv_t, diag_t, masks_t, r_t):
        z, _ = xla_sgs_matvec(selp_t, dinv_t, diag_t, masks_t, r_t,
                              offsets, v, ncolor)
        # matvec at f32
        def roll(x, off):
            return jnp.roll(x, -off, axis=-1)
        out = None
        for kk, off in enumerate(offsets):
            xs = roll(z, off)
            blk = sel_t[kk * v * v:(kk + 1) * v * v]
            y = jnp.stack([
                sum(blk[a * v + b] * xs[b] for b in range(v))
                for a in range(v)], axis=0)
            out = y if out is None else out + y
        w = jnp.stack(
            [sum(diag_t[a * v + b] * z[b] for b in range(v))
             for a in range(v)], axis=0) + out
        return z, w

    t0 = time.time()
    z_r, w_r = ref(selp_t, sel_t, dinv_t, diag_t, masks_t, r_t)
    z_r.block_until_ready()
    print(f"xla ref compile+run {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        t0 = time.time()
        z_r, w_r = ref(selp_t, sel_t, dinv_t, diag_t, masks_t, r_t)
        w_r.block_until_ready()
        print(f"  xla ref run {1e3*(time.time()-t0):.2f} ms", flush=True)

    zd = np.abs(np.asarray(z_o[:, :n]) - np.asarray(z_r[:, :n])).max()
    wd = np.abs(np.asarray(w_o[:, :n]) - np.asarray(w_r[:, :n])).max()
    zs = np.abs(np.asarray(z_r[:, :n])).max()
    print(f"max|dz|={zd:.3e} (scale {zs:.3e})  max|dw|={wd:.3e}", flush=True)
    assert zd <= 1e-5 * max(zs, 1.0), zd
    print("TPU tiled smoke OK", flush=True)


if __name__ == "__main__":
    main()
