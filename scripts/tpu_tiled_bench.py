"""Measure tiled vs XLA sweep+matvec runtime on the real TPU with a
dependent chain of applications (tunnel-latency-proof), and probe Mosaic
compile time vs tile width W."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from su2_tpu.pallas import stencil_solve as stks  # noqa: E402

W_CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
NCHAIN = 50


def main():
    rng = np.random.default_rng(0)
    v, ncolor = 2, 4
    nx = 700
    n = nx * 600
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
    W = min(W_CAP, (stks._VMEM_LIMIT // 612) // 128 * 128)
    T = W - 2 * H
    ntiles = -(-npad // T)
    E = ntiles * T + 2 * H
    print(f"W={W} T={T} H={H} ntiles={ntiles}", flush=True)
    ext = lambda x: stks._extend_lanes(x, H, E)

    selp_t = sel_t.astype(jnp.bfloat16)
    selp_e, selm_e, dinv_e, diag_e, masks_e = (
        ext(selp_t), ext(sel_t), ext(dinv_t), ext(diag_t), ext(masks_t))

    @jax.jit
    def chain_tiled(r0):
        def body(i, rr):
            z_o, w_o = stks._tiled_sgs_matvec_mixed_call(
                selp_e, selm_e, dinv_e, diag_e, masks_e, ext(rr[:, :npad]),
                offsets=offsets, v=v, ncolor=ncolor, T=T, H=H,
                ntiles=ntiles, interpret=False)
            return 0.5 * rr + 1e-3 * w_o[:, :npad] + 1e-3 * z_o[:, :npad]
        return jax.lax.fori_loop(0, NCHAIN, body, r0)

    t0 = time.time()
    out = chain_tiled(r_t).block_until_ready()
    print(f"tiled chain compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = chain_tiled(r_t).block_until_ready()
    dt = (time.time() - t0) / NCHAIN
    print(f"tiled per-apply {1e3*dt:.3f} ms", flush=True)

    def xla_once(rr):
        def roll(x, off):
            return jnp.roll(x, -off, axis=-1)

        def offdiag(s, x):
            out = None
            for kk2, off in enumerate(offsets):
                xs = roll(x, off)
                blk = s[kk2 * v * v:(kk2 + 1) * v * v].astype(x.dtype)
                y = jnp.stack([
                    sum(blk[a * v + b] * xs[b] for b in range(v))
                    for a in range(v)], axis=0)
                out = y if out is None else out + y
            return out

        def bapply(blocks, x):
            return jnp.stack(
                [sum(blocks[a * v + b] * x[b] for b in range(v))
                 for a in range(v)], axis=0)

        z = jnp.zeros_like(rr)
        order = list(range(ncolor)) + list(range(ncolor - 2, -1, -1))
        for c in order:
            acc = rr - offdiag(selp_t, z)
            zn = bapply(dinv_t, acc)
            m = masks_t[c][None, :]
            z = jnp.where(m > 0.5, zn, z)
        w = bapply(diag_t, z) + offdiag(sel_t, z)
        return z, w

    @jax.jit
    def chain_xla(r0):
        def body(i, rr):
            z, w = xla_once(rr)
            return 0.5 * rr + 1e-3 * w + 1e-3 * z
        return jax.lax.fori_loop(0, NCHAIN, body, r0)

    t0 = time.time()
    out2 = chain_xla(r_t).block_until_ready()
    print(f"xla chain compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out2 = chain_xla(r_t).block_until_ready()
    dt = (time.time() - t0) / NCHAIN
    print(f"xla per-apply {1e3*dt:.3f} ms", flush=True)

    d = np.abs(np.asarray(out[:, :n]) - np.asarray(out2[:, :n])).max()
    print("chain diff:", d, flush=True)


if __name__ == "__main__":
    main()
