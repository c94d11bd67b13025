"""Experiment: aligned dynamic-window spline lookup vs chunk-skipped conds.

Times a stripped h_mix secant-style loop with both lookup strategies on the
flagship table shapes (S=9 species, nt~1161 knots, tile=512, f32 via bf16
3-level split).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHUNK = 128


def make_kernel(nrows, ntp, tile, nt, t0, dtg, rounds, mode):
    tmax_tab = t0 + (nt - 1) * dtg
    W = 256

    def lookup_chunk(tab_ref, t):
        tc = jnp.clip(t, t0, tmax_tab)
        klo = jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1, 1, nt - 1)
        g = jnp.zeros((nrows, tile), jnp.float32)
        for c in range(ntp // CHUNK):
            base = c * CHUNK
            hit = jnp.any((klo >= base) & (klo < base + CHUNK))

            def live(gc, base=base):
                rows = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, tile), 0) + base
                ohc = (rows == klo[None, :]).astype(jnp.bfloat16)
                r3 = jnp.dot(tab_ref[:, base:base + CHUNK], ohc,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
                return gc + (r3[:nrows] + r3[nrows:2 * nrows] + r3[2 * nrows:])

            g = jax.lax.cond(hit, live, lambda gc: gc, g)
        return g, klo, tc

    def lookup_window(tab_ref, t):
        tc = jnp.clip(t, t0, tmax_tab)
        klo = jnp.clip(((tc - t0) / dtg).astype(jnp.int32) + 1, 1, nt - 1)
        kmin = jnp.min(klo)
        kmax = jnp.max(klo)
        # keep *CHUNK as the outermost op so Mosaic can prove 128-alignment
        kbase = jnp.minimum(kmin // CHUNK, (ntp - W) // CHUNK) * CHUNK
        covered = kmax < kbase + W

        def win(_):
            w = tab_ref[:, pl.ds(kbase, W)]
            rows = jax.lax.broadcasted_iota(jnp.int32, (W, tile), 0) + kbase
            ohc = (rows == klo[None, :]).astype(jnp.bfloat16)
            r3 = jnp.dot(w, ohc, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
            return r3[:nrows] + r3[nrows:2 * nrows] + r3[2 * nrows:]

        def full(_):
            rows = jax.lax.broadcasted_iota(jnp.int32, (ntp, tile), 0)
            ohc = (rows == klo[None, :]).astype(jnp.bfloat16)
            r3 = jnp.dot(tab_ref[...], ohc, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT)
            return r3[:nrows] + r3[nrows:2 * nrows] + r3[2 * nrows:]

        g = jax.lax.cond(covered, win, full, 0)
        return g, klo, tc

    lookup = lookup_chunk if mode == "chunk" else lookup_window

    def kernel(t_ref, tab_ref, o_ref):
        t = t_ref[0]
        acc = jnp.zeros((tile,), jnp.float32)
        for _ in range(rounds):
            g, klo, tc = lookup(tab_ref, t + acc * 1e-6)
            s4 = nrows // 4
            xk = t0 + klo.astype(jnp.float32) * dtg
            a = ((xk - tc) / dtg)[None, :]
            b = ((tc - (xk - dtg)) / dtg)[None, :]
            yl, yc = g[:s4], g[s4:2 * s4]
            y2l, y2c = g[2 * s4:3 * s4], g[3 * s4:]
            h = a * yl + b * yc + ((a**3 - a) * y2l + (b**3 - b) * y2c) * (dtg*dtg) / 6.0
            acc = acc + jnp.sum(h, axis=0) * 1e-9
        o_ref[0, :] = acc

    return kernel


def main():
    S = 9
    nrows = 4 * S                      # f32 rows pre-split
    nt = 1161
    ntp = -(-nt // CHUNK) * CHUNK      # 1280
    t0, dtg = 200.0, 5.0
    tile = 512
    ntiles = 18
    rounds = 32
    rng = np.random.default_rng(0)
    # spatially coherent temperatures per tile
    base = rng.uniform(300, 2200, (ntiles, 1))
    t_host = (base + rng.uniform(-40, 40, (ntiles, tile))).astype(np.float32)
    tab_f32 = rng.normal(size=(nrows, ntp)).astype(np.float32)

    # bf16 3-level split
    x = tab_f32
    t1 = x.astype(jnp.bfloat16); r1 = x - np.asarray(t1, np.float32)
    t2 = r1.astype(jnp.bfloat16); r2 = r1 - np.asarray(t2, np.float32)
    t3 = r2.astype(jnp.bfloat16)
    tab = jnp.concatenate([jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(t3)], axis=0)

    ts = jnp.asarray(t_host)

    for mode in ("chunk", "window"):
        kern = make_kernel(3 * nrows if False else nrows, ntp, tile, nt, t0, dtg, rounds, mode)
        # NOTE: nrows passed is the f32 row count; the split table has 3x rows
        f = pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec((1, tile), lambda i: (0, i)),
                      pl.BlockSpec(tab.shape, lambda i: (0, 0))],
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((1, ntiles * tile), jnp.float32),
        )
        jf = jax.jit(lambda t: f(t.reshape(1, -1), tab))
        o = jf(ts); jax.block_until_ready(o)
        n = 300
        tt0 = time.perf_counter()
        for _ in range(n):
            o = jf(ts)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - tt0) / n * 1e6
        print(f"{mode:7s}: {dt:9.2f} us  ({rounds} lookups x {ntiles} tiles) out={float(o[0,0]):.6f}")


if __name__ == "__main__":
    main()
