"""Probe 2: S-tiling timing with the iteration loop INSIDE the kernel
(per-call dispatch through the tunnel is ~25-50 ms and drowned probe 1).

Each kernel runs ITERS iterations of the scoring math over (bg,nc,S)
with a valid range [128, 640) of S=1536 — the tiled variant only touches
tiles intersecting the range. us/iter is the comparable number.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

TS = 256
ITERS = 400


def make_kernel(tiled: bool):
    def kernel(cnt_ref, cids_ref, rng_ref, out_ref):
        f32 = jnp.float32
        bg, nc, S = cids_ref.shape
        D2 = cnt_ref.shape[1]
        mn = rng_ref[:, 0:1]
        mx = rng_ref[:, 1:2]

        def score_full(salt):
            cnt = cnt_ref[:, :, :]
            cvals = cids_ref[:, :, :]
            idx = jax.lax.broadcasted_iota(jnp.int32, (bg, S), 1)
            ir = ((idx >= mn) & (idx < mx))[:, None, :]
            c0 = jnp.zeros((bg, nc, S), f32)
            for d in range(D2 // 2):
                m = cvals == d
                c0 = jnp.where(m, cnt[:, 2 * d, :][:, None, :], c0)
            r0 = jnp.where((c0 > 0) & ir, c0 / (7.0 + salt), 0.0)
            return jnp.sum(r0, axis=2)

        def score_tiled(salt):
            t_lo = jnp.min(mn) // TS
            t_hi = (jnp.max(mx) + TS - 1) // TS

            def tile(t, acc):
                off = t * TS
                cnt = cnt_ref[:, :, pl.ds(off, TS)]
                cvals = cids_ref[:, :, pl.ds(off, TS)]
                idx = jax.lax.broadcasted_iota(jnp.int32, (bg, TS), 1) + off
                ir = ((idx >= mn) & (idx < mx))[:, None, :]
                c0 = jnp.zeros((bg, nc, TS), f32)
                for d in range(D2 // 2):
                    m = cvals == d
                    c0 = jnp.where(m, cnt[:, 2 * d, :][:, None, :], c0)
                r0 = jnp.where((c0 > 0) & ir, c0 / (7.0 + salt), 0.0)
                return acc + jnp.sum(r0, axis=2)

            return jax.lax.fori_loop(t_lo, t_hi, tile,
                                     jnp.zeros((bg, nc), f32))

        def it(i, acc):
            s = (score_tiled if tiled else score_full)(i.astype(f32) * 1e-6)
            return acc + s

        out_ref[:, :] = jax.lax.fori_loop(0, ITERS, it,
                                          jnp.zeros((bg, nc), f32))

    return kernel


def main():
    bg, nc, S, D = 32, 16, 1536, 4
    rng = np.random.default_rng(0)
    cnt = rng.integers(0, 5, size=(bg, 2 * D, S)).astype(np.float32)
    cids = rng.integers(-1, D, size=(bg, nc, S)).astype(np.int32)
    ranges = np.stack([np.full(bg, 128), np.full(bg, 640)], 1).astype(np.int32)

    for tiled in (False, True):
        name = "tiled-S" if tiled else "full-S"
        f = pl.pallas_call(
            make_kernel(tiled),
            out_shape=jax.ShapeDtypeStruct((bg, nc), jnp.float32))
        g = jax.jit(f)
        t0 = time.time()
        np.asarray(g(cnt, cids, ranges))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            g(cnt, cids, ranges).block_until_ready()
            best = min(best, time.time() - t0)
        print(f"{name}: {best/ITERS*1e6:.1f} us/iter (best of 5 calls of "
              f"{ITERS} iters)", flush=True)


if __name__ == "__main__":
    main()
