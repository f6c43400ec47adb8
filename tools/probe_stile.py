"""Probe: can a Pallas TPU kernel loop over S-tiles with TRACED tile bounds,
slicing VMEM refs at dynamic offsets of the minor (lane) dim?

This gates the v3 engine's valid-range S-tiling idea (CLAUDE.md open
thread / VERDICT r1 item 8): per iteration, only site tiles intersecting
the union [min(min_i), max(max_i)) would pay scoring math. The probe
compares a full-S masked ratio sum against a fori_loop over 256-wide tiles
with dynamic start/stop, on shapes matching the bench family
(bg=32, nc=16, S=1536, D=4).

Run on a real TPU: python tools/probe_stile.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

TS = 256


def full_kernel(cnt_ref, cids_ref, rng_ref, out_ref):
    f32 = jnp.float32
    bg, nc, S = cids_ref.shape
    D2 = cnt_ref.shape[1]
    cnt = cnt_ref[:, :, :]
    cvals = cids_ref[:, :, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (bg, S), 1)
    mn = rng_ref[:, 0:1]
    mx = rng_ref[:, 1:2]
    ir = ((idx >= mn) & (idx < mx))[:, None, :]
    c0 = jnp.zeros((bg, nc, S), f32)
    for d in range(D2 // 2):
        m = cvals == d
        c0 = jnp.where(m, cnt[:, 2 * d, :][:, None, :], c0)
    r0 = jnp.where((c0 > 0) & ir, c0 / 7.0, 0.0)
    out_ref[:, :] = jnp.sum(r0, axis=2)


def tiled_kernel(cnt_ref, cids_ref, rng_ref, out_ref):
    f32 = jnp.float32
    bg, nc, S = cids_ref.shape
    D2 = cnt_ref.shape[1]
    mn = rng_ref[:, 0:1]
    mx = rng_ref[:, 1:2]
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
        r0 = jnp.where((c0 > 0) & ir, c0 / 7.0, 0.0)
        return acc + jnp.sum(r0, axis=2)

    acc = jnp.zeros((bg, nc), f32)
    acc = jax.lax.fori_loop(t_lo, t_hi, tile, acc)
    out_ref[:, :] = acc


def main():
    bg, nc, S, D = 32, 16, 1536, 4
    rng = np.random.default_rng(0)
    cnt = rng.integers(0, 5, size=(bg, 2 * D, S)).astype(np.float32)
    cids = rng.integers(-1, D, size=(bg, nc, S)).astype(np.int32)
    ranges = np.stack([np.full(bg, 128), np.full(bg, 640)], 1).astype(np.int32)

    def run(kernel, name):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((bg, nc), jnp.float32))
        g = jax.jit(f)
        t0 = time.time()
        out = np.asarray(g(cnt, cids, ranges))
        print(f"{name}: compile+run {time.time()-t0:.1f}s")
        its = 200
        t0 = time.time()
        for _ in range(its):
            r = g(cnt, cids, ranges)
        r.block_until_ready()
        dt = (time.time() - t0) / its * 1e6
        print(f"{name}: {dt:.1f} us/call")
        return out, dt

    o1, dt1 = run(full_kernel, "full-S")
    try:
        o2, dt2 = run(tiled_kernel, "tiled-S")
    except Exception as e:
        print(f"tiled-S FAILED: {type(e).__name__}: {str(e)[:500]}")
        return
    print("allclose:", np.allclose(o1, o2), "max|d|:",
          float(np.abs(o1 - o2).max()))
    print(f"speedup at range [128,640) of S=1536: {dt1/dt2:.2f}x")


if __name__ == "__main__":
    main()
