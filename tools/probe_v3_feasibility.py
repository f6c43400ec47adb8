"""Integrated feasibility probe for the v3 whole-loop-in-kernel engine.

Validates, compiled on the real backend, the full composed pattern:
  - lax.while_loop with (BG,1) vector carries
  - in-loop vector candidate selection -> VMEM scratch -> per-lane scalar
    loads driving DMA indices
  - pl.when-guarded per-lane DMA from an ANY/HBM-resident (BG,R,1,S) i32
    ids array into a (BG,1,S) staging buffer (row index on untiled dim)
  - vector placement of the staged row into a (BG,NC,S) candidate buffer
    via broadcast one-hot select
  - numeric equality with a NumPy oracle

Mosaic rules discovered on the way (tools/probe_dma*.py):
  - DMA slices may not start at traced offsets of TILED dims; put the row
    dim on an untiled leading axis: (G, R, 1, S)
  - int8 row DMA fails outright; ship i32
  - never materialize 1D vectors in-kernel: keep (BG,1) keepdims shapes

Usage: python tools/probe_v3_feasibility.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BG, R, S, NC = 8, 64, 256, 4
ITERS = 3


def kernel(ids_hbm, hp_ref, out_ref, row_s, stage, cids, sem):
    cids[:, :, :] = jnp.zeros((BG, NC, S), jnp.int32)

    def cond(st):
        it, acc = st
        return it < ITERS

    def body(st):
        it, acc = st
        hp = hp_ref[:]                                   # (BG, R) i32
        q = jax.lax.broadcasted_iota(jnp.int32, (BG, R), 1)
        elig = (hp == 2) & (q >= it * 2)
        nxt = jnp.min(jnp.where(elig, q, R - 1), axis=1, keepdims=True)
        row_s[:, :] = nxt                                # (BG,1)
        slot = jax.lax.rem(it, NC)
        for l in range(BG):
            r = row_s[l, 0]

            @pl.when(r >= 0)
            def _(l=l, r=r):
                pltpu.make_async_copy(ids_hbm.at[l, r], stage.at[l],
                                      sem.at[l]).start()
        for l in range(BG):
            r = row_s[l, 0]

            @pl.when(r >= 0)
            def _(l=l, r=r):
                pltpu.make_async_copy(ids_hbm.at[l, r], stage.at[l],
                                      sem.at[l]).wait()
        k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 1)
        oh = jnp.broadcast_to(k_i == slot, (BG, NC, S))
        st_b = jnp.broadcast_to(stage[:], (BG, NC, S))
        cids[:, :, :] = jnp.where(oh, st_b, cids[:])
        acc = acc + jnp.sum(jnp.sum(cids[:], axis=2), axis=1, keepdims=True)
        return it + 1, acc

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((BG, 1), jnp.int32)))
    out_ref[:, :] = acc


def main():
    ids = (np.arange(BG * R * S, dtype=np.int64) % 5 - 1).astype(np.int32)
    ids = ids.reshape(BG, R, 1, S)
    hp = np.full((BG, R), 2, np.int32)
    hp[:, ::3] = 0

    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BG, 1), jnp.int32),
            pltpu.VMEM((BG, 1, S), jnp.int32),
            pltpu.VMEM((BG, NC, S), jnp.int32),
            pltpu.SemaphoreType.DMA((BG,)),
        ],
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(hp)))
    print("backend:", jax.default_backend())
    print("out:", out[:, 0])

    cids = np.zeros((BG, NC, S), np.int64)
    acc = np.zeros(BG, np.int64)
    for it in range(ITERS):
        for l in range(BG):
            cand = [qq for qq in range(R) if hp[l, qq] == 2 and qq >= it * 2]
            r = cand[0] if cand else R - 1
            cids[l, it % NC] = ids[l, r, 0]
        acc += cids.sum(axis=(1, 2))
    print("ref:", acc)
    assert (out[:, 0] == acc).all(), "MISMATCH"
    print("OK: integrated v3 pattern compiles and matches the oracle")


if __name__ == "__main__":
    main()
