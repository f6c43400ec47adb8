"""Bisect lead_i32_multi. python tools/probe_dma5.py <variant>

variants: semarr stage_l placement bcast multi_noplace multi_full
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


def run(variant):
    ids = (np.arange(BG * R * S) % 5 - 1).astype(np.int32).reshape(BG, R, 1, S)
    rows = np.arange(BG, dtype=np.int32).reshape(BG, 1) + 2

    def k(src, rows_ref, out_ref, stage, cids, sem):
        if variant == "semarr":
            r = rows_ref[0, 0]
            cp = pltpu.make_async_copy(src.at[0, r], stage.at[0], sem.at[0])
            cp.start(); cp.wait()
        elif variant == "stage_l":
            for l in range(2):
                r = rows_ref[l, 0]
                cp = pltpu.make_async_copy(src.at[l, r], stage.at[l],
                                           sem.at[l])
                cp.start()
            for l in range(2):
                r = rows_ref[l, 0]
                pltpu.make_async_copy(src.at[l, r], stage.at[l],
                                      sem.at[l]).wait()
        elif variant in ("placement", "bcast"):
            slot = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 0) % NC
            k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 1)
            oh = slot == k_i
            st = stage[:]
            if variant == "bcast":
                st = jnp.broadcast_to(st, (BG, NC, S))
                oh = jnp.broadcast_to(oh, (BG, NC, S))
            cids[:, :, :] = jnp.where(oh, st, cids[:])
        elif variant in ("multi_noplace", "multi_full"):
            for l in range(BG):
                r = rows_ref[l, 0]
                cp = pltpu.make_async_copy(src.at[l, r], stage.at[l],
                                           sem.at[l])
                cp.start()
            for l in range(BG):
                r = rows_ref[l, 0]
                pltpu.make_async_copy(src.at[l, r], stage.at[l],
                                      sem.at[l]).wait()
            if variant == "multi_full":
                slot = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 0) % NC
                k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 1)
                oh = jnp.broadcast_to(slot == k_i, (BG, NC, S))
                st = jnp.broadcast_to(stage[:], (BG, NC, S))
                cids[:, :, :] = jnp.where(oh, st, cids[:])
        out_ref[:, :] = (jnp.sum(stage[:], axis=(1, 2))
                         + 0 * jnp.sum(cids[:], axis=(1, 2)))[:, None]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BG, 1, S), jnp.int32),
                        pltpu.VMEM((BG, NC, S), jnp.int32),
                        pltpu.SemaphoreType.DMA((BG,))])
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(rows)))
    return f"OK out={out[:,0].tolist()}"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
