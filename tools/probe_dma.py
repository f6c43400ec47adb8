"""Bisect the HBM->VMEM row-DMA failure. python tools/probe_dma.py <variant>

variants: static_i32 static_i8 traced_row_i32 traced_row_i8 traced_both_i32
          traced_both_i8 chunk_i8 chunk_i32
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BG, R, S = 8, 64, 256


def run(variant):
    dt = np.int8 if variant.endswith("i8") else np.int32
    jdt = jnp.int8 if variant.endswith("i8") else jnp.int32
    ids = (np.arange(BG * R * S) % 5 - 1).astype(dt).reshape(BG, R, S)
    hp = np.full((BG, R), 2, np.int32)
    W = 4 if variant.startswith("chunk") else 1

    def k(ids_hbm, hp_ref, out_ref, cids_s, sem):
        base = hp_ref[0, 0] - 2  # traced 0
        for l in range(BG):
            if variant.startswith("static"):
                r, slot = l, l % 4
            elif variant.startswith("traced_row"):
                r, slot = base + l, l % 4
            else:
                r, slot = base + l, jax.lax.rem(jnp.int32(l), jnp.int32(4))
            cp = pltpu.make_async_copy(
                ids_hbm.at[l, pl.ds(r, W), :],
                cids_s.at[l, pl.ds(slot, W), :], sem.at[l])
            cp.start()
        for l in range(BG):
            if variant.startswith("static"):
                r, slot = l, l % 4
            elif variant.startswith("traced_row"):
                r, slot = base + l, l % 4
            else:
                r, slot = base + l, jax.lax.rem(jnp.int32(l), jnp.int32(4))
            pltpu.make_async_copy(
                ids_hbm.at[l, pl.ds(r, W), :],
                cids_s.at[l, pl.ds(slot, W), :], sem.at[l]).wait()
        got = cids_s[:].astype(jnp.int32)
        out_ref[:, :] = jnp.sum(got, axis=(1, 2))[:, None]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BG, 8, S), jdt),
                        pltpu.SemaphoreType.DMA((BG,))])
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(hp)))
    cids = np.zeros((BG, 8, S), np.int64)
    for l in range(BG):
        cids[l, l % 4:l % 4 + W] = ids[l, l:l + W]
    ref = cids.sum(axis=(1, 2))
    assert (out[:, 0] == ref).all(), (out[:, 0], ref)
    return "OK"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
