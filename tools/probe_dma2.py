"""Minimal single-DMA probes. python tools/probe_dma2.py <variant>

variants:
  full3d     - copy whole (BG,R,S) ANY -> VMEM scratch (BG,R,S)
  lane3d     - copy ids.at[0] (R,S) -> scratch.at[0]
  row2d      - copy ids.at[0, 0:1, :] (1,S) -> scratch.at[0, 0:1, :]
  row2d_ds   - same but with pl.ds(0,1)
  row2d_sq   - copy ids.at[0, 0, :] (S,) -> scratch.at[0, 0, :]
  row_flat   - 2D source (R,S): ids2.at[0:1,:] -> scratch2.at[0:1,:]
  interp     - row2d in interpret mode
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
    ids = (np.arange(BG * R * S) % 5 - 1).astype(np.int32).reshape(BG, R, S)
    interp = variant == "interp"

    if variant == "row_flat":
        ids2 = ids[0]

        def k(src, out_ref, scr, sem):
            cp = pltpu.make_async_copy(src.at[0:1, :], scr.at[0:1, :], sem)
            cp.start(); cp.wait()
            out_ref[:, :] = jnp.sum(scr[:].astype(jnp.int32))[None, None]

        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((4, S), jnp.int32),
                            pltpu.SemaphoreType.DMA])
        out = np.asarray(jax.jit(f)(jnp.asarray(ids2)))
        return f"OK sum={out[0,0]}"

    def k(src, out_ref, scr, sem):
        if variant == "full3d":
            cp = pltpu.make_async_copy(src, scr, sem)
        elif variant == "lane3d":
            cp = pltpu.make_async_copy(src.at[0], scr.at[0], sem)
        elif variant in ("row2d", "interp"):
            cp = pltpu.make_async_copy(src.at[0, 0:1, :], scr.at[0, 0:1, :],
                                       sem)
        elif variant == "row2d_ds":
            cp = pltpu.make_async_copy(src.at[0, pl.ds(0, 1), :],
                                       scr.at[0, pl.ds(0, 1), :], sem)
        elif variant == "row2d_sq":
            cp = pltpu.make_async_copy(src.at[0, 0, :], scr.at[0, 0, :], sem)
        cp.start(); cp.wait()
        out_ref[:, :] = jnp.sum(scr[:].astype(jnp.int32))[None, None]

    scr_shape = (BG, R, S) if variant in ("full3d", "lane3d") else (BG, 4, S)
    if variant == "lane3d":
        scr_shape = (BG, R, S)
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(scr_shape, jnp.int32),
                        pltpu.SemaphoreType.DMA],
        interpret=interp)
    out = np.asarray(jax.jit(f)(jnp.asarray(ids)))
    return f"OK sum={out[0,0]}"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
