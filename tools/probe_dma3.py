"""Chunked-row DMA probes. python tools/probe_dma3.py <variant>

variants: c8_static c8_dyn_aligned c8_dyn_unaligned c16_i8 c32_i8 c32_i8_dyn
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
    i8 = "i8" in variant
    dt, jdt = (np.int8, jnp.int8) if i8 else (np.int32, jnp.int32)
    W = int(variant[1:3].rstrip("_"))
    ids = (np.arange(BG * R * S) % 5 - 1).astype(dt).reshape(BG, R, S)

    def k(src, off_ref, out_ref, scr, sem):
        if "static" in variant:
            r = W
        elif "unaligned" in variant:
            r = off_ref[0, 0] + 3          # traced, unaligned
        else:
            r = off_ref[0, 0] + W          # traced, aligned (off=0 at runtime)
        cp = pltpu.make_async_copy(src.at[0, pl.ds(r, W), :],
                                   scr.at[0, pl.ds(0, W), :], sem)
        cp.start(); cp.wait()
        out_ref[:, :] = jnp.sum(scr[:].astype(jnp.int32))[None, None]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BG, W, S), jdt),
                        pltpu.SemaphoreType.DMA])
    off = np.zeros((1, 1), np.int32)
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(off)))
    r0 = W if "unaligned" not in variant else 3
    want = ids[0, r0:r0 + W].astype(np.int64).sum()
    # scratch rows beyond the copy are uninitialized -> only compare when
    # the scratch is fully written (it is: (BG? no) ) -- scratch is (BG,W,S)
    # but only lane 0 written; report raw sums instead of asserting
    return f"OK sum={out[0,0]} want_lane0={want}"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
