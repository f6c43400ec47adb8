"""4D-layout row DMA probes: row index on an untiled leading dim.

python tools/probe_dma4.py <variant>
variants: lead_i32 lead_i8 lead_i32_multi lead_i8_multi
  lead_*       - one DMA, traced row r: src(BG,R,1,S).at[l, r] -> stage(BG,1,S).at[l]
  lead_*_multi - BG DMAs with per-lane traced rows + sem array, then vector
                 placement into a (BG,NC,S) cids buffer via one-hot select
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
    i8 = "i8" in variant
    dt, jdt = (np.int8, jnp.int8) if i8 else (np.int32, jnp.int32)
    ids = (np.arange(BG * R * S) % 5 - 1).astype(dt).reshape(BG, R, 1, S)

    if "multi" not in variant:
        def k(src, off_ref, out_ref, stage, sem):
            r = off_ref[0, 0] + 5                     # traced row
            cp = pltpu.make_async_copy(src.at[0, r], stage.at[0], sem)
            cp.start(); cp.wait()
            out_ref[:, :] = jnp.sum(stage[0].astype(jnp.int32))[None, None]

        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BG, 1, S), jdt),
                            pltpu.SemaphoreType.DMA])
        off = np.zeros((1, 1), np.int32)
        out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(off)))
        want = ids[0, 5, 0].astype(np.int64).sum()
        assert out[0, 0] == want, (out[0, 0], want)
        return f"OK sum={out[0,0]}"

    def k(src, rows_ref, out_ref, stage, cids, sem):
        for l in range(BG):
            r = rows_ref[l, 0]
            cp = pltpu.make_async_copy(src.at[l, r], stage.at[l], sem.at[l])
            cp.start()
        for l in range(BG):
            r = rows_ref[l, 0]
            pltpu.make_async_copy(src.at[l, r], stage.at[l],
                                  sem.at[l]).wait()
        # vector placement: slot per lane = lane % NC
        slot = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 0) % NC
        k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, NC, 1), 1)
        oh = slot == k_i                                  # (BG,NC,1)
        st = stage[:].astype(jnp.int32)                   # (BG,1,S)
        cur = cids[:].astype(jnp.int32)                   # (BG,NC,S)
        new = jnp.where(oh, st, cur)
        cids[:, :, :] = new.astype(jdt)
        out_ref[:, :] = jnp.sum(cids[:].astype(jnp.int32),
                                axis=(1, 2))[:, None]

    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BG, 1, S), jdt),
                        pltpu.VMEM((BG, NC, S), jdt),
                        pltpu.SemaphoreType.DMA((BG,))])
    rows = np.arange(BG, dtype=np.int32).reshape(BG, 1) + 2
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(rows)))
    # cids uninitialized except one slot per lane; just report
    want = [ids[l, rows[l, 0], 0].astype(np.int64).sum() for l in range(BG)]
    return f"OK out={out[:,0].tolist()} lane_row_sums={want}"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
