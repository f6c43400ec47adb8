"""Incremental additions to known-good lead_i32. python tools/probe_dma6.py <v>

t1: + semaphore array (DMA((BG,)), use .at[0])
t2: + out (BG,1) via jnp.sum(stage, axis=(1,2))[:, None]
t3: + cids scratch (BG,4,S), read (consumed via 0*sum)
t4: t3 but cids (BG,8,S)
t5: t4 + placement where with broadcast_to
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


def run(v):
    ids = (np.arange(BG * R * S) % 5 - 1).astype(np.int32).reshape(BG, R, 1, S)
    off = np.zeros((1, 1), np.int32)
    nc = 8 if v in ("t4", "t5") else NC
    use_cids = v in ("t3", "t4", "t5")

    def k(src, off_ref, out_ref, *scr):
        if use_cids:
            stage, cids, sem = scr
        else:
            stage, sem = scr
        r = off_ref[0, 0] + 5
        cp = pltpu.make_async_copy(src.at[0, r], stage.at[0], sem.at[0])
        cp.start(); cp.wait()
        if v == "t1":
            out_ref[:, :] = jnp.sum(stage[0].astype(jnp.int32))[None, None] \
                + jnp.zeros((BG, 1), jnp.int32)
            return
        acc = jnp.sum(stage[:], axis=2)                    # (BG,1)
        if use_cids:
            if v == "t5":
                k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, nc, 1), 1)
                oh = jnp.broadcast_to(k_i == 2, (BG, nc, S))
                st = jnp.broadcast_to(stage[:], (BG, nc, S))
                cids[:, :, :] = jnp.where(oh, st, cids[:])
            acc = acc + 0 * jnp.sum(jnp.sum(cids[:], axis=2), axis=1, keepdims=True)
        out_ref[:, :] = acc

    scratch = [pltpu.VMEM((BG, 1, S), jnp.int32)]
    if use_cids:
        scratch.append(pltpu.VMEM((BG, nc, S), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA((BG,)))
    f = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch)
    out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(off)))
    return f"OK out={out[:,0].tolist()}"


if __name__ == "__main__":
    v = sys.argv[1]
    try:
        print(f"{v}: {run(v)}", flush=True)
    except Exception as e:
        print(f"{v}: FAIL {type(e).__name__} {str(e).splitlines()[0][:160]}",
              flush=True)
