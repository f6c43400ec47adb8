"""Bisect Mosaic support for v3 building blocks. Run: python tools/probe_v3_parts.py [probe]

probes:
  store2d   - write (BG,1) keepdims vector to VMEM scratch
  sload     - scalar load from VMEM scratch, static index
  sload_dyn - scalar load from VMEM scratch, traced index
  smem_dma  - DMA (BG,1) VMEM scratch -> SMEM scratch, read scalars
  dma_dyn   - HBM->VMEM row DMA with traced row + traced slot
  whileloop - lax.while_loop with vector carry
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


def run(name):
    ids = (np.arange(BG * R * S) % 5 - 1).astype(np.int8).reshape(BG, R, S)
    hp = np.full((BG, R), 2, np.int32)

    if name == "store2d":
        def k(hp_ref, out_ref, row_s):
            nxt = jnp.min(hp_ref[:], axis=1, keepdims=True)  # (BG,1)
            row_s[:, :] = nxt
            out_ref[:, :] = row_s[:, :]
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BG, 1), jnp.int32)])
        out = np.asarray(jax.jit(f)(jnp.asarray(hp)))
        assert (out[:, 0] == 2).all(), out
        return "OK"

    if name in ("sload", "sload_dyn"):
        def k(hp_ref, out_ref, row_s):
            row_s[:, :] = jnp.min(hp_ref[:], axis=1, keepdims=True) + \
                jax.lax.broadcasted_iota(jnp.int32, (BG, 1), 0)
            acc = jnp.zeros((BG, 1), jnp.int32)
            for l in range(BG):
                idx = l if name == "sload" else jax.lax.rem(
                    jnp.int32(l) + hp_ref[0, 0] * 0, jnp.int32(BG))
                v = row_s[idx, 0]
                acc = acc + v
            out_ref[:, :] = acc
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BG, 1), jnp.int32)])
        out = np.asarray(jax.jit(f)(jnp.asarray(hp)))
        want = sum(2 + l for l in range(BG))
        assert (out[:, 0] == want).all(), out
        return "OK"

    if name == "smem_dma":
        def k(hp_ref, out_ref, row_v, row_sm, sem):
            row_v[:, :] = jnp.min(hp_ref[:], axis=1, keepdims=True) + \
                jax.lax.broadcasted_iota(jnp.int32, (BG, 1), 0)
            cp = pltpu.make_async_copy(row_v, row_sm, sem)
            cp.start(); cp.wait()
            acc = jnp.zeros((BG, 1), jnp.int32)
            for l in range(BG):
                acc = acc + row_sm[l, 0]
            out_ref[:, :] = acc
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BG, 1), jnp.int32),
                            pltpu.SMEM((BG, 1), jnp.int32),
                            pltpu.SemaphoreType.DMA])
        out = np.asarray(jax.jit(f)(jnp.asarray(hp)))
        want = sum(2 + l for l in range(BG))
        assert (out[:, 0] == want).all(), out
        return "OK"

    if name == "dma_dyn":
        def k(ids_hbm, hp_ref, out_ref, cids_s, sem):
            base = hp_ref[0, 0] - 2  # traced 0
            acc = jnp.zeros((BG, 1), jnp.int32)
            for l in range(BG):
                r = base + l          # traced scalar row
                slot = jax.lax.rem(jnp.int32(l), jnp.int32(4))
                cp = pltpu.make_async_copy(
                    ids_hbm.at[l, pl.ds(r, 1), :],
                    cids_s.at[l, pl.ds(slot, 1), :], sem.at[l])
                cp.start()
            for l in range(BG):
                r = base + l
                slot = jax.lax.rem(jnp.int32(l), jnp.int32(4))
                pltpu.make_async_copy(
                    ids_hbm.at[l, pl.ds(r, 1), :],
                    cids_s.at[l, pl.ds(slot, 1), :], sem.at[l]).wait()
            got = cids_s[:].astype(jnp.int32)
            out_ref[:, :] = jnp.sum(got, axis=(1, 2), keepdims=False)[:, None]
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BG, 4, S), jnp.int8),
                            pltpu.SemaphoreType.DMA((BG,))])
        out = np.asarray(jax.jit(f)(jnp.asarray(ids), jnp.asarray(hp)))
        ref = np.zeros((BG,), np.int64)
        cids = np.zeros((BG, 4, S), np.int8)
        for l in range(BG):
            cids[l, l % 4] = ids[l, l]
        ref = cids.astype(np.int64).sum(axis=(1, 2))
        assert (out[:, 0] == ref).all(), (out[:, 0], ref)
        return "OK"

    if name == "whileloop":
        def k(hp_ref, out_ref):
            def cond(st):
                return st[0] < 5
            def body(st):
                it, acc = st
                return it + 1, acc + jnp.sum(hp_ref[:], axis=1)
            _, acc = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.zeros((BG,), jnp.int32)))
            out_ref[:, :] = acc[:, None]
        f = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((BG, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
        out = np.asarray(jax.jit(f)(jnp.asarray(hp)))
        assert (out[:, 0] == 5 * 2 * R).all(), out
        return "OK"

    return "unknown probe"


if __name__ == "__main__":
    names = sys.argv[1:] or ["store2d", "sload", "sload_dyn", "smem_dma",
                             "dma_dyn", "whileloop"]
    for n in names:
        try:
            print(f"{n}: {run(n)}", flush=True)
        except Exception as e:
            msg = str(e).split(chr(10))[0][:200]
            print(f"{n}: FAIL {type(e).__name__} {msg}", flush=True)
