"""Pallas TPU kernel for the per-iteration candidate scoring op.

The innermost compute of the phasing loop (query_counts_of_mmrs +
use_mmr_count_predict_tag_for_one_read, blockjoin.c:3487-3656) is, per
candidate read c and haplotype h:

    score[c,h] = sum_s  found(c,s) * (sums[s,h]>0) * cnt[s, id(c,s), h]/sums[s,h]
    l_found[c,h]   = #s contributing at all
    l_nonzero[c,h] = #s contributing with a nonzero ratio

The XLA formulation materializes a (NC, S, D) one-hot tensor; this kernel
streams site tiles through VMEM and keeps the one-hot product in registers,
with the (candidate-mer == dictionary-slot) comparison on the VPU.

Status: an exploratory/alternative kernel validated against the jnp
formulation in tests (tests/test_scoring_pallas.py). The production engine
body instead uses D-unrolled selects (kernels/engine_jax.py), which XLA
fuses into a single elementwise kernel and which benchmarked faster; this
kernel is kept as the building block for a future fully-fused Pallas body.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(minmax_ref, cnt_ref, sums_ref, cids_ref,
                  score_ref, lfound_ref, lnz_ref):
    ts = cnt_ref.shape[0]
    nc = cids_ref.shape[0]
    D = cnt_ref.shape[1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        score_ref[:] = jnp.zeros_like(score_ref)
        lfound_ref[:] = jnp.zeros_like(lfound_ref)
        lnz_ref[:] = jnp.zeros_like(lnz_ref)

    min_i = minmax_ref[0, 0]
    max_i = minmax_ref[0, 1]
    s_base = j * ts

    cids = cids_ref[:]                                     # (NC, TS)
    covered = cids >= 0
    s_abs = s_base + jax.lax.broadcasted_iota(jnp.int32, (nc, ts), 1)
    in_range = (s_abs >= min_i) & (s_abs < max_i)

    # one-hot contraction over the dense dictionary dimension
    oh = (cids[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (nc, ts, D), 2))                        # (NC, TS, D)
    cnt0 = cnt_ref[:, :, 0]                                # (TS, D)
    cnt1 = cnt_ref[:, :, 1]
    v0 = jnp.sum(oh * cnt0[None, :, :], axis=2)            # (NC, TS)
    v1 = jnp.sum(oh * cnt1[None, :, :], axis=2)

    found = ((v0 + v1) > 0) & covered & in_range
    sums0 = sums_ref[:, 0][None, :]                        # (1, TS)
    sums1 = sums_ref[:, 1][None, :]
    c0 = found & (sums0 > 0)
    c1 = found & (sums1 > 0)
    r0 = jnp.where(c0, v0 / jnp.maximum(sums0, 1.0), 0.0)
    r1 = jnp.where(c1, v1 / jnp.maximum(sums1, 1.0), 0.0)

    score_ref[:, 0] += jnp.sum(r0, axis=1)
    score_ref[:, 1] += jnp.sum(r1, axis=1)
    lfound_ref[:, 0] += jnp.sum(c0.astype(jnp.float32), axis=1)
    lfound_ref[:, 1] += jnp.sum(c1.astype(jnp.float32), axis=1)
    lnz_ref[:, 0] += jnp.sum((r0 > 0).astype(jnp.float32), axis=1)
    lnz_ref[:, 1] += jnp.sum((r1 > 0).astype(jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_candidates_pallas(cnt, sums, cids, min_i, max_i,
                            interpret: bool = False):
    """cnt (S,D,2) f32, sums (S,2) f32, cids (NC,S) i32 ->
    (score (NC,2), l_found (NC,2), l_nonzero (NC,2)) in f32."""
    S, D, _ = cnt.shape
    NC = cids.shape[0]
    TS = 128 if S % 128 == 0 else S
    n_tiles = S // TS
    minmax = jnp.stack([min_i, max_i]).astype(jnp.int32).reshape(1, 2)
    out_shape = [jax.ShapeDtypeStruct((NC, 2), jnp.float32)] * 3
    grid = (1, n_tiles)
    score, lf, lnz = pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TS, D, 2), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((TS, 2), lambda i, j: (j, 0)),
            pl.BlockSpec((NC, TS), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((NC, 2), lambda i, j: (0, 0)),
            pl.BlockSpec((NC, 2), lambda i, j: (0, 0)),
            pl.BlockSpec((NC, 2), lambda i, j: (0, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(minmax, cnt, sums, cids)
    return score, lf, lnz


def score_candidates_reference(cnt, sums, cids, min_i, max_i):
    """jnp reference implementation (mirrors the engine body)."""
    NC, S = cids.shape
    covered = cids >= 0
    s_idx = jnp.broadcast_to(jnp.arange(S), cids.shape)
    in_range = (s_idx >= min_i) & (s_idx < max_i)
    cid_oh = jax.nn.one_hot(jnp.where(covered, cids, 0), cnt.shape[1],
                            dtype=jnp.float32)
    cnt_c = jnp.einsum("csd,sdh->csh", cid_oh, cnt.astype(jnp.float32))
    found = (cnt_c.sum(axis=-1) > 0) & covered & in_range
    sums_b = sums[None, :, :].astype(jnp.float32)
    contrib = found[..., None] & (sums_b > 0)
    ratio = jnp.where(contrib, cnt_c / jnp.maximum(sums_b, 1.0), 0.0)
    return (ratio.sum(axis=1), contrib.astype(jnp.float32).sum(axis=1),
            (ratio > 0).astype(jnp.float32).sum(axis=1))
