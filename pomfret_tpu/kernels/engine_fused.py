"""Fused batched device engine: Pallas scoring kernel + hand-batched loop.

Why this exists: the vmapped XLA body (engine_jax.run_direction_core)
materializes several (G, NC, S, 2)-shaped intermediates per iteration —
the mid-chain reduce (`cnt_c.sum(-1)`) and the three sibling reductions
defeat XLA's elementwise fusion, so the measured cost was ~230 us/iter at
G=128, ~6x the HBM roofline (tools/bench_ablate.py; scoring alone is
~190 us/iter of that).

This module rewrites the engine with an explicit batch axis (no vmap) so
the candidate-scoring op — the whale — can run as one Pallas kernel that
streams `(BG, NC, S)` candidate tiles and the `(BG, D*2, S)` count table
through VMEM and reduces to `(BG, 8, NC)` partial scores with NO HBM
intermediates. Everything else (selection, commit, range update) stays in
XLA, batched, with per-lane `active` masking replacing vmap's while-loop
batching rule.

Semantics are those of haplotag_region1's greedy loop (blockjoin.c:3958-
4080) exactly as in engine_jax.py; per-site float ratio math is identical,
only the reduction ORDER over sites inside a score may differ (Mosaic vs
XLA reduce) — decision/tag equivalence vs the host oracle is asserted in
tests/test_engine_fused.py and tests/test_engine_jax.py.

Count-table layout here is (D2=D*2, S): minor axis S maps to TPU lanes
(the (S, D, 2) layout would put size-2/size-D axes minor-most and waste
vector lanes).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

# gap-lanes per Pallas grid step: fatter steps amortize per-step overhead
# against the 16MB scoped-VMEM limit. At bench shapes (D=4, S=1536, NC=16)
# BG=32 measured best (v2: 190us/iter at BG=8 -> 157 at BG=32, interleaved
# medians) and BG=64 OOMs scoped VMEM (27.4MB). BG is the minimum lane
# block G is padded to; pick_bg() may choose a larger one per batch shape.
BG = int(os.environ.get("POMFRET_FUSED_BG", "8"))
BG_MAX = int(os.environ.get("POMFRET_FUSED_BG_MAX", "32"))
_VMEM_BUDGET = 14 * 1024 * 1024


def pick_bg(D: int, S: int, nc_cap: int) -> int:
    """Largest lane block whose v2 kernel blocks fit scoped VMEM.

    Per-lane estimate: count table in+out (2*D2*S*4), widened candidate
    tile + iota/ratio temps (~3*nc*S*4). Measured anchor: 428KB/lane at
    (D=4, S=1536, NC=16) where 64 lanes OOM at 27.4MB and 32 lanes fit.
    On non-TPU backends (interpret-mode tests, CPU dryrun) stay at the
    minimum so padded dead lanes don't inflate test time."""
    if jax.default_backend() != "tpu":
        return BG
    per_lane = 2 * (2 * D * S * 4) + 3 * nc_cap * S * 4
    bg = BG_MAX
    while bg > BG and bg * per_lane > _VMEM_BUDGET:
        bg //= 2
    return max(bg, BG)


def _pallas():
    """Deferred pallas import: ~1.2 s of module initialization that pure-host
    CLI runs (and the CPU test backend's vmap path) never need."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return pl, pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pallas scoring kernel
# ---------------------------------------------------------------------------

def _score_kernel(minmax_ref, cnt_ref, sums_ref, cids_ref, out_ref, *, D: int):
    """One grid step scores BG lanes' candidate sets.

    Blocks: minmax (BG,2)i32; cnt (BG,D2,S)f32; sums (BG,2,S)f32;
    cids (BG,NC,S)i32; out (BG,8,NC)f32 with rows
    [score0, score1, l_found0, l_found1, l_nonzero0, l_nonzero1, 0, 0].
    """
    f32 = jnp.float32
    # widen on load: Mosaic lacks int8 vector compares; HBM traffic stays i8
    cids = cids_ref[:].astype(jnp.int32)                   # (BG, NC, S)
    bg, nc, S = cids.shape
    covered = cids >= 0
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (bg, nc, S), 2)
    min_i = minmax_ref[:, 0][:, None, None]
    max_i = minmax_ref[:, 1][:, None, None]
    in_range = (s_idx >= min_i) & (s_idx < max_i)

    # per-(cand, site) count lookup: D-unrolled selects (at most one d
    # matches, so accumulation order over d is irrelevant)
    c0 = jnp.zeros((bg, nc, S), f32)
    c1 = jnp.zeros((bg, nc, S), f32)
    for d in range(D):
        m = (cids == d).astype(f32)
        c0 = c0 + m * cnt_ref[:, 2 * d + 0, :][:, None, :]
        c1 = c1 + m * cnt_ref[:, 2 * d + 1, :][:, None, :]

    found = ((c0 + c1) > 0) & covered & in_range
    s0 = sums_ref[:, 0, :][:, None, :]
    s1 = sums_ref[:, 1, :][:, None, :]
    f0 = found & (s0 > 0)
    f1 = found & (s1 > 0)
    r0 = jnp.where(f0, c0 / jnp.maximum(s0, 1.0), 0.0)
    r1 = jnp.where(f1, c1 / jnp.maximum(s1, 1.0), 0.0)
    out_ref[:, 0, :] = jnp.sum(r0, axis=2)
    out_ref[:, 1, :] = jnp.sum(r1, axis=2)
    out_ref[:, 2, :] = jnp.sum(f0.astype(f32), axis=2)
    out_ref[:, 3, :] = jnp.sum(f1.astype(f32), axis=2)
    out_ref[:, 4, :] = jnp.sum((r0 > 0).astype(f32), axis=2)
    out_ref[:, 5, :] = jnp.sum((r1 > 0).astype(f32), axis=2)
    out_ref[:, 6, :] = jnp.zeros((bg, nc), f32)
    out_ref[:, 7, :] = jnp.zeros((bg, nc), f32)


def score_candidates_batch(cnt2, sums2, cids, min_i, max_i, *,
                           D: int, bg: int = 0, interpret: bool = False):
    """cnt2 (G,D2,S)f32, sums2 (G,2,S)f32, cids (G,NC,S)i32, min/max (G,)i32
    -> (G, 8, NC) f32 score block. G must be a multiple of BG."""
    G, nc, S = cids.shape
    bg = bg or BG
    assert G % bg == 0, (G, bg)
    pl, pltpu = _pallas()
    minmax = jnp.stack([min_i, max_i], axis=-1).astype(jnp.int32)  # (G, 2)
    kern = functools.partial(_score_kernel, D=D)
    return pl.pallas_call(
        kern,
        grid=(G // bg,),
        in_specs=[
            pl.BlockSpec((bg, 2), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 2 * D, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 2, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, nc, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bg, 8, nc), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 8, nc), jnp.float32),
        interpret=interpret,
    )(minmax, cnt2, sums2, cids)


# ---------------------------------------------------------------------------
# hand-batched loop
# ---------------------------------------------------------------------------

def _range_from_seed_b(tot, cov, min0, max0, n_sites):
    """Batched closed-form update_available_methmer_range
    (blockjoin.c:3669-3691; see engine_jax._range_from_seed)."""
    G, S = tot.shape
    idx = jnp.arange(S)[None, :]
    ok = (tot >= cov[:, None]) & (idx < n_sites[:, None])
    blocked_r = (~ok & (idx >= max0[:, None])) | (idx >= n_sites[:, None])
    fb = jnp.where(jnp.any(blocked_r, 1), jnp.argmax(blocked_r, 1), S)
    max_i = jnp.where(fb > max0, fb - 1, max0)
    blocked_l = ~ok & (idx <= min0[:, None]) & (min0[:, None] >= 0)
    lnb = jnp.where(jnp.any(blocked_l, 1),
                    (S - 1) - jnp.argmax(blocked_l[:, ::-1], 1), -1)
    min_i = jnp.where(min0 < 0, min0,
                      jnp.where(lnb == min0, min0,
                                jnp.where(lnb >= 0, lnb + 1, 0)))
    return min_i, max_i


def _seed_count_table_b(ids, hp_init, seed_ok, has_mmr, D: int):
    """(G,D2,S) f32 seed counts (insert_ref_reads_methmer_counts,
    blockjoin.c:3776-3810)."""
    ins0 = ((hp_init == 0) & seed_ok & has_mmr).astype(jnp.float32)  # (G,R)
    ins1 = ((hp_init == 1) & seed_ok & has_mmr).astype(jnp.float32)
    rows = []
    for d in range(D):
        m = (ids == d).astype(jnp.float32)                 # (G,R,S)
        rows.append(jnp.einsum("grs,gr->gs", m, ins0))
        rows.append(jnp.einsum("grs,gr->gs", m, ins1))
    return jnp.stack(rows, axis=1)                         # (G, D2, S)


def run_batch_fused_core(ids, has_mmr, hp_init, seed_ok,
                         n_reads, n_sites, q_break, min0, max0, cov, n_cand,
                         max_iters, D: int, nc_cap: int, bg: int = 0,
                         interpret: bool = False):
    """Hand-batched equivalent of vmap(run_direction_core): all args carry a
    leading G axis (G multiple of BG); returns final hp (G, R)."""
    G, R, S = ids.shape
    f32 = jnp.float32
    ids = ids.astype(jnp.int32)  # i8 rides the upload; the loop wants i32

    cnt0 = _seed_count_table_b(ids, hp_init, seed_ok, has_mmr, D)
    sums0 = cnt0.reshape(G, D, 2, S).sum(axis=1)           # (G, 2, S)
    state = (hp_init, cnt0, sums0,
             jnp.zeros(G, jnp.int32), jnp.zeros(G, jnp.int32), jnp.int32(0))

    def cond(st):
        hp, cnt, sums, q_last, failed, it = st
        active = (q_last < q_break) & (failed <= 10) & (it < max_iters)
        return jnp.any(active)

    def body(st):
        hp, cnt, sums, q_last, failed, it = st
        active = (q_last < q_break) & (failed <= 10) & (it < max_iters)
        tot = sums.sum(axis=1)                              # (G, S)
        min_i, max_i = _range_from_seed_b(tot, cov, min0, max0, n_sites)

        # --- candidate collection (blockjoin.c:4037-4051) ---
        q = jnp.arange(R)[None, :]                          # (1, R)
        untagged = (hp != 0) & (hp != 1)
        elig = untagged & (q >= q_last[:, None]) & (q < n_reads[:, None])
        rank = jnp.cumsum(elig.astype(jnp.int32), axis=1)
        sel = elig & (rank <= n_cand[:, None])
        slot = (rank - 1)[:, :, None] == jnp.arange(nc_cap)[None, None, :]
        slot_mat = sel[:, :, None] & slot                   # (G, R, NC)
        cand_valid = jnp.any(slot_mat, axis=1)              # (G, NC)
        cand_read = jnp.sum(slot_mat.astype(jnp.int32) * q[:, :, None],
                            axis=1)                         # (G, NC)

        # --- scoring: the Pallas kernel ---
        cids = jnp.take_along_axis(ids, cand_read[:, :, None], axis=1)
        blk = score_candidates_batch(cnt, sums, cids, min_i, max_i,
                                     D=D, bg=bg, interpret=interpret)
        score0, score1 = blk[:, 0, :], blk[:, 1, :]
        l_total0 = (blk[:, 2, :] + blk[:, 4, :]).astype(jnp.int32)
        l_total1 = (blk[:, 3, :] + blk[:, 5, :]).astype(jnp.int32)
        diff = jnp.abs(score0 - score1)                     # (G, NC)
        tag_ok = ~((diff < 3.0) & ((l_total0 < 3) | (l_total1 < 3)))
        tag = jnp.where(score0 > score1, 0, 1).astype(hp.dtype)
        has_mmr_c = jnp.take_along_axis(has_mmr, cand_read, axis=1)
        commit_ok = tag_ok & cand_valid & has_mmr_c

        # --- commit best (ties -> latest slot; blockjoin.c:3729-3765) ---
        eff = jnp.where(commit_ok, diff, -1.0)
        best = jnp.max(eff, axis=1)                          # (G,)
        best_k = jnp.max(jnp.where(commit_ok & (eff == best[:, None]),
                                   jnp.arange(nc_cap)[None, :], -1), axis=1)
        do_commit = (best >= 0.0) & active                   # (G,)
        k_oh = jax.nn.one_hot(jnp.maximum(best_k, 0), nc_cap, dtype=f32)
        rid = jnp.sum(k_oh * cand_read.astype(f32), axis=1).astype(jnp.int32)
        t = jnp.sum(k_oh * tag.astype(f32), axis=1).astype(hp.dtype)

        # committed read's mer-id row, then masked dense adds in (D2, S)
        rids = jnp.einsum("gc,gcs->gs", k_oh, cids.astype(f32)).astype(jnp.int32)
        upd = ((rids >= 0) & do_commit[:, None]).astype(f32)  # (G, S)
        th = t[:, None]                                       # (G, 1)
        drows = []
        for d in range(D):
            md = upd * (rids == d)
            drows.append(md * (th == 0))
            drows.append(md * (th == 1))
        cnt = cnt + jnp.stack(drows, axis=1)
        sums = sums + jnp.stack([upd * (th == 0), upd * (th == 1)], axis=1)
        hp = jnp.where((q == rid[:, None]) & do_commit[:, None], t[:, None], hp)
        fail_lane = active & ~do_commit
        failed = jnp.where(do_commit, 0, jnp.where(fail_lane, failed + 1, failed))
        q_last = jnp.where(fail_lane, q_last + n_cand, q_last)
        return hp, cnt, sums, q_last, failed, it + 1

    state = jax.lax.while_loop(cond, body, state)
    return state[0]


# ---------------------------------------------------------------------------
# v2: score + commit + range in ONE kernel, count table aliased in place
# ---------------------------------------------------------------------------

def _score_commit_kernel(scal_ref, cmeta_ref, cids_ref, cnt_ref, hp_ref,
                         cnt_out, hp_out, flag_out, *, D: int):
    """One grid step advances BG lanes by one greedy iteration.

    Blocks: scal (BG,8)i32 rows [min0,max0,cov,n_sites,active,_,_,_];
    cmeta (BG,4,NC)i32 rows [cand_read, cand_valid, has_mmr_c, _];
    cids (BG,NC,S)i8/i32; cnt (BG,D2,S)f32 aliased to cnt_out;
    hp (BG,R)i32 aliased to hp_out; flag_out (BG,8)i32 row0=do_commit.

    The valid-site range is recomputed from the count table itself
    (tot = sum_d cnt — counts are small integers, exact in f32, so this
    equals the incrementally-maintained sums), scoring is v1's math
    verbatim, and the winning candidate's one-hot update is applied to the
    table in VMEM before the single writeback — the XLA body keeps only
    candidate selection and the loop counters.
    """
    f32 = jnp.float32
    # widen on load: Mosaic lacks int8 vector compares; HBM traffic stays i8
    cids = cids_ref[:].astype(jnp.int32)                   # (BG, NC, S)
    bg, nc, S = cids.shape
    R = hp_ref.shape[1]
    min0 = scal_ref[:, 0][:, None]
    max0 = scal_ref[:, 1][:, None]
    cov = scal_ref[:, 2][:, None]
    n_sites = scal_ref[:, 3][:, None]
    active = scal_ref[:, 4] > 0                            # (BG,)

    # --- range from the table (blockjoin.c:3669-3691) ---
    cnt = cnt_ref[:]                                       # (BG, D2, S)
    tot = jnp.sum(cnt, axis=1)                             # (BG, S)
    s0 = jnp.zeros((bg, S), f32)
    s1 = jnp.zeros((bg, S), f32)
    for d in range(D):
        s0 = s0 + cnt[:, 2 * d + 0, :]
        s1 = s1 + cnt[:, 2 * d + 1, :]
    idx = jax.lax.broadcasted_iota(jnp.int32, (bg, S), 1)
    ok = (tot >= cov.astype(f32)) & (idx < n_sites)
    blocked_r = (~ok & (idx >= max0)) | (idx >= n_sites)
    fb = jnp.min(jnp.where(blocked_r, idx, S), axis=1)     # first blocked
    max_i = jnp.where(fb > max0[:, 0], fb - 1, max0[:, 0])
    blocked_l = ~ok & (idx <= min0) & (min0 >= 0)
    lnb = jnp.max(jnp.where(blocked_l, idx, -1), axis=1)   # last blocked
    m0 = min0[:, 0]
    min_i = jnp.where(m0 < 0, m0,
                      jnp.where(lnb == m0, m0,
                                jnp.where(lnb >= 0, lnb + 1, 0)))

    # --- scoring (v1 math) ---
    covered = cids >= 0
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (bg, nc, S), 2)
    in_range = (s_idx >= min_i[:, None, None]) & (s_idx < max_i[:, None, None])
    c0 = jnp.zeros((bg, nc, S), f32)
    c1 = jnp.zeros((bg, nc, S), f32)
    for d in range(D):
        m = (cids == d).astype(f32)
        c0 = c0 + m * cnt[:, 2 * d + 0, :][:, None, :]
        c1 = c1 + m * cnt[:, 2 * d + 1, :][:, None, :]
    found = ((c0 + c1) > 0) & covered & in_range
    sb0 = s0[:, None, :]
    sb1 = s1[:, None, :]
    f0 = found & (sb0 > 0)
    f1 = found & (sb1 > 0)
    r0 = jnp.where(f0, c0 / jnp.maximum(sb0, 1.0), 0.0)
    r1 = jnp.where(f1, c1 / jnp.maximum(sb1, 1.0), 0.0)
    score0 = jnp.sum(r0, axis=2)                           # (BG, NC)
    score1 = jnp.sum(r1, axis=2)
    l_total0 = (jnp.sum(f0.astype(f32), axis=2)
                + jnp.sum((r0 > 0).astype(f32), axis=2)).astype(jnp.int32)
    l_total1 = (jnp.sum(f1.astype(f32), axis=2)
                + jnp.sum((r1 > 0).astype(f32), axis=2)).astype(jnp.int32)

    # --- decide + pick best (blockjoin.c:3645-3765) ---
    diff = jnp.abs(score0 - score1)
    tag_ok = ~((diff < 3.0) & ((l_total0 < 3) | (l_total1 < 3)))
    tag = jnp.where(score0 > score1, 0, 1)                 # (BG, NC) i32
    cand_read = cmeta_ref[:, 0, :]
    commit_ok = tag_ok & (cmeta_ref[:, 1, :] > 0) & (cmeta_ref[:, 2, :] > 0)
    eff = jnp.where(commit_ok, diff, -1.0)
    best = jnp.max(eff, axis=1)                            # (BG,)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (bg, nc), 1)
    best_k = jnp.max(jnp.where(commit_ok & (eff == best[:, None]),
                               k_iota, -1), axis=1)
    do_commit = (best >= 0.0) & active                     # (BG,)
    k_oh = (k_iota == jnp.maximum(best_k, 0)[:, None]).astype(f32)
    rid = jnp.sum(k_oh * cand_read.astype(f32), axis=1).astype(jnp.int32)
    t = jnp.sum(k_oh * tag.astype(f32), axis=1).astype(jnp.int32)

    # --- commit in VMEM, single writeback ---
    rids = jnp.sum(k_oh[:, :, None] * cids.astype(f32), axis=1).astype(jnp.int32)
    upd = ((rids >= 0) & do_commit[:, None]).astype(f32)   # (BG, S)
    th = t[:, None]
    for d in range(D):
        md = upd * (rids == d)
        cnt_out[:, 2 * d + 0, :] = cnt[:, 2 * d + 0, :] + md * (th == 0)
        cnt_out[:, 2 * d + 1, :] = cnt[:, 2 * d + 1, :] + md * (th == 1)
    q = jax.lax.broadcasted_iota(jnp.int32, (bg, R), 1)
    hp = hp_ref[:]
    hp_out[:] = jnp.where((q == rid[:, None]) & do_commit[:, None],
                          t[:, None], hp)
    flag_out[:] = jnp.broadcast_to(do_commit.astype(jnp.int32)[:, None],
                                   (bg, 8))


def _step_fused2(scal, cmeta, cids, cnt, hp, *, D: int, nc_cap: int,
                 bg: int = 0, interpret: bool = False):
    G, nc, S = cids.shape
    R = hp.shape[1]
    bg = bg or BG
    assert G % bg == 0, (G, bg)
    pl, pltpu = _pallas()
    kern = functools.partial(_score_commit_kernel, D=D)
    return pl.pallas_call(
        kern,
        grid=(G // bg,),
        in_specs=[
            pl.BlockSpec((bg, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 4, nc), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, nc, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 2 * D, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bg, 2 * D, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, 2 * D, S), jnp.float32),
            jax.ShapeDtypeStruct((G, R), hp.dtype),
            jax.ShapeDtypeStruct((G, 8), jnp.int32),
        ],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(scal, cmeta, cids, cnt, hp)


def run_batch_fused2_core(ids, has_mmr, hp_init, seed_ok,
                          n_reads, n_sites, q_break, min0, max0, cov, n_cand,
                          max_iters, D: int, nc_cap: int, bg: int = 0,
                          interpret: bool = False):
    """v2 of run_batch_fused_core: one kernel per iteration does range +
    score + commit with the count table aliased in place; no separate sums
    state. Tag-identical to v1 and the vmapped engine."""
    G, R, S = ids.shape
    f32 = jnp.float32
    ids = ids.astype(jnp.int32)  # i8 rides the upload; the loop wants i32

    cnt0 = _seed_count_table_b(ids, hp_init, seed_ok, has_mmr, D)
    state = (hp_init, cnt0,
             jnp.zeros(G, jnp.int32), jnp.zeros(G, jnp.int32), jnp.int32(0))

    def cond(st):
        hp, cnt, q_last, failed, it = st
        active = (q_last < q_break) & (failed <= 10) & (it < max_iters)
        return jnp.any(active)

    def body(st):
        hp, cnt, q_last, failed, it = st
        active = (q_last < q_break) & (failed <= 10) & (it < max_iters)

        # --- candidate collection (XLA: cheap (G,R) ops) ---
        q = jnp.arange(R)[None, :]
        untagged = (hp != 0) & (hp != 1)
        elig = untagged & (q >= q_last[:, None]) & (q < n_reads[:, None])
        rank = jnp.cumsum(elig.astype(jnp.int32), axis=1)
        sel = elig & (rank <= n_cand[:, None])
        slot = (rank - 1)[:, :, None] == jnp.arange(nc_cap)[None, None, :]
        slot_mat = sel[:, :, None] & slot
        cand_valid = jnp.any(slot_mat, axis=1)
        cand_read = jnp.sum(slot_mat.astype(jnp.int32) * q[:, :, None], axis=1)
        cids = jnp.take_along_axis(ids, cand_read[:, :, None], axis=1)
        has_mmr_c = jnp.take_along_axis(has_mmr, cand_read, axis=1)

        scal = jnp.stack([min0, max0, cov, n_sites, active.astype(jnp.int32),
                          jnp.zeros_like(min0), jnp.zeros_like(min0),
                          jnp.zeros_like(min0)], axis=1).astype(jnp.int32)
        cmeta = jnp.stack([cand_read, cand_valid.astype(jnp.int32),
                           has_mmr_c.astype(jnp.int32),
                           jnp.zeros_like(cand_read)], axis=1)

        cnt, hp, flags = _step_fused2(scal, cmeta, cids, cnt, hp, D=D,
                                      nc_cap=nc_cap, bg=bg,
                                      interpret=interpret)
        do_commit = flags[:, 0] > 0
        fail_lane = active & ~do_commit
        failed = jnp.where(do_commit, 0,
                           jnp.where(fail_lane, failed + 1, failed))
        q_last = jnp.where(fail_lane, q_last + n_cand, q_last)
        return hp, cnt, q_last, failed, it + 1

    state = jax.lax.while_loop(cond, body, state)
    return state[0]


@functools.partial(jax.jit,
                   static_argnames=("D", "nc_cap", "bg", "interpret"))
def run_batch_fused2(ids, has_mmr, hp_init, seed_ok, n_reads, n_sites,
                     q_break, min0, max0, cov, n_cand, max_iters,
                     D: int, nc_cap: int, bg: int = 0,
                     interpret: bool = False):
    return run_batch_fused2_core(ids, has_mmr, hp_init, seed_ok, n_reads,
                                 n_sites, q_break, min0, max0, cov, n_cand,
                                 max_iters, D, nc_cap, bg=bg,
                                 interpret=interpret)


def _want_interpret() -> bool:
    return (jax.default_backend() != "tpu"
            or os.environ.get("POMFRET_FUSED_INTERPRET") == "1")


@functools.partial(jax.jit,
                   static_argnames=("D", "nc_cap", "bg", "interpret"))
def run_batch_fused(ids, has_mmr, hp_init, seed_ok, n_reads, n_sites,
                    q_break, min0, max0, cov, n_cand, max_iters,
                    D: int, nc_cap: int, bg: int = 0,
                    interpret: bool = False):
    return run_batch_fused_core(ids, has_mmr, hp_init, seed_ok, n_reads,
                                n_sites, q_break, min0, max0, cov, n_cand,
                                max_iters, D, nc_cap, bg=bg,
                                interpret=interpret)


def fused_enabled() -> bool:
    """Production default: fused engine on TPU unless disabled; off elsewhere
    (the interpret path is for tests, not speed)."""
    if os.environ.get("POMFRET_NO_FUSED") == "1":
        return False
    if os.environ.get("POMFRET_FORCE_FUSED") == "1":
        return True
    return jax.default_backend() == "tpu"
