"""v3 fused engine: the ENTIRE greedy phasing loop inside one Pallas call.

v2 (engine_fused.run_batch_fused2) runs one kernel per loop iteration from a
lax.while_loop: each iteration pays the count-table HBM round trip
(2x (G,D2,S) f32), the candidate-tile materialization ((G,NC,S) i32 gather
write + kernel read), and a kernel-launch pipeline stall — measured ~167
us/iter at bench shapes, of which the kernel itself is ~91 and the XLA glue
~14 (tools/bench_ablate_fused.py).

v3 moves the whole while loop INSIDE the kernel, one grid step per lane
block:

  - the count table, hp vector, and candidate mer-id tiles stay RESIDENT in
    VMEM across all iterations of the block (HBM sees them once);
  - the candidate set is maintained INCREMENTALLY: committing a read frees
    one slot and fetches exactly one new row of the (G,R,1,S) ids array from
    HBM by per-lane DMA (a failed batch refills up to n_cand slots). The
    set-maintenance is provably identical to re-deriving "first n_cand
    untagged reads >= q_last" from scratch (see _next_row docstring);
  - the one-row-per-iteration fetch is SPECULATIVELY PREFETCHED: the next
    row to enter the set — the first untagged read beyond the set's max —
    is already known at iteration START (a commit tags a read *inside* the
    set, which the untagged scan skips; a failed batch only drops the LOW
    end of the set), so its DMA is issued before scoring and waited on
    after the commit, hiding the HBM latency behind the scoring math. A
    post-update recheck (nxt == spec) catches the one case the speculation
    misses (a failed batch dropping the whole set), which falls back to
    gated refill rounds;
  - each lane block exits its loop as soon as ITS gaps converge, instead of
    all lanes paying the global maximum iteration count.

Semantics are haplotag_region1's greedy loop (blockjoin.c:3958-4080),
bit-identical to the v2/vmap engines — same f32 per-site ratio math, same
reduction order along sites, same tie-breaks (v2 breaks score ties by
HIGHEST slot index, which equals highest read index since slots are ordered;
v3 uses read index directly). tests/test_engine_fused.py and
tests/test_engine_fused3.py assert identical final hp vectors.

Mosaic constraints that shaped the layout (probed in tools/probe_dma*.py,
tools/probe_v3_feasibility.py, all on real TPU):
  - DMA slices cannot start at traced offsets of tiled dims -> the ids array
    is reshaped (G, R, 1, S) so the read-row index is an untiled leading
    axis, and rows DMA into a (bg, 1, S) staging buffer;
  - int8 row DMA aborts the compiler -> ids reach the kernel as int32 (the
    resident candidate tiles may still narrow to int8 in VMEM, cid8=True);
  - no multi-axis reductions, no materialized 1D vectors ((bg,1) keepdims
    everywhere), no minor-dim insertion on bools (widen to i32 first).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .engine_fused import _pallas, _seed_count_table_b

# lane block: whole-loop VMEM residency costs ~0.4MB/lane at bench shapes
# (D=4, S=1536, NC=16): count table in+scratch, candidate tiles, scoring
# temps. Bigger blocks amortize the per-block-iteration fixed costs (DMA
# issue, scalar bookkeeping) over more lanes: measured 176 us/iter at
# bg=16 vs 132 at bg=32 (tools/bench_ablate_v3.py, G=128 bench shapes).
BG3 = int(os.environ.get("POMFRET_FUSED3_BG", "32"))
_VMEM_BUDGET = 13 * 1024 * 1024
_BIG = 0x3FFFFFFF


# compile-probe fallback (round-1 advisor/VERDICT weak item 6): the VMEM
# model below is an anchored heuristic fit to the bench shape family; when
# an unusual (D,S,NC,R) still exceeds scoped VMEM at Mosaic-compile time,
# the dispatcher (parallel.batch) calls lower_bg_cap and retries — the
# learned cap is remembered per shape key for the rest of the process.
_BG_CAP: dict = {}


def _cap_key(D: int, S: int, nc_cap: int, R: int):
    return (D, S, nc_cap, R)


def lower_bg_cap(D: int, S: int, nc_cap: int, R: int) -> bool:
    """Halve the learned lane-block cap for this shape after a VMEM
    compile failure. At the 8-lane floor (Pallas requires the sublane
    block dim be a multiple of 8), the next step DISABLES v3 for this
    shape (cap 0 -> engines use the vmapped XLA body): BENCH_SCALE=5's
    dense chromosome produces (R=1792, D=8, NC=64) windows where even
    bg=8 overflows the 16M scoped-VMEM limit. Returns False only when
    already disabled."""
    cur = pick_bg3(D, S, nc_cap, R=R)
    if cur == 0:
        return False
    key = _cap_key(D, S, nc_cap, R)
    _BG_CAP[key] = 0 if cur <= 8 else cur // 2
    return True


def pick_bg3(D: int, S: int, nc_cap: int, R: int = 0) -> int:
    """Largest lane block whose v3 VMEM residency fits the budget.

    Anchor: bg=32 at (D=4, S=1536, NC=16, R=512) compiles and is the
    fastest measured configuration; bg=64 exceeds scoped VMEM. The temp
    estimate is ~2 live (bg,NC,S) f32 intermediates (the nested-select
    scoring chain lets Mosaic reuse buffers) plus the R-resident vectors
    (hp in/out, has_mmr, eligibility temps). A Mosaic VMEM failure at
    compile time additionally lowers the per-shape cap via lower_bg_cap."""
    if jax.default_backend() != "tpu":
        return min(BG3, 8)
    per_lane = (2 * (2 * D * S * 4)      # cnt block + scratch
                + nc_cap * S * 4         # cids
                + 2 * nc_cap * S * 4     # live scoring temps
                # the unrolled per-d select chain holds more live
                # (bg,NC,S) temps as D grows: measured 17.63M scoped at
                # (bg=16, D=8, S=1536, NC=16, R=1792) vs the D=4-anchored
                # model's 8.4M -> ~1.5 extra temps per d beyond 4
                + max(0, D - 4) * nc_cap * S * 6
                + 5 * R * 4)             # hp in/out, hm, (bg,R) temps
    bg = BG3
    while bg > 8 and bg * per_lane > _VMEM_BUDGET:
        bg //= 2
    cap = _BG_CAP.get(_cap_key(D, S, nc_cap, R))
    if cap is not None:
        bg = min(bg, cap)  # 0 = v3 disabled for this shape (see above)
    return bg


def _loop_kernel(scal_ref, hm_ref, cnt_in, hp_in, ids_hbm,
                 hp_out, stats_out,
                 cnt_s, cids, cand_ref, cand_hm, stage, rowb, sem,
                 *, D: int, nc_cap: int, bg: int,
                 ablate: str = ""):
    """One grid step runs the FULL greedy loop for bg gap lanes.

    scal (bg,8)i32 rows [min0,max0,cov,n_sites,n_reads,q_break,n_cand,
    max_iters]; hm (bg,R)i32; cnt_in (bg,D2,S)f32; hp_in (bg,R)i32 aliased
    to hp_out; ids_hbm full (G,R,1,S)i32 in ANY/HBM; stats (bg,8)i32
    [iters, final q_last, final failed, commits]. cand_hm (bg,nc) caches
    each slot's has_mmr bit, maintained at fill time — a per-iteration
    (bg,nc,R) lookup would dominate VMEM at large R.
    """
    pl, pltpu = _pallas()
    f32 = jnp.float32
    R = hp_in.shape[1]
    S = cnt_in.shape[2]
    nc = nc_cap
    cdt = cids.dtype
    pid = pl.program_id(0)

    # --- residency init ---
    hp_out[:, :] = hp_in[:, :]
    cnt_s[:, :, :] = cnt_in[:, :, :]
    cids[:, :, :] = jnp.full((bg, nc, S), -1, cdt)
    cand_ref[:, :] = jnp.full((bg, nc), -1, jnp.int32)
    cand_hm[:, :] = jnp.zeros((bg, nc), jnp.int32)

    min0 = scal_ref[:, 0:1]
    max0 = scal_ref[:, 1:2]
    cov = scal_ref[:, 2:3]
    n_sites = scal_ref[:, 3:4]
    n_reads = scal_ref[:, 4:5]
    q_break = scal_ref[:, 5:6]
    n_cand = scal_ref[:, 6:7]
    max_iters = scal_ref[:, 7:8]

    q_iota = jax.lax.broadcasted_iota(jnp.int32, (bg, R), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (bg, nc), 1)

    def _act(it, q_last, failed):
        if "noexit" in ablate:  # timing ablation: neutralize convergence
            return jnp.broadcast_to(it < max_iters, (bg, 1))
        return (q_last < q_break) & (failed <= 10) & (it < max_iters)

    def _next_row(q_last):
        """(bg,1) index of the first untagged read beyond the current
        candidate set (or >= q_last when the set is empty); _BIG if none.

        Equivalence to re-deriving 'first n_cand untagged >= q_last': every
        untagged read in [q_last, max(set)] is already a member (the set
        held the FIRST n_cand untagged, members only leave by being tagged
        or by q_last passing them), so scanning from max(set)+1 finds
        exactly the next member. blockjoin.c:4037-4051."""
        cr = cand_ref[:, :]
        mx = jnp.max(jnp.where(cr >= 0, cr, -1), axis=1, keepdims=True)
        lo = jnp.maximum(mx + 1, q_last)
        hp = hp_out[:, :]
        elig = ((hp != 0) & (hp != 1) & (q_iota >= lo) & (q_iota < n_reads))
        return jnp.min(jnp.where(elig, q_iota, _BIG), axis=1, keepdims=True)

    # per-lane DMA loops are lax.fori_loops with a DYNAMIC lane index (legal:
    # every sliced dim is untiled) — unrolling them in Python made tracing
    # the kernel ~5x slower (6.6s vs 1.9s at bg=32), paid once per process.
    def _dma_start(nxt, fill_m):
        rowb[:, :] = jnp.where(fill_m, nxt, -1)
        if ablate == "nodma":
            return

        def lane(l, c):
            r = rowb[l, 0]

            @pl.when(r >= 0)
            def _():
                pltpu.make_async_copy(ids_hbm.at[pid * bg + l, r],
                                      stage.at[l], sem.at[l]).start()
            return c

        jax.lax.fori_loop(0, bg, lane, 0)

    def _dma_wait():
        if ablate == "nodma":
            return

        def lane(l, c):
            r = rowb[l, 0]

            @pl.when(r >= 0)
            def _():
                pltpu.make_async_copy(ids_hbm.at[pid * bg + l, r],
                                      stage.at[l], sem.at[l]).wait()
            return c

        jax.lax.fori_loop(0, bg, lane, 0)

    def _place(nxt, fill_m):
        """Adopt the staged row into the first free slot where fill_m."""
        cr = cand_ref[:, :]
        free = jnp.min(jnp.where(cr < 0, k_iota, nc), axis=1, keepdims=True)
        oh = (k_iota == free) & fill_m                     # (bg, nc)
        cand_ref[:, :] = jnp.where(oh, nxt, cr)
        hm_nxt = jnp.sum(jnp.where(q_iota == nxt, hm_ref[:, :], 0),
                         axis=1, keepdims=True)            # (bg, 1)
        cand_hm[:, :] = jnp.where(oh, hm_nxt, cand_hm[:, :])
        # bool minor-dim insertion is unsupported on TPU; widen to i32 first
        oh_i = oh.astype(jnp.int32)
        ohb = jnp.broadcast_to(oh_i[:, :, None], (bg, nc, S)) > 0
        stb = jnp.broadcast_to(stage[:, :, :], (bg, nc, S)).astype(cdt)
        cids[:, :, :] = jnp.where(ohb, stb, cids[:, :, :])

    def _fill_one(nxt, fill_m):
        _dma_start(nxt, fill_m)
        _dma_wait()
        _place(nxt, fill_m)

    def _fill_rounds(q_last, gate, rounds, in_loop=True):
        """Top the candidate set up to n_cand slots (gated per lane). All
        round state lives in refs, so the rounds are a fori_loop (tracing
        rounds Python-unrolled was a measurable per-process cost)."""
        if ablate == "nofill" and in_loop:
            return

        def rnd(_, c):
            nxt = _next_row(q_last)
            nv = jnp.sum((cand_ref[:, :] >= 0).astype(jnp.int32), axis=1,
                         keepdims=True)
            m = gate & (nv < n_cand) & (nxt < _BIG)

            @pl.when(jnp.any(m))
            def _():
                _fill_one(nxt, m)
            return c

        jax.lax.fori_loop(0, rounds, rnd, 0)

    # --- initial candidate set ---
    q0 = jnp.zeros((bg, 1), jnp.int32)
    f0 = jnp.zeros((bg, 1), jnp.int32)
    _fill_rounds(q0, _act(jnp.int32(0), q0, f0), nc, in_loop=False)

    def cond(st):
        it, q_last, failed, ncom = st
        return jnp.any(_act(it, q_last, failed))

    def body(st):
        it, q_last, failed, ncom = st
        active = _act(it, q_last, failed)

        # --- speculative prefetch of the next set member (see module doc):
        # issued now, waited on after the commit, so the HBM latency rides
        # under the scoring math ---
        spec = _next_row(q_last)
        spec_m = active & (spec < _BIG) & (ablate != "nofill")
        _dma_start(spec, spec_m)

        # --- valid-site range from the resident table (blockjoin.c:3669) ---
        cnt = cnt_s[:, :, :]                               # (bg, D2, S)
        s0 = jnp.zeros((bg, S), f32)
        s1 = jnp.zeros((bg, S), f32)
        for d in range(D):
            s0 = s0 + cnt[:, 2 * d + 0, :]
            s1 = s1 + cnt[:, 2 * d + 1, :]
        # counts are small integers, exact in f32, so s0+s1 == sum over D2
        tot = s0 + s1                                      # (bg, S)
        idx = jax.lax.broadcasted_iota(jnp.int32, (bg, S), 1)
        ok = (tot >= cov.astype(f32)) & (idx < n_sites)
        blocked_r = (~ok & (idx >= max0)) | (idx >= n_sites)
        fb = jnp.min(jnp.where(blocked_r, idx, S), axis=1, keepdims=True)
        max_i = jnp.where(fb > max0, fb - 1, max0)         # (bg,1)
        blocked_l = ~ok & (idx <= min0) & (min0 >= 0)
        lnb = jnp.max(jnp.where(blocked_l, idx, -1), axis=1, keepdims=True)
        min_i = jnp.where(min0 < 0, min0,
                          jnp.where(lnb == min0, min0,
                                    jnp.where(lnb >= 0, lnb + 1, 0)))

        # --- scoring (values identical to v2's kernel; fewer VPU ops):
        # the per-(cand,site) count lookup is a nested select over D instead
        # of D masked multiply-adds (at most one d matches, so the selected
        # value equals the masked sum bit-exactly), and the range mask is
        # (bg,S) per-lane instead of a (bg,nc,S) iota.
        #
        # DIVIDE HOIST (VERDICT r4 #5): the quotient cnt[d,s]/sum[s] does
        # not depend on the candidate axis, so the 2*(bg,NC,S) ratio
        # volumes collapse to 2*D (bg,S) frequency planes computed ONCE
        # per iteration — same operands, same f32 divide (counts are
        # integer-valued f32, so max(sum,1) == sum whenever sum > 0),
        # hence bit-identical quotients; the per-candidate lookup then
        # SELECTS precomputed frequencies. Derived masks are equivalent:
        # f[d]>0 <=> cnt[d]>0 (c>0 implies sum>0 implies quotient>0 in
        # f32), and an uncovered cell (cvals<0) matches no d, so
        #   r0   == where(found & sb0>0, c0/max(sb0,1), 0)
        #   nz0  == (r0 > 0), found == (nz0|nz1 before the sb gates),
        # exactly as before. ---
        cvals = cids[:, :, :].astype(jnp.int32)            # (bg, nc, S)
        ir = ((idx >= min_i) & (idx < max_i)).astype(jnp.int32)  # (bg, S)
        in_range = ir[:, None, :] > 0                      # (bg, 1, S)
        sb0 = s0[:, None, :]
        sb1 = s1[:, None, :]
        inv0 = jnp.maximum(s0, 1.0)
        inv1 = jnp.maximum(s1, 1.0)
        fs0 = jnp.zeros((bg, nc, S), f32)
        fs1 = jnp.zeros((bg, nc, S), f32)
        for d in range(D):
            m = cvals == d
            fs0 = jnp.where(m, (cnt[:, 2 * d + 0, :] / inv0)[:, None, :],
                            fs0)
            fs1 = jnp.where(m, (cnt[:, 2 * d + 1, :] / inv1)[:, None, :],
                            fs1)
        r0 = jnp.where(in_range, fs0, 0.0)
        r1 = jnp.where(in_range, fs1, 0.0)
        score0 = jnp.sum(r0, axis=2)                       # (bg, nc)
        score1 = jnp.sum(r1, axis=2)
        nz0 = r0 > 0
        nz1 = r1 > 0
        found = nz0 | nz1
        fm0 = found & (sb0 > 0)
        fm1 = found & (sb1 > 0)
        l_total0 = (jnp.sum(fm0.astype(f32), axis=2)
                    + jnp.sum(nz0.astype(f32), axis=2)).astype(jnp.int32)
        l_total1 = (jnp.sum(fm1.astype(f32), axis=2)
                    + jnp.sum(nz1.astype(f32), axis=2)).astype(jnp.int32)

        # --- decide + commit best (blockjoin.c:3645-3765) ---
        diff = jnp.abs(score0 - score1)
        tag_ok = ~((diff < 3.0) & ((l_total0 < 3) | (l_total1 < 3)))
        tag = jnp.where(score0 > score1, 0, 1)             # (bg, nc)
        cr = cand_ref[:, :]
        commit_ok = tag_ok & (cr >= 0) & (cand_hm[:, :] > 0)
        eff = jnp.where(commit_ok, diff, -1.0)
        best = jnp.max(eff, axis=1, keepdims=True)         # (bg,1)
        win_tie = commit_ok & (eff == best)
        best_rid = jnp.max(jnp.where(win_tie, cr, -1), axis=1, keepdims=True)
        do_commit = (best >= 0.0) & active                 # (bg,1)
        win_oh = (cr == best_rid) & win_tie                # (bg, nc) unique
        t = jnp.sum(jnp.where(win_oh, tag, 0), axis=1, keepdims=True)

        # committed read's mer row -> masked dense adds on the resident table
        wb = jnp.broadcast_to(win_oh.astype(jnp.int32)[:, :, None],
                              (bg, nc, S)) > 0
        rids = jnp.max(jnp.where(wb, cvals, -1), axis=1)   # (bg, S)
        upd = ((rids >= 0) & do_commit).astype(f32)        # (bg, S)
        for d in range(D):
            md = upd * (rids == d)
            cnt_s[:, 2 * d + 0, :] = cnt[:, 2 * d + 0, :] + md * (t == 0)
            cnt_s[:, 2 * d + 1, :] = cnt[:, 2 * d + 1, :] + md * (t == 1)
        hp = hp_out[:, :]
        hp_out[:, :] = jnp.where((q_iota == best_rid) & do_commit, t, hp)
        cand_ref[:, :] = jnp.where(win_oh & do_commit, -1, cr)

        # --- failure bookkeeping (blockjoin.c:4046-4070) ---
        fail_lane = active & ~do_commit
        failed = jnp.where(do_commit, 0,
                           jnp.where(fail_lane, failed + 1, failed))
        q_last = jnp.where(fail_lane, q_last + n_cand, q_last)
        cr2 = cand_ref[:, :]
        cand_ref[:, :] = jnp.where(
            jnp.broadcast_to(fail_lane, (bg, nc)) & (cr2 < q_last), -1, cr2)

        # --- adopt the prefetched row if it is still the right next member
        # (it always is after a commit; a failed batch only drops the LOW
        # end, leaving max(set) and hence the next member unchanged — unless
        # it emptied the set, which the recheck catches) ---
        act_next = _act(it + 1, q_last, failed)
        _dma_wait()
        if ablate != "nofill":
            nxt1 = _next_row(q_last)
            nv = jnp.sum((cand_ref[:, :] >= 0).astype(jnp.int32), axis=1,
                         keepdims=True)
            m0 = act_next & (nv < n_cand) & (nxt1 == spec) & spec_m
            _place(nxt1, m0)
        # anything the speculation missed: gated refill rounds
        _fill_rounds(q_last, act_next, nc)
        ncom = ncom + do_commit.astype(jnp.int32)
        return it + 1, q_last, failed, ncom

    it, q_last, failed, ncom = jax.lax.while_loop(
        cond, body, (jnp.int32(0), q0, f0, jnp.zeros((bg, 1), jnp.int32)))

    stats_out[:, :] = jnp.zeros((bg, 8), jnp.int32)
    stats_out[:, 0:1] = jnp.broadcast_to(jnp.reshape(it, (1, 1)), (bg, 1))
    stats_out[:, 1:2] = q_last
    stats_out[:, 2:3] = failed
    stats_out[:, 3:4] = ncom


def run_batch_fused3_core(ids, has_mmr, hp_init, seed_ok,
                          n_reads, n_sites, q_break, min0, max0, cov, n_cand,
                          max_iters, D: int, nc_cap: int, bg: int = 0,
                          interpret: bool = False, cid8: bool = False,
                          ablate: str = "", with_stats: bool = False):
    """Whole-loop-in-kernel engine; same contract as run_batch_fused2_core:
    all args carry a leading G axis (G a multiple of bg); returns final hp."""
    pl, pltpu = _pallas()
    G, R, S = ids.shape
    bg = bg or pick_bg3(D, nc_cap=nc_cap, S=S, R=R)
    assert G % bg == 0, (G, bg)
    ids_i = ids.astype(jnp.int32)
    cnt0 = _seed_count_table_b(ids_i, hp_init, seed_ok, has_mmr, D)
    ids4 = ids_i.reshape(G, R, 1, S)
    scal = jnp.stack([min0, max0, cov, n_sites, n_reads, q_break,
                      n_cand, max_iters], axis=1).astype(jnp.int32)
    hm_i = has_mmr.astype(jnp.int32)

    kern = functools.partial(_loop_kernel, D=D, nc_cap=nc_cap, bg=bg,
                             ablate=ablate)
    hp, stats = pl.pallas_call(
        kern,
        grid=(G // bg,),
        in_specs=[
            pl.BlockSpec((bg, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 2 * D, S), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bg, R), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, 8), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R), hp_init.dtype),
            jax.ShapeDtypeStruct((G, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bg, 2 * D, S), jnp.float32),
            pltpu.VMEM((bg, nc_cap, S), jnp.int8 if cid8 else jnp.int32),
            pltpu.VMEM((bg, nc_cap), jnp.int32),
            pltpu.VMEM((bg, nc_cap), jnp.int32),
            pltpu.VMEM((bg, 1, S), jnp.int32),
            pltpu.VMEM((bg, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((bg,)),
        ],
        input_output_aliases={3: 0},
        interpret=interpret,
    )(scal, hm_i, cnt0, hp_init, ids4)
    if with_stats:
        return hp, stats
    return hp


@functools.partial(jax.jit,
                   static_argnames=("D", "nc_cap", "bg", "interpret",
                                    "cid8", "ablate"))
def run_batch_fused3(ids, has_mmr, hp_init, seed_ok, n_reads, n_sites,
                     q_break, min0, max0, cov, n_cand, max_iters,
                     D: int, nc_cap: int, bg: int = 0,
                     interpret: bool = False, cid8: bool = False,
                     ablate: str = ""):
    """ablate is for timing ablations only ('nodma' skips the row DMAs,
    'nofill' skips candidate refills, '+noexit' neutralizes convergence
    exits) — every ablation corrupts results."""
    return run_batch_fused3_core(ids, has_mmr, hp_init, seed_ok, n_reads,
                                 n_sites, q_break, min0, max0, cov, n_cand,
                                 max_iters, D, nc_cap, bg=bg,
                                 interpret=interpret, cid8=cid8,
                                 ablate=ablate)
