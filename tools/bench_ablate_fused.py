"""Ablation bench for the v2 fused loop: kernel vs XLA glue.

Variants (each timed at two max_iters; slope = us/iter, interleaved rounds):

  v2        — production run_batch_fused2 (forced to run max_iters by
              neutralizing the early-exit cond, so slopes are comparable)
  glue      — v2 body with the Pallas kernel replaced by a passthrough
              (cnt/hp unchanged, do_commit=1): selection + gather + loop
  kernel    — the Pallas score+commit kernel in a fori_loop with cmeta/cids
              fixed from iteration 0 (no per-iter selection/gather)
  select    — candidate selection (slot_mat) only
  gather    — take_along_axis of cids only (fixed cand_read)

Usage: python tools/bench_ablate_fused.py [rounds]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pomfret_tpu.kernels.engine_fused import (_seed_count_table_b,
                                              _step_fused2)


def make_run(variant: str, D: int, nc_cap: int, bg: int):

    @functools.partial(jax.jit, static_argnames=())
    def run(ids, has_mmr, hp_init, seed_ok, n_reads, n_sites, q_break,
            min0, max0, cov, n_cand, max_iters):
        G, R, S = ids.shape
        ids_i = ids.astype(jnp.int32)
        cnt0 = _seed_count_table_b(ids_i, hp_init, seed_ok, has_mmr, D)
        state = (hp_init, cnt0, jnp.zeros(G, jnp.int32),
                 jnp.zeros(G, jnp.int32), jnp.int32(0))

        q = jnp.arange(R)[None, :]

        def selection(hp, q_last):
            untagged = (hp != 0) & (hp != 1)
            elig = untagged & (q >= q_last[:, None]) & (q < n_reads[:, None])
            rank = jnp.cumsum(elig.astype(jnp.int32), axis=1)
            sel = elig & (rank <= n_cand[:, None])
            slot = (rank - 1)[:, :, None] == jnp.arange(nc_cap)[None, None, :]
            slot_mat = sel[:, :, None] & slot
            cand_valid = jnp.any(slot_mat, axis=1)
            cand_read = jnp.sum(slot_mat.astype(jnp.int32) * q[:, :, None],
                                axis=1)
            return cand_read, cand_valid

        def mk_inputs(hp, q_last, active):
            cand_read, cand_valid = selection(hp, q_last)
            cids = jnp.take_along_axis(ids_i, cand_read[:, :, None], axis=1)
            has_mmr_c = jnp.take_along_axis(has_mmr, cand_read, axis=1)
            scal = jnp.stack(
                [min0, max0, cov, n_sites, active.astype(jnp.int32),
                 jnp.zeros_like(min0), jnp.zeros_like(min0),
                 jnp.zeros_like(min0)], axis=1).astype(jnp.int32)
            cmeta = jnp.stack([cand_read, cand_valid.astype(jnp.int32),
                               has_mmr_c.astype(jnp.int32),
                               jnp.zeros_like(cand_read)], axis=1)
            return scal, cmeta, cids

        if variant == "kernel":
            hp0, cnt0_, q0, f0, _ = state
            active0 = jnp.ones(G, bool)
            scal, cmeta, cids = mk_inputs(hp0, q0, active0)

            def body(i, st):
                hp, cnt = st
                cnt, hp, flags = _step_fused2(scal, cmeta, cids, cnt, hp,
                                              D=D, nc_cap=nc_cap, bg=bg)
                return hp, cnt

            hp, cnt = jax.lax.fori_loop(0, max_iters, body, (hp0, cnt0_))
            return hp

        def cond(st):
            return st[4] < max_iters

        def body(st):
            hp, cnt, q_last, failed, it = st
            active = (q_last < q_break) & (failed <= 10)
            if variant == "select":
                cand_read, cand_valid = selection(hp, q_last)
                chk = cand_read.sum() + cand_valid.sum()
                hp = hp + (chk > jnp.int32(-2147483647)).astype(hp.dtype) - 1
                return hp, cnt, q_last, failed, it + 1
            if variant == "gather":
                cand_read = jnp.minimum(
                    q_last[:, None] + jnp.arange(nc_cap)[None, :], R - 1)
                cids = jnp.take_along_axis(ids_i, cand_read[:, :, None],
                                           axis=1)
                chk = cids.sum(axis=(1, 2))
                hp = hp + ((chk > jnp.int32(-2147483647))
                           .astype(hp.dtype) - 1)[:, None]
                return hp, cnt, q_last, failed, it + 1

            scal, cmeta, cids = mk_inputs(hp, q_last, active)
            if variant == "glue":
                # consume the FULL gathered tensors so XLA cannot narrow the
                # take_along_axis to one element (x*0 folds for ints; use a
                # non-foldable compare against an unreachable sentinel)
                chk = (cids.sum(axis=(1, 2)) + cmeta.sum(axis=(1, 2))
                       + scal.sum(axis=1))
                do_commit = chk > jnp.int32(-2147483647)
            else:
                cnt, hp, flags = _step_fused2(scal, cmeta, cids, cnt, hp,
                                              D=D, nc_cap=nc_cap, bg=bg)
                do_commit = flags[:, 0] > 0
            fail_lane = active & ~do_commit
            failed = jnp.where(do_commit, 0,
                               jnp.where(fail_lane, failed + 1, failed))
            q_last = jnp.where(fail_lane, q_last + n_cand, q_last)
            return hp, cnt, q_last, failed, it + 1

        return jax.lax.while_loop(cond, body, state)[0]

    return run


def main():
    from bench import build_real_gap_batch
    from pomfret_tpu.parallel.batch import batch_args

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = 128
    batches, _ = build_real_gap_batch(G)
    b = batches[0]
    print(f"G={G} R={b.ids.shape[1]} S={b.ids.shape[2]} D={b.D} "
          f"nc_cap={b.nc_cap} bg={b.bg} backend={jax.default_backend()}",
          file=sys.stderr)
    args = [jax.device_put(a) for a in batch_args(b, 64)]

    variants = ["v2", "glue", "kernel", "select", "gather"]
    runs = {}
    for v in variants:
        fn = make_run(v, b.D, b.nc_cap, b.bg)

        def mk(fn=fn):
            def r(iters):
                a = list(args)
                a[-1] = jax.device_put(np.int32(iters))
                return np.asarray(fn(*a))
            return r
        runs[v] = mk()
    for v, r in runs.items():
        r(4)
    slopes = {k: [] for k in runs}
    for rnd in range(rounds):
        for k, r in runs.items():
            t = {}
            for iters in (64, 192):
                t0 = time.time()
                for _ in range(3):
                    r(iters)
                t[iters] = (time.time() - t0) / 3
            slopes[k].append((t[192] - t[64]) / 128 * 1e6)
        print(f"round {rnd}: " + "  ".join(
            f"{k}={slopes[k][-1]:.1f}us" for k in runs), file=sys.stderr)
    for k in runs:
        med = sorted(slopes[k])[len(slopes[k]) // 2]
        print(f"{k}: median slope {med:.1f} us/iter", file=sys.stderr)


if __name__ == "__main__":
    main()
