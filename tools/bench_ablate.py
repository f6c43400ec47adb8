"""Ablation bench: which part of the while-loop body costs the time?

Clones run_direction_core with switchable body variants and times each at
two max_iters values (slope = us/iter). Variants:

  full        — current production body
  noscore     — scoring replaced by zeros (selection+commit remain)
  nocommit    — cnt/sums never updated (score+selection remain)
  noselect    — candidate slots fixed to rows [q_last, q_last+nc_cap)
  stacked     — single stacked reduction for score/l_found/l_nonzero
  wtable      — per-iter ratio-table precompute, lookup selects ratios

Usage: python tools/bench_ablate.py [variant ...]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pomfret_tpu.kernels.engine_jax import _range_from_seed, _seed_count_table


def make_body(D: int, nc_cap: int, variant: str):
    def body(state, ids, has_mmr, n_reads, n_sites, min0, max0, cov, n_cand):
        hp, cnt, sums, q_last, failed, it = state
        R, S = ids.shape
        f32 = jnp.float32
        tot = sums.sum(axis=-1)
        min_i, max_i = _range_from_seed(tot, cov, min0, max0, n_sites)

        q = jnp.arange(R)
        if variant == "noselect":
            cand_read = q_last + jnp.arange(nc_cap)
            cand_read = jnp.minimum(cand_read, R - 1)
            cand_valid = jnp.arange(nc_cap) < n_cand
        else:
            untagged = (hp != 0) & (hp != 1)
            elig = untagged & (q >= q_last) & (q < n_reads)
            rank = jnp.cumsum(elig.astype(jnp.int32))
            sel = elig & (rank <= n_cand)
            slot_mat = sel[:, None] & ((rank - 1)[:, None] == jnp.arange(nc_cap)[None, :])
            cand_valid = jnp.any(slot_mat, axis=0)
            cand_read = jnp.sum(slot_mat.astype(jnp.int32) * q[:, None], axis=0)

        cids = jnp.take(ids, cand_read, axis=0)
        covered = cids >= 0
        s_idx = jnp.broadcast_to(jnp.arange(S), cids.shape)
        in_range = (s_idx >= min_i) & (s_idx < max_i)

        if variant == "splithap":
            # split-hap elementwise chains: no mid-chain reduce, so XLA can
            # input-fuse everything into the S reductions
            c0 = jnp.zeros(cids.shape, f32)
            c1 = jnp.zeros(cids.shape, f32)
            for d in range(D):
                m = (cids == d).astype(f32)
                c0 = c0 + m * cnt[None, :, d, 0]
                c1 = c1 + m * cnt[None, :, d, 1]
            found = ((c0 + c1) > 0) & covered & in_range
            s0 = sums[None, :, 0]
            s1 = sums[None, :, 1]
            f0 = found & (s0 > 0)
            f1 = found & (s1 > 0)
            r0 = jnp.where(f0, c0 / jnp.maximum(s0, 1.0), 0.0)
            r1 = jnp.where(f1, c1 / jnp.maximum(s1, 1.0), 0.0)
            score = jnp.stack([r0.sum(axis=1), r1.sum(axis=1)], axis=-1)
            l_found = jnp.stack([f0.sum(axis=1), f1.sum(axis=1)], axis=-1)
            l_total = l_found + jnp.stack([(r0 > 0).sum(axis=1),
                                           (r1 > 0).sum(axis=1)], axis=-1)
        elif variant == "noscore":
            score = jnp.zeros((nc_cap, 2), f32) + cand_read[:, None].astype(f32) * 1e-9
            l_total = jnp.full((nc_cap, 2), 9, jnp.int32)
        elif variant == "wtable":
            w = cnt / jnp.maximum(sums, 1.0)[:, None, :]          # (S, D, 2)
            wc = jnp.zeros(cids.shape + (2,), f32)
            cnt_sum = jnp.zeros(cids.shape, f32)
            for d in range(D):
                m = (cids == d)
                wc = wc + m[..., None] * w[None, :, d, :]
                cnt_sum = cnt_sum + m * (cnt[None, :, d, 0] + cnt[None, :, d, 1])
            found = (cnt_sum > 0) & covered & in_range
            contrib = found[..., None] & (sums[None, :, :] > 0)
            ratio = jnp.where(contrib, wc, 0.0)
            score = ratio.sum(axis=1)
            l_found = contrib.sum(axis=1)
            l_total = l_found + (ratio > 0).sum(axis=1)
        else:
            cnt_c = jnp.zeros(cids.shape + (2,), f32)
            for d in range(D):
                cnt_c = cnt_c + (cids == d)[..., None] * cnt[None, :, d, :]
            found = (cnt_c.sum(axis=-1) > 0) & covered & in_range
            sums_b = sums[None, :, :]
            contrib = found[..., None] & (sums_b > 0)
            ratio = jnp.where(contrib, cnt_c / jnp.maximum(sums_b, 1.0), 0.0)
            if variant == "stacked":
                stk = jnp.stack([ratio,
                                 contrib.astype(f32),
                                 (ratio > 0).astype(f32)], axis=-1)  # (NC,S,2,3)
                red = stk.sum(axis=1)                                # (NC,2,3)
                score = red[..., 0]
                l_found = red[..., 1].astype(jnp.int32)
                l_total = l_found + red[..., 2].astype(jnp.int32)
            else:
                score = ratio.sum(axis=1)
                l_found = contrib.sum(axis=1)
                l_total = l_found + (ratio > 0).sum(axis=1)

        diff = jnp.abs(score[:, 0] - score[:, 1])
        tag_ok = ~((diff < 3.0) & ((l_total[:, 0] < 3) | (l_total[:, 1] < 3)))
        tag = jnp.where(score[:, 0] > score[:, 1], 0, 1).astype(hp.dtype)
        has_mmr_c = jnp.take(has_mmr, cand_read)
        commit_ok = tag_ok & cand_valid & has_mmr_c

        eff = jnp.where(commit_ok, diff, -1.0)
        best = jnp.max(eff)
        best_k = jnp.max(jnp.where(commit_ok & (eff == best), jnp.arange(nc_cap), -1))
        do_commit = best >= 0.0
        k_oh = jax.nn.one_hot(jnp.maximum(best_k, 0), nc_cap, dtype=f32)
        rid = jnp.sum(k_oh * cand_read.astype(f32)).astype(jnp.int32)
        t = jnp.sum(k_oh * tag.astype(f32)).astype(hp.dtype)

        if variant != "nocommit":
            rids = jnp.einsum("c,cs->s", k_oh, cids.astype(f32)).astype(jnp.int32)
            upd = ((rids >= 0) & do_commit).astype(f32)
            rid_oh = jax.nn.one_hot(jnp.where(rids >= 0, rids, 0), D, dtype=f32)
            t_oh = jax.nn.one_hot(t, 2, dtype=f32)
            delta = (upd[:, None] * rid_oh)[:, :, None] * t_oh[None, None, :]
            cnt = cnt + delta
            sums = sums + upd[:, None] * t_oh[None, :]
        hp = jnp.where((q == rid) & do_commit, t, hp)
        failed = jnp.where(do_commit, 0, failed + 1)
        q_last = jnp.where(do_commit, q_last, q_last + n_cand)
        return hp, cnt, sums, q_last, failed, it + 1
    return body


def make_core(D, nc_cap, variant):
    body = make_body(D, nc_cap, variant)

    def core(ids, has_mmr, hp_init, seed_ok, n_reads, n_sites, q_break,
             min0, max0, cov, n_cand, max_iters):
        cnt0 = _seed_count_table(ids, hp_init, seed_ok, has_mmr, D)
        sums0 = cnt0.sum(axis=1)
        state = (hp_init, cnt0, sums0, jnp.int32(0), jnp.int32(0), jnp.int32(0))
        state = jax.lax.while_loop(
            lambda st: (st[3] < q_break) & (st[4] <= 10) & (st[5] < max_iters),
            lambda st: body(st, ids, has_mmr, n_reads, n_sites, min0, max0,
                            cov, n_cand),
            state)
        return state[0]
    return core


def main():
    from bench import build_real_gap_batch
    from pomfret_tpu.parallel.batch import batch_args

    variants = sys.argv[1:] or ["full", "noscore", "nocommit", "noselect",
                                "stacked", "wtable"]
    G = int(os.environ.get("BENCH_GAPS", "128"))
    batches, n_reads = build_real_gap_batch(G)
    b = batches[0]
    print(f"G={G} R={b.ids.shape[1]} S={b.ids.shape[2]} D={b.D} nc={b.nc_cap}",
          file=sys.stderr)
    args = [jax.device_put(a) for a in batch_args(b, 64)]

    for variant in variants:
        core = make_core(b.D, b.nc_cap, variant)
        fn = jax.jit(jax.vmap(core))

        def run(iters):
            a = list(args)
            a[-1] = jax.device_put(np.full(G, iters, dtype=np.int32))
            return np.asarray(fn(*a))

        t0 = time.time()
        run(4)
        t_compile = time.time() - t0
        ts = {}
        for iters in (64, 192):
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                out = run(iters)
            ts[iters] = (time.time() - t0) / reps
        slope = (ts[192] - ts[64]) / 128
        print(f"{variant:9s} compile {t_compile:6.1f}s  "
              f"64it {ts[64]*1e3:6.1f}ms  192it {ts[192]*1e3:6.1f}ms  "
              f"slope {slope*1e6:7.1f} us/iter  tagged={int((out<=1).sum())}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
