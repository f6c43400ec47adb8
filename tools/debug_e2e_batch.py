"""Reproduce the e2e scenario's device batch and print v3 loop stats.

Builds the same (gap, direction) batch run_gaps_batched would build for the
20-block e2e scenario, runs v3 with stats, prints per-lane iterations /
q_last / failed / commits, and times v3 vs v2 on the batch.

Usage: python tools/debug_e2e_batch.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from tools.bench_e2e import build
    from pomfret_tpu.io.cram import open_alignment
    from pomfret_tpu.core.readset import (READBACK, MmrConfig,
                                          load_reads_given_interval)
    from pomfret_tpu.core.intervals import (Storage, store_raw_intervals,
                                            merge_close_intervals)
    from pomfret_tpu.io.intervals_loader import load_intervals_from_file, IS_VCF
    from pomfret_tpu.core.methmer import (get_methmer_sites_and_ranges,
                                          store_mmr_of_reads, wipe_mmr_of_reads)
    from pomfret_tpu.kernels.engine_jax import build_gap_device_data, _round_up
    from pomfret_tpu.parallel.batch import pack_gap_batch, batch_args
    from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3_core, pick_bg3
    from pomfret_tpu.kernels.engine_fused import run_batch_fused2
    import functools

    bam_fn, vcf_fn = build(20)
    st = Storage()
    load_intervals_from_file(vcf_fn, IS_VCF, st)
    for rg in st.ranges:
        store_raw_intervals(rg)
        merge_close_intervals(rg, READBACK)
    bam = open_alignment(bam_fn)
    rg = st.ranges[0]
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    n_cand = 50 // 4 + 1
    datas = []
    loaded = []
    for i in range(len(rg.starts)):
        rs = load_reads_given_interval(bam, st.ref_names[0], rg.starts[i],
                                       rg.ends[i], READBACK, cfg)
        ms_f = get_methmer_sites_and_ranges(rs, cfg, 0)
        ms_b = get_methmer_sites_and_ranges(rs, cfg, 1)
        if rs.n == 0 or ms_f.n == 0 or ms_b.n == 0:
            continue
        loaded.append((i, rs, ms_f, ms_b))
    pad_r = _round_up(max(rs.n for _, rs, _, _ in loaded), 128)
    pad_s = _round_up(max(max(t[2].n, t[3].n) for t in loaded), 128)
    for direction in (1, 0):
        for i, rs, ms_f, ms_b in loaded:
            ms = ms_f if direction == 0 else ms_b
            store_mmr_of_reads(rs, ms)
            datas.append(build_gap_device_data(rs, ms, direction, pad_r, pad_s))
            wipe_mmr_of_reads(rs)
    batch = pack_gap_batch(datas, [cfg.cov_for_runtime] * len(datas), n_cand)
    G, R, S = batch.ids.shape
    bg3 = min(pick_bg3(batch.D, S, batch.nc_cap), batch.bg)
    print(f"G={G} R={R} S={S} D={batch.D} nc={batch.nc_cap} bg={batch.bg} "
          f"bg3={bg3} lanes_real={len(datas)}", file=sys.stderr)
    args = [jax.device_put(a) for a in batch_args(batch, 2 * R + 64)]

    f3 = jax.jit(functools.partial(run_batch_fused3_core, D=batch.D,
                                   nc_cap=batch.nc_cap, bg=bg3,
                                   with_stats=True))
    t0 = time.time()
    hp, stats = f3(*args)
    hp, stats = np.asarray(hp), np.asarray(stats)
    print(f"v3 compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    hp, stats = f3(*args)
    hp, stats = np.asarray(hp), np.asarray(stats)
    print(f"v3 warm run: {time.time()-t0:.2f}s", file=sys.stderr)
    for b0 in range(0, G, bg3):
        it = stats[b0, 0]
        print(f"block {b0//bg3}: iters={it} "
              f"q_last={stats[b0:b0+bg3, 1].tolist()} "
              f"failed={stats[b0:b0+bg3, 2].tolist()} "
              f"commits={stats[b0:b0+bg3, 3].tolist()}", file=sys.stderr)

    t0 = time.time()
    h2 = np.asarray(run_batch_fused2(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=batch.bg))
    print(f"v2 compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    h2 = np.asarray(run_batch_fused2(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=batch.bg))
    print(f"v2 warm run: {time.time()-t0:.2f}s", file=sys.stderr)
    print(f"tags equal: {np.array_equal(hp, h2)}", file=sys.stderr)


if __name__ == "__main__":
    main()
