"""Profile the pack stage in isolation on the cached bench dataset.

Mirrors the consumer side of run_jobs_batched: for each plan group, load
windows (pre-loaded outside the timed region), then time pack_group —
extract_mmr_arrays + build_gap_device_data per lane + pack_gap_batch.

Usage: python tools/profile_pack.py [--cprofile] [--scale N] [--group N]
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("BENCH_SCALE", "1")
    if "--scale" in sys.argv:
        os.environ["BENCH_SCALE"] = sys.argv[sys.argv.index("--scale") + 1]
    group = 128
    if "--group" in sys.argv:
        group = int(sys.argv[sys.argv.index("--group") + 1])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import build_scale_dataset
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import ChromReadSource, MmrConfig, READBACK
    from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
    from pomfret_tpu.io.intervals_loader import load_intervals_from_file, IS_VCF
    from pomfret_tpu.core.intervals import (store_raw_intervals,
                                            merge_close_intervals)
    from pomfret_tpu.pipeline import (Storage, estimate_read_coverage_cached,
                                      _derive_chrom_params)
    from pomfret_tpu.kernels.engine_jax import pack_group

    bam_path, vcf, n_gaps = build_scale_dataset()
    bam = BamReader(bam_path)
    st = Storage()
    load_intervals_from_file(vcf, IS_VCF, st)
    for rg in st.ranges:
        store_raw_intervals(rg)
        merge_close_intervals(rg, READBACK)
    name2cov = estimate_read_coverage_cached(bam_path, 2)

    groups = []
    n_reads = 0
    for job_i, rg in enumerate(st.ranges):
        ref_name = st.ref_names[job_i]
        cfg, n_cand = _derive_chrom_params(
            MmrConfig(), 14, name2cov.get(ref_name, 0), ref_name)
        src = ChromReadSource(bam, ref_name, cfg)
        loaded = []
        for i in range(len(rg.starts)):
            rs = src.window(rg.starts[i], rg.ends[i], READBACK, None)
            if rs.n == 0:
                continue
            ms_fwd = get_methmer_sites_and_ranges(rs, cfg, 0)
            ms_bwd = get_methmer_sites_and_ranges(rs, cfg, 1)
            if ms_fwd.n == 0 or ms_bwd.n == 0:
                continue
            n_reads += rs.n
            loaded.append((i, rs, ms_fwd, ms_bwd))
            if len(loaded) == group:
                groups.append((loaded, cfg, n_cand))
                loaded = []
        if loaded:
            groups.append((loaded, cfg, n_cand))

    def run():
        for loaded, cfg, n_cand in groups:
            pack_group(loaded, cfg, n_cand)

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        run()
        pr.disable()
        wall = time.time() - t0
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
        print(s.getvalue())
    else:
        t0 = time.time()
        run()
        wall = time.time() - t0
    print(f"pack wall {wall:.2f}s  {len(groups)} groups  reads {n_reads}  "
          f"{1e6 * wall / max(n_reads, 1):.0f} us/read")


if __name__ == "__main__":
    main()
