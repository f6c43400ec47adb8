"""Profile the window_load stage in isolation on the cached bench dataset.

Mirrors _load_chunk in kernels/engine_jax.py: ChromReadSource construction
(or per-window loads), window materialization, and the two per-direction
methmer site selections — the producer-thread work that bench r3 shows is
the e2e critical path (window_load 13.4s of a 15.0s wall).

Usage: python tools/profile_loader.py [--cprofile] [--scale N]
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
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import build_scale_dataset
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import (ChromReadSource,
                                          load_reads_given_interval,
                                          MmrConfig, READBACK)
    from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
    from pomfret_tpu.io.intervals_loader import load_intervals_from_file, IS_VCF
    from pomfret_tpu.core.intervals import store_raw_intervals, merge_close_intervals
    from pomfret_tpu.pipeline import Storage, estimate_read_coverage_cached, _derive_chrom_params

    bam_path, vcf, n_gaps = build_scale_dataset()
    bam = BamReader(bam_path)
    st = Storage()
    load_intervals_from_file(vcf, IS_VCF, st)
    for rg in st.ranges:
        store_raw_intervals(rg)
        merge_close_intervals(rg, READBACK)
    name2cov = estimate_read_coverage_cached(bam_path, 2)

    timings = {"src_init": 0.0, "window": 0.0, "methmer": 0.0}
    n_reads = 0

    def run():
        nonlocal n_reads
        for job_i, rg in enumerate(st.ranges):
            ref_name = st.ref_names[job_i]
            cfg, n_cand = _derive_chrom_params(
                MmrConfig(), 14, name2cov.get(ref_name, 0), ref_name)
            t0 = time.perf_counter()
            src = ChromReadSource(bam, ref_name, cfg)
            timings["src_init"] += time.perf_counter() - t0
            for i in range(len(rg.starts)):
                t0 = time.perf_counter()
                if src.ok:
                    rs = src.window(rg.starts[i], rg.ends[i], READBACK, None)
                else:
                    rs = load_reads_given_interval(
                        bam, ref_name, rg.starts[i], rg.ends[i], READBACK, cfg)
                timings["window"] += time.perf_counter() - t0
                n_reads += rs.n
                t0 = time.perf_counter()
                get_methmer_sites_and_ranges(rs, cfg, 0)
                get_methmer_sites_and_ranges(rs, cfg, 1)
                timings["methmer"] += time.perf_counter() - t0

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
    print(f"wall {wall:.2f}s  reads {n_reads}  "
          f"{1e6 * wall / max(n_reads, 1):.0f} us/read")
    print({k: round(v, 2) for k, v in timings.items()})


if __name__ == "__main__":
    main()
