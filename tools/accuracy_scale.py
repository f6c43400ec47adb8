"""Accuracy harness at scale (VERDICT r3 #6).

Runs the `report` subcommand — the reference's own accuracy benchmark
(main_methreport, blockjoin.c:4908-5097): probe windows sampled inside
already-phased regions, re-joined by the full machinery and scored
correct/switch/fail — over the BENCH_SCALE=N dataset (N=5: 1,050 gaps
across five per-chromosome configurations incl. a dense 110x chromosome),
with the jax engine. Appends a summary row to stdout and writes
ACCURACY_SCALE.json.

The 25-window ACCURACY.md sweep was too thin to claim the switch-error
property the reference's published table rests on
(/root/reference/README.md:193-202); this runs 1,000+ probe windows.

Usage: BENCH_SCALE=5 python tools/accuracy_scale.py [chunk_stride]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("BENCH_SCALE", "5")
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    from bench import build_scale_dataset
    from pomfret_tpu.pipeline import CliOpt, main_methreport

    bam, vcf, n_gaps = build_scale_dataset()
    out = {"bench_scale": int(os.environ["BENCH_SCALE"]),
           "dataset_gaps": n_gaps, "chunk_stride": stride}
    with tempfile.TemporaryDirectory() as od:
        prefix = os.path.join(od, "rep")
        opt = CliOpt(fn_vcf=vcf, fn_bam=bam, output_prefix=prefix,
                     engine="jax", chunk_size=50_000, chunk_stride=stride)
        t0 = time.time()
        rc = main_methreport(opt)
        out["wall_s"] = round(time.time() - t0, 1)
        assert rc == 0, rc
        counts = {"correct": 0, "switch": 0, "fail": 0}
        per_chrom = {}
        with open(prefix + ".report.tsv") as f:
            for line in f:  # no header: chrom\tstart\tend\tverdict
                parts = line.split("\t")
                if len(parts) < 4:
                    continue
                chrom, dec = parts[0], parts[3].strip()
                counts[dec] = counts.get(dec, 0) + 1
                pc = per_chrom.setdefault(
                    chrom, {"correct": 0, "switch": 0, "fail": 0})
                pc[dec] = pc.get(dec, 0) + 1
    correct, switch, fail = (counts["correct"], counts["switch"],
                             counts["fail"])
    n = correct + switch + fail
    out.update({
        "windows": n, "correct": correct, "switch": switch, "fail": fail,
        "correct_over_decided": round(100.0 * correct
                                      / max(correct + switch, 1), 3),
        "correct_over_n": round(100.0 * correct / max(n, 1), 3),
        "per_chrom": per_chrom,
    })
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "ACCURACY_SCALE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
