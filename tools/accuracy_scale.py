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

Round-5 extensions (VERDICT r4 #7 — the 1,250 cis probes only demonstrate
the no-false-join property):
  --trans  : every gap's truth is a TRANS join (make_multichrom_multigap_
             scenario trans_alternate=True at BENCH_SCALE): odd blocks get
             hap-swapped GT/HP labels, so a correct joiner must decide
             trans at every gap and a cis decision is a switch error.
             Runs the jax engine per-gap and records decided_trans /
             decided_cis(=switch) / fail.
  --noise  : noise ramp ON THE DENSE 110x SHAPE: one dense chromosome
             (read_stagger=180, 36 blocks -> 100+ report windows) per
             noise level 0.05..0.25, `report` at the at-scale window
             count ACCURACY.md's 25-window sweep lacked.
Both modes MERGE their rows into ACCURACY_SCALE.json.

Usage: BENCH_SCALE=5 python tools/accuracy_scale.py [chunk_stride]
       BENCH_SCALE=5 python tools/accuracy_scale.py --trans
       python tools/accuracy_scale.py --noise
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_REPO, "ACCURACY_SCALE.json")


def _merge_out(update: dict) -> None:
    cur = {}
    if os.path.exists(_OUT):
        with open(_OUT) as f:
            cur = json.load(f)
    cur.update(update)
    with open(_OUT, "w") as f:
        json.dump(cur, f, indent=1)
    print(json.dumps(update))


def _load_gap_storage(bam_path, vcf):
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import READBACK
    from pomfret_tpu.io.intervals_loader import (IS_VCF,
                                                 load_intervals_from_file)
    from pomfret_tpu.core.intervals import (merge_close_intervals,
                                            store_raw_intervals)
    from pomfret_tpu.pipeline import Storage
    bam = BamReader(bam_path)
    st = Storage()
    load_intervals_from_file(vcf, IS_VCF, st)
    for rg in st.ranges:
        store_raw_intervals(rg)
        merge_close_intervals(rg, READBACK)
        rg.decisions = [-1] * len(rg.starts)
    return bam, st


def main_trans():
    """Trans-truth sweep at BENCH_SCALE: correct joiners decide trans at
    EVERY gap; cis decisions are switch errors (blockjoin.c:5044-5084's
    'swapped' verdict is the reference analog)."""
    import hashlib
    scale = int(os.environ.get("BENCH_SCALE", "5"))
    # per_chrom shapes mirror bench.build_scale_dataset's
    per_chrom = [
        {"read_stagger": 700, "cpg_every": 100, "read_len": 20_000},
        {"read_stagger": 1000, "cpg_every": 120, "read_len": 20_000,
         "noise": 0.02, "nocall": 0.02},
        {"read_stagger": 1400, "cpg_every": 160, "read_len": 20_000},
        {"read_stagger": 2000, "cpg_every": 200, "read_len": 20_000,
         "noise": 0.03, "nocall": 0.03},
    ]
    if scale > 1:
        per_chrom.append({"read_stagger": 180, "cpg_every": 120,
                          "read_len": 20_000, "noise": 0.02})
    params = dict(n_blocks=50 * scale + 1, block_len=60_000,
                  gap_len=30_000, per_chrom=per_chrom, trans=True)
    key = hashlib.sha1(
        json.dumps(params, sort_keys=True).encode()).hexdigest()[:12]
    d = os.path.join(_REPO, ".bench_data", key)
    bam_path = os.path.join(d, "scale_trans.bam")
    vcf = os.path.join(d, "multichrom.vcf.gz")
    if not (os.path.exists(bam_path) and os.path.exists(vcf)
            and os.path.exists(bam_path + ".bai")):
        t0 = time.time()
        sys.stderr.write("[acc] generating trans scale dataset...\n")
        os.makedirs(d, exist_ok=True)
        from pomfret_tpu.testing import make_multichrom_multigap_scenario
        make_multichrom_multigap_scenario(
            d, n_blocks=params["n_blocks"], block_len=params["block_len"],
            gap_len=params["gap_len"], per_chrom=params["per_chrom"],
            bam_threads=max(2, (os.cpu_count() or 2)),
            bam_name="scale_trans.bam", trans_alternate=True)
        sys.stderr.write(f"[acc] generated in {time.time()-t0:.0f}s\n")

    from pomfret_tpu.core.readset import MmrConfig
    from pomfret_tpu.kernels.engine_jax import run_jobs_batched
    from pomfret_tpu.pipeline import (_derive_chrom_params,
                                      estimate_read_coverage_cached)
    bam, st = _load_gap_storage(bam_path, vcf)
    name2cov = estimate_read_coverage_cached(bam_path,
                                             max(2, os.cpu_count() or 2))
    jobs = []
    for job_i, rg in enumerate(st.ranges):
        ref_name = st.ref_names[job_i]
        cfg, n_cand = _derive_chrom_params(
            MmrConfig(), 14, name2cov.get(ref_name, 0), ref_name)
        jobs.append(dict(ref_name=ref_name, rg=rg, cfg=cfg, n_cand=n_cand,
                         indices=list(range(len(rg.starts))),
                         perm_key_base=job_i * 1_000_003))
    t0 = time.time()
    results = run_jobs_batched(st, bam, jobs)
    wall = time.time() - t0
    per_chrom_rows = {}
    tot = {"trans": 0, "cis_switch": 0, "fail": 0}
    for job, (decisions, _tags) in zip(jobs, results):
        row = {"trans": 0, "cis_switch": 0, "fail": 0}
        for i in job["indices"]:
            d = decisions[i]
            k = "trans" if d == 1 else ("cis_switch" if d == 0 else "fail")
            row[k] += 1
            tot[k] += 1
        per_chrom_rows[job["ref_name"]] = row
    n = sum(tot.values())
    _merge_out({"trans_sweep": {
        "bench_scale": scale, "gaps": n, "wall_s": round(wall, 1),
        "decided_trans_correct": tot["trans"],
        "decided_cis_switch_errors": tot["cis_switch"],
        "fail": tot["fail"],
        "correct_over_decided": round(
            100.0 * tot["trans"] / max(tot["trans"] + tot["cis_switch"], 1),
            3),
        "per_chrom": per_chrom_rows,
    }})


def main_noise():
    """Noise ramp on the dense 110x shape: >=100 report windows per level
    (ACCURACY.md's ramp was 25 windows on a 50x shape)."""
    import hashlib
    from pomfret_tpu.pipeline import CliOpt, main_methreport
    rows = []
    levels = [float(x) for x in os.environ.get(
        "NOISE_LEVELS", "0.05,0.10,0.15,0.20,0.25").split(",")]
    for noise in levels:
        params = dict(n_blocks=36, block_len=60_000, gap_len=30_000,
                      per_chrom=[{"read_stagger": 180, "cpg_every": 120,
                                  "read_len": 20_000, "noise": noise,
                                  "nocall": 0.05}])
        key = hashlib.sha1(
            json.dumps(params, sort_keys=True).encode()).hexdigest()[:12]
        d = os.path.join(_REPO, ".bench_data", key)
        bam = os.path.join(d, "dense_noise.bam")
        vcf = os.path.join(d, "multichrom.vcf.gz")
        if not (os.path.exists(bam) and os.path.exists(vcf)
                and os.path.exists(bam + ".bai")):
            t0 = time.time()
            sys.stderr.write(f"[acc] generating dense noise={noise}...\n")
            os.makedirs(d, exist_ok=True)
            from pomfret_tpu.testing import make_multichrom_multigap_scenario
            make_multichrom_multigap_scenario(
                d, n_blocks=params["n_blocks"],
                block_len=params["block_len"], gap_len=params["gap_len"],
                per_chrom=params["per_chrom"],
                bam_threads=max(2, (os.cpu_count() or 2)),
                bam_name="dense_noise.bam")
            sys.stderr.write(f"[acc] generated in {time.time()-t0:.0f}s\n")
        with tempfile.TemporaryDirectory() as od:
            prefix = os.path.join(od, "rep")
            # stride 15k -> 3-4 probe windows per 60 kb block (>=100 over
            # the 36-block chromosome; 40k yielded only ~1/block)
            opt = CliOpt(fn_vcf=vcf, fn_bam=bam, output_prefix=prefix,
                         engine="jax", chunk_size=50_000,
                         chunk_stride=15_000)
            t0 = time.time()
            rc = main_methreport(opt)
            assert rc == 0, rc
            counts = {"correct": 0, "switch": 0, "fail": 0}
            with open(prefix + ".report.tsv") as f:
                for line in f:
                    parts = line.split("\t")
                    if len(parts) >= 4:
                        dec = parts[3].strip()
                        counts[dec] = counts.get(dec, 0) + 1
            n = sum(counts.values())
            rows.append({"noise": noise, "windows": n, **counts,
                         "correct_over_decided": round(
                             100.0 * counts["correct"]
                             / max(counts["correct"] + counts["switch"], 1),
                             3),
                         "wall_s": round(time.time() - t0, 1)})
            sys.stderr.write(f"[acc] noise={noise}: {rows[-1]}\n")
    _merge_out({"noise_ramp_dense": {
        "shape": "one ~222x chromosome (read_stagger=180), 36 blocks, "
                 "nocall=0.05, chunk_stride=15k",
        "rows": rows,
    }})


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
    _merge_out(out)


if __name__ == "__main__":
    if "--trans" in sys.argv:
        main_trans()
    elif "--noise" in sys.argv:
        main_noise()
    else:
        main()
