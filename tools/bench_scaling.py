"""Distribution-efficiency measurement (SCALING.json).

BASELINE.json's scaling target is >=80% efficiency at 4 hosts. Real
multi-host TPU hardware is not reachable from this environment, but every
partitioning overhead that could sink that target — round-robin gap skew,
fixed-width all-gathers, host-0 write serialization, per-process duplicated
interval/coverage work — is visible on a CPU mesh: this tool runs the
bench dataset's methphase end-to-end at 1/2/4 jax.distributed processes
(the same launcher tests/test_multihost_e2e.py pins byte-identity with),
collects each process's POMFRET_STATS_OUT dump (wall, per-stage seconds,
gap/read counts, device-wait), and writes SCALING.json:

  efficiency_N  = wall_1 / (N * wall_N)  ... classic strong-scaling
  speedup_N     = wall_1 / wall_N
  imbalance_N   = max(window_reads) / mean(window_reads) across procs

Caveat recorded in the artifact: the host has few cores, so N CPU-backend
processes time-share — wall-based efficiency is a LOWER bound; the
work-split metrics (reads/gaps per proc, device_wait) carry the real
signal about partition balance.

Usage: python tools/bench_scaling.py [rounds per N, default 2]
"""
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_n_procs(n_procs, bam, vcf, outdir, salt, round_i):
    env0 = dict(os.environ)
    env0.update({
        "PYTHONPATH": "/root/repo",
        "JAX_PLATFORMS": "cpu",
        "POMFRET_PREFETCH": "0",
    })
    if n_procs > 1:
        env0.update({
            "POMFRET_COORDINATOR":
                "127.0.0.1:%d" % (21000 + ((os.getpid() + salt) % 20000)),
            "POMFRET_NUM_PROCS": str(n_procs),
        })
    procs = []
    stats_files = []
    t0 = time.time()
    for pid in range(n_procs):
        env = dict(env0)
        sf = os.path.join(outdir, f"stats_{n_procs}_{round_i}_{pid}.json")
        stats_files.append(sf)
        env["POMFRET_STATS_OUT"] = sf
        if n_procs > 1:
            env["POMFRET_PROC_ID"] = str(pid)
        args = ["methphase", "-o",
                os.path.join(outdir, f"out_{n_procs}_{round_i}"),
                "--engine", "jax", "--vcf", vcf, bam]
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from pomfret_tpu.cli import main; import sys;"
             f"sys.exit(main({args!r}))"],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        _, err = p.communicate(timeout=3000)
        assert p.returncode == 0, err[-3000:]
    wall = time.time() - t0
    stats = [json.load(open(sf)) for sf in stats_files]
    return wall, stats


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from bench import build_scale_dataset
    bam, vcf, n_gaps = build_scale_dataset()
    out = {"dataset_gaps": n_gaps, "rounds": rounds,
           "host_cpus": os.cpu_count(),
           "caveat": ("CPU-backend procs time-share this host's few cores;"
                      " wall efficiency is a lower bound — the work-split"
                      " columns carry the partition-balance signal")}
    results = {}
    with tempfile.TemporaryDirectory() as od:
        for n in (1, 2, 4):
            walls, all_stats = [], None
            for r in range(rounds):
                wall, stats = run_n_procs(n, bam, vcf, od, salt=37 * n, round_i=r)
                walls.append(wall)
                all_stats = stats
                print(f"[scaling] n={n} round {r}: wall {wall:.1f}s",
                      file=sys.stderr)
            reads = [s["dispatch"]["window_reads"] for s in all_stats]
            gaps = [s["dispatch"]["gaps_decided"] for s in all_stats]
            dw = [round(s["dispatch"]["device_wait_s"], 2) for s in all_stats]
            results[n] = {
                "wall_s_best": round(min(walls), 2),
                "wall_s_all": [round(w, 2) for w in walls],
                "window_reads_per_proc": reads,
                "gaps_per_proc": gaps,
                "device_wait_s_per_proc": dw,
                "proc_wall_s": [s["wall_s"] for s in all_stats],
            }
            if len(reads) > 1 and sum(reads):
                results[n]["read_imbalance"] = round(
                    max(reads) / (sum(reads) / len(reads)), 3)
                results[n]["gap_imbalance"] = round(
                    max(gaps) / (sum(gaps) / len(gaps)), 3)
    w1 = results[1]["wall_s_best"]
    for n in (2, 4):
        results[n]["speedup"] = round(w1 / results[n]["wall_s_best"], 3)
        results[n]["wall_efficiency_lower_bound"] = round(
            w1 / (n * results[n]["wall_s_best"]), 3)
    out["by_procs"] = {str(k): v for k, v in results.items()}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
