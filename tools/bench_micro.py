"""Microbenchmark: per-iteration device time of the phasing while-loop.

Times the same compiled executable at two max_iters values; the slope gives
time/iteration free of dispatch+download overhead. Run on the real TPU:

    python tools/bench_micro.py [G]

Env: BENCH_GAPS (default 128).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from bench import build_real_gap_batch
    from pomfret_tpu.parallel.batch import batch_args, _run_batch_jit

    G = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_GAPS", "128"))
    batches, n_reads = build_real_gap_batch(G)
    b = batches[0]
    print(f"G={G} R={b.ids.shape[1]} S={b.ids.shape[2]} D={b.D} nc_cap={b.nc_cap} "
          f"n_reads={n_reads} backend={jax.default_backend()}", file=sys.stderr)

    # device-resident args; max_iters traced so one executable serves all
    args = [jax.device_put(a) for a in batch_args(b, 64)]

    def run(iters):
        a = list(args)
        a[-1] = jax.device_put(np.full(G, iters, dtype=np.int32))
        out = _run_batch_jit(*a, D=b.D, nc_cap=b.nc_cap)
        return np.asarray(out)  # download forces real completion (tunnel-safe)

    run(4)  # compile + warm
    for it_lo, it_hi in ((32, 96), (64, 192)):
        ts = {}
        for iters in (it_lo, it_hi):
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                run(iters)
            ts[iters] = (time.time() - t0) / reps
        slope = (ts[it_hi] - ts[it_lo]) / (it_hi - it_lo)
        print(f"iters {it_lo}->{it_hi}: {ts[it_lo]*1e3:.1f}ms -> {ts[it_hi]*1e3:.1f}ms; "
              f"slope {slope*1e6:.1f} us/iter ({slope*1e6/G:.3f} us/lane-iter)",
              file=sys.stderr)
    # traffic model: lookup table + commit r/w + cids gather
    S, D = b.ids.shape[2], b.D
    table = S * D * 2 * 4
    cids = b.nc_cap * S * 4
    model = (3 * table + cids) * G
    print(f"model traffic/iter = {model/1e6:.1f} MB -> {model/819e9*1e6:.1f} us at 819GB/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()
