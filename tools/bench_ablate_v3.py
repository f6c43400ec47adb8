"""Ablate the v3 whole-loop kernel: block size, cids dtype, exits.

Edit the `runs` dict to pick variants; mk3(bg, ablate, cid8) builds one
(ablate: 'nodma' skips row DMAs, 'nofill' skips in-loop refills, '+noexit'
neutralizes convergence so slopes stay comparable — see run_batch_fused3).
v2 at its production bg rides the same interleaved rounds for reference.

Usage: python tools/bench_ablate_v3.py [rounds]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from bench import build_real_gap_batch
    from pomfret_tpu.parallel.batch import batch_args
    from pomfret_tpu.kernels.engine_fused import run_batch_fused2
    from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    G = 128
    batches, _ = build_real_gap_batch(G)
    b = batches[0]
    print(f"G={G} R={b.ids.shape[1]} S={b.ids.shape[2]} D={b.D} "
          f"nc_cap={b.nc_cap} v2bg={b.bg} backend={jax.default_backend()}",
          file=sys.stderr)
    args = [jax.device_put(a) for a in batch_args(b, 64)]

    def mk3(bg, ablate="", cid8=False):
        def run(iters):
            a = list(args)
            a[-1] = jax.device_put(np.full(G, iters, dtype=np.int32))
            return np.asarray(run_batch_fused3(
                *a, D=b.D, nc_cap=b.nc_cap, bg=bg, cid8=cid8,
                ablate=ablate))
        return run

    def mk2():
        def run(iters):
            a = list(args)
            a[-1] = jax.device_put(np.int32(iters))
            return np.asarray(run_batch_fused2(*a, D=b.D, nc_cap=b.nc_cap,
                                               bg=b.bg))
        return run

    runs = {
        "v2": mk2(),
        "v3_bg32": mk3(32),
        "v3_bg32i8": mk3(32, cid8=True),
        "noexit32": mk3(32, "noexit"),
    }
    if os.environ.get("ABLATE_BG64"):
        runs["v3_bg64"] = mk3(64)
        runs["v3_bg64i8"] = mk3(64, cid8=True)
    for k in list(runs):
        try:
            runs[k](4)
        except Exception as e:
            print(f"{k}: compile/run FAILED "
                  f"{type(e).__name__} {str(e).splitlines()[0][:120]}",
                  file=sys.stderr)
            del runs[k]
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
        print(f"{k}: median slope {med:.1f} us/iter "
              f"(min {min(slopes[k]):.1f})", file=sys.stderr)


if __name__ == "__main__":
    main()
