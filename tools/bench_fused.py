"""Compare the fused (Pallas-scoring, hand-batched) engine against the
vmapped XLA engine on the real TPU: tag parity on a realistic batch, then
per-iteration slope for both.

    python tools/bench_fused.py [G]
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
    from pomfret_tpu.kernels.engine_fused import (run_batch_fused,
                                                  run_batch_fused2)
    from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3, pick_bg3

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    batches, n_reads = build_real_gap_batch(G)
    b = batches[0]
    print(f"G={G} R={b.ids.shape[1]} S={b.ids.shape[2]} D={b.D} "
          f"nc_cap={b.nc_cap} backend={jax.default_backend()}", file=sys.stderr)

    args = [jax.device_put(a) for a in batch_args(b, 64)]

    def run_vmap(iters):
        a = list(args)
        a[-1] = jax.device_put(np.full(G, iters, dtype=np.int32))
        return np.asarray(_run_batch_jit(*a, D=b.D, nc_cap=b.nc_cap))

    def run_fused(iters):
        a = list(args)
        a[-1] = jax.device_put(np.int32(iters))
        return np.asarray(run_batch_fused(*a, D=b.D, nc_cap=b.nc_cap, bg=b.bg))

    def run_fused2(iters):
        a = list(args)
        a[-1] = jax.device_put(np.int32(iters))
        return np.asarray(run_batch_fused2(*a, D=b.D, nc_cap=b.nc_cap, bg=b.bg))

    bg3 = pick_bg3(b.D, b.ids.shape[2], b.nc_cap)

    def run_fused3(iters):
        a = list(args)
        a[-1] = jax.device_put(np.full(G, iters, dtype=np.int32))
        return np.asarray(run_batch_fused3(*a, D=b.D, nc_cap=b.nc_cap, bg=bg3))

    # parity at full convergence
    full = 2 * b.ids.shape[1] + 64
    hv = run_vmap(full)
    for name, run in (("fused", run_fused), ("fused2", run_fused2),
                      ("fused3", run_fused3)):
        hf = run(full)
        same = np.array_equal(hv, hf)
        print(f"{name} parity (hp tags, {full} iters): "
              f"{'IDENTICAL' if same else 'MISMATCH'}", file=sys.stderr)
        if not same:
            bad = np.argwhere(hv != hf)
            print(f"  {len(bad)} differing entries; first 10: {bad[:10].tolist()}",
                  file=sys.stderr)
            for g, r in bad[:5]:
                print(f"  gap {g} read {r}: vmap={hv[g, r]} {name}={hf[g, r]}",
                      file=sys.stderr)

    for name, run in (("vmap", run_vmap), ("fused", run_fused),
                      ("fused2", run_fused2), ("fused3", run_fused3)):
        ts = {}
        for iters in (64, 192):
            reps = 3
            t0 = time.time()
            for _ in range(reps):
                run(iters)
            ts[iters] = (time.time() - t0) / reps
        slope = (ts[192] - ts[64]) / 128
        print(f"{name}: 64it {ts[64]*1e3:.1f}ms  192it {ts[192]*1e3:.1f}ms  "
              f"slope {slope*1e6:.1f} us/iter ({slope*1e6/G:.3f} us/lane-iter)",
              file=sys.stderr)




def interleaved(rounds=4):
    """Interleave vmap/v1/v2 timing rounds in one process to defeat the
    tunnel's cross-process variance; prints per-round slopes + medians."""
    import jax
    from bench import build_real_gap_batch
    from pomfret_tpu.parallel.batch import batch_args, _run_batch_jit
    from pomfret_tpu.kernels.engine_fused import run_batch_fused, run_batch_fused2
    from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3, pick_bg3

    G = 128
    batches, _ = build_real_gap_batch(G)
    b = batches[0]
    args = [jax.device_put(a) for a in batch_args(b, 64)]

    def mk(fn, scalar_iters):
        def run(iters):
            a = list(args)
            a[-1] = jax.device_put(np.int32(iters) if scalar_iters
                                   else np.full(G, iters, dtype=np.int32))
            return np.asarray(fn(*a, D=b.D, nc_cap=b.nc_cap))
        return run

    import functools
    bg3 = pick_bg3(b.D, b.ids.shape[2], b.nc_cap)
    runs = {"vmap": mk(_run_batch_jit, False),
            "v1": mk(functools.partial(run_batch_fused, bg=b.bg), True),
            "v2": mk(functools.partial(run_batch_fused2, bg=b.bg), True),
            "v3": mk(functools.partial(run_batch_fused3, bg=bg3), False)}
    for r in runs.values():
        r(4)  # compile+warm
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
    if len(sys.argv) > 1 and sys.argv[1] == "interleaved":
        interleaved()
    else:
        main()
