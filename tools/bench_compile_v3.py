"""Time Mosaic compilation of v3 kernel variants to find the compile hog.

Each variant is lowered+compiled once at the e2e shape (G=64, R=512,
S=1408). Different ablate strings are different programs, so the persistent
cache cannot cross-serve them; a fresh S offset per run of this script
dodges stale same-program entries.

Usage: python tools/bench_compile_v3.py [S_offset]
"""
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3_core
    from pomfret_tpu.kernels.engine_fused import run_batch_fused2_core

    off = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    G, R, S, D, NC = 64, 512, 1408 + 128 * off, 4, 16
    ids = jnp.zeros((G, R, S), jnp.int8)
    hm = jnp.ones((G, R), bool)
    hp = jnp.full((G, R), 2, jnp.int32)
    sok = jnp.zeros((G, R), bool)
    vec = jnp.full((G,), 10, jnp.int32)
    args = (ids, hm, hp, sok, vec, vec, vec, vec, vec, vec, vec, vec)

    def timed(name, fn):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t1 = time.time()
        lowered.compile()
        print(f"{name}: trace+lower {t1-t0:.1f}s  compile {time.time()-t1:.1f}s",
              file=sys.stderr, flush=True)

    timed("v2", functools.partial(run_batch_fused2_core, D=D, nc_cap=NC,
                                  bg=32))
    for ab in ("", "nofill", "nodma", "noexit"):
        timed(f"v3[{ab or 'full'}]",
              functools.partial(run_batch_fused3_core, D=D, nc_cap=NC,
                                bg=32, ablate=ab))


if __name__ == "__main__":
    main()
