"""Build the reference pomfret binary against the htslib shim.

Compiles the READ-ONLY reference sources (/root/reference/blockjoin.c,
cli.c, main.c, kthread.c, kstring.c — exactly the Makefile:11 list) in
place, linking our from-scratch htslib shim (parity/htslib_shim) plus real
zlib/pthread/libm, into .parity_build/pomfret_ref. The reference tree is
never modified or copied; only object files and the binary land in the
(gitignored) build directory.

Usage: python parity/build_ref.py [--ref-dir /root/reference]
Returns the binary path on stdout; exits non-zero on failure.
"""
from __future__ import annotations

import os
import subprocess
import sys

REF_DIR = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, ".parity_build")
SHIM = os.path.join(REPO, "parity", "htslib_shim")
REF_SOURCES = ["blockjoin.c", "cli.c", "main.c", "kthread.c", "kstring.c"]


def build(ref_dir: str = REF_DIR, quiet: bool = False) -> str:
    os.makedirs(BUILD, exist_ok=True)
    binary = os.path.join(BUILD, "pomfret_ref")
    srcs = [os.path.join(ref_dir, s) for s in REF_SOURCES]
    shim_src = os.path.join(SHIM, "shim.cpp")
    deps = srcs + [shim_src,
                   os.path.join(SHIM, "htslib", "sam.h")]
    if os.path.exists(binary) and all(
            os.path.getmtime(binary) >= os.path.getmtime(p) for p in deps):
        return binary

    shim_obj = os.path.join(BUILD, "shim.o")
    cmds = [
        ["g++", "-std=c++17", "-O2", "-g", "-fno-strict-aliasing",
         "-I", SHIM, "-c", shim_src, "-o", shim_obj],
        # the reference compiles with -O2 -Wall (Makefile:13); warnings are
        # the reference's own business, so don't pass -Werror
        # -fcommon: cli.h holds a tentative definition of cliopt_verbose in
        # every TU (the reference's Makefile era defaulted to -fcommon)
        ["gcc", "-std=gnu99", "-O2", "-g", "-fcommon",
         "-I", SHIM, "-I", ref_dir,
         *srcs, shim_obj, "-o", binary,
         "-lz", "-lm", "-lpthread", "-lstdc++"],
    ]
    for cmd in cmds:
        r = subprocess.run(cmd, capture_output=True, text=True)
        if r.returncode != 0:
            if not quiet:
                sys.stderr.write(" ".join(cmd) + "\n" + r.stderr[-8000:] + "\n")
            raise RuntimeError(f"reference build failed: {cmd[0]}")
    return binary


if __name__ == "__main__":
    ref = REF_DIR
    if len(sys.argv) > 2 and sys.argv[1] == "--ref-dir":
        ref = sys.argv[2]
    print(build(ref))
