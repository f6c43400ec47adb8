"""Two-process jax.distributed test over localhost (CPU backend).

Validates the multi-host merge primitives: gap assignment partitions, and
allgather of decisions/tag-maps reconstructs the single-host result.
"""
import json
import os
import subprocess
import sys
import textwrap

import pytest

from pomfret_tpu.parallel.distributed import assign_gaps

WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    from pomfret_tpu.parallel.distributed import assign_gaps, allgather_decisions, allgather_tag_maps
    N = 10
    mine = assign_gaps(N, nproc, pid)
    local_dec = {i: (i % 3) - 1 for i in mine}
    dec = allgather_decisions(local_dec, N)
    local_tags = {f"read{i}_{j}": pid for i in mine for j in range(3)}
    tags = allgather_tag_maps(local_tags)
    out = {"pid": pid, "dec": dec.tolist(), "n_tags": len(tags),
           "tag_sample": tags.get("read0_0")}
    print("RESULT " + json.dumps(out))
""")


def test_assign_gaps_partitions():
    a = assign_gaps(10, 2, 0)
    b = assign_gaps(10, 2, 1)
    assert sorted(a + b) == list(range(10))
    assert not (set(a) & set(b))


@pytest.mark.slow
def test_two_process_allgather(tmp_path):
    port = str(20000 + (os.getpid() % 20000))
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo"
    procs = [subprocess.Popen([sys.executable, script, str(pid), "2", port],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.split("RESULT ")[1]))
    expect = [(i % 3) - 1 for i in range(10)]
    for o in outs:
        assert o["dec"] == expect
        assert o["n_tags"] == 30
        assert o["tag_sample"] == 0  # process 0 owns gap 0; first-wins
