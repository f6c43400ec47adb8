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


def test_tag_map_pack_merge_roundtrip():
    from pomfret_tpu.parallel.distributed import (_merge_packed_tag_maps,
                                                  _pack_tag_map)
    m0 = {"readA": 0, "readB": 1, "shared": 0}
    m1 = {"readC": 1, "shared": 1}
    b0, t0 = _pack_tag_map(m0)
    b1, t1 = _pack_tag_map(m1)
    merged = _merge_packed_tag_maps([b0, b1], [t0, t1])
    assert merged == {"readA": 0, "readB": 1, "readC": 1, "shared": 0}
    # first process wins on conflicts (blockjoin.c:4579-4595)
    assert merged["shared"] == 0
    # empty maps are fine
    be, te = _pack_tag_map({})
    assert _merge_packed_tag_maps([be, b1], [te, t1]) == m1


def test_tag_map_merge_scales_to_a_million_tags():
    """WGS-scale merge (VERDICT r1 item 6a): >=1e6 tags across simulated
    hosts must pack, transport-shape, and merge without memory blowup —
    the packed form is ~bytes(names)+4B/tag, not a JSON blob."""
    import time
    from pomfret_tpu.parallel.distributed import (_merge_packed_tag_maps,
                                                  _pack_tag_map)
    P, per = 4, 275_000
    packed = []
    for p in range(P):
        m = {f"m64012_220{p}_{i:07d}/ccs": (i + p) & 1 for i in range(per)}
        packed.append(_pack_tag_map(m))
    total_bytes = sum(len(b) + 4 * len(t) for b, t in packed)
    assert total_bytes < 50 << 20, "packed form unexpectedly large"
    t0 = time.time()
    merged = _merge_packed_tag_maps([b for b, _ in packed],
                                    [t for _, t in packed])
    dt = time.time() - t0
    assert len(merged) == P * per
    assert merged["m64012_2200_0000007/ccs"] == 1
    assert dt < 30, f"million-tag merge took {dt:.1f}s"


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
