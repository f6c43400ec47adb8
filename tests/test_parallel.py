"""Batched/sharded engine tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax

from pomfret_tpu.parallel.batch import make_gap_mesh, pack_gap_batch, run_gap_batch
from pomfret_tpu.kernels.engine_jax import run_direction_device


def _rand_gap(rng, R=64, S=96, D=8, n_reads=48):
    from pomfret_tpu.kernels.engine_jax import GapDeviceData
    ids = rng.integers(-1, D, size=(R, S)).astype(np.int32)
    ids[n_reads:, :] = -1
    has_mmr = np.zeros(R, dtype=bool)
    has_mmr[:n_reads] = True
    hp_init = np.full(R, 2, dtype=np.int32)
    hp_init[:16] = rng.integers(0, 2, size=16)
    seed_ok = hp_init <= 1
    perm = np.full(R, -1, dtype=np.int32)
    perm[:n_reads] = np.arange(n_reads)
    return GapDeviceData(ids=ids, has_mmr=has_mmr, hp_init=hp_init,
                         seed_ok=seed_ok, perm=perm,
                         n_reads=n_reads, n_sites=S, max_d=D, q_break=n_reads,
                         min0=0, max0=4)


def test_batch_matches_single():
    rng = np.random.default_rng(0)
    datas = [_rand_gap(rng) for _ in range(6)]
    covs = [4] * 6
    batch = pack_gap_batch(datas, covs, n_cand=8)
    out = run_gap_batch(batch, max_iters=160)
    for g, d in enumerate(datas):
        import jax.numpy as jnp
        hp = np.asarray(run_direction_device(
            jnp.asarray(d.ids), jnp.asarray(d.has_mmr), jnp.asarray(d.hp_init),
            jnp.asarray(d.seed_ok),
            jnp.int32(d.n_reads), jnp.int32(d.n_sites),
            jnp.int32(d.q_break), jnp.int32(d.min0), jnp.int32(d.max0),
            jnp.int32(4), jnp.int32(8), jnp.int32(160),
            D=batch.D, nc_cap=batch.nc_cap))
        assert np.array_equal(out[g], hp), f"gap {g} differs"


def test_mesh_sharded_matches_unsharded():
    assert len(jax.devices()) == 8, "conftest should provide 8 cpu devices"
    rng = np.random.default_rng(1)
    datas = [_rand_gap(rng) for _ in range(16)]
    covs = [4] * 16
    batch = pack_gap_batch(datas, covs, n_cand=8)
    out1 = run_gap_batch(batch, max_iters=160)
    mesh = make_gap_mesh(8)
    out8 = run_gap_batch(batch, mesh=mesh, max_iters=160)
    assert np.array_equal(out1, out8)


def test_mesh_sharded_fused_matches_unsharded(monkeypatch):
    """The shard_map + whole-loop-kernel mesh path (production on TPU pods)
    must equal the unsharded vmap engine; forced on via POMFRET_FORCE_FUSED
    with the kernel in interpret mode on the CPU mesh."""
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    datas = [_rand_gap(rng) for _ in range(16)]
    batch = pack_gap_batch(datas, [4] * 16, n_cand=8, pad_g=64)
    out1 = run_gap_batch(batch, max_iters=160)
    monkeypatch.setenv("POMFRET_FORCE_FUSED", "1")
    mesh = make_gap_mesh(8)
    out8 = run_gap_batch(batch, mesh=mesh, max_iters=160)
    assert np.array_equal(out1, out8)


def test_graft_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (128,)
    ge.dryrun_multichip(8)


def test_pipeline_uses_local_mesh_and_matches_single_device(tmp_path,
                                                            monkeypatch):
    """The PRODUCTION methphase path (run_gaps_batched) must shard its gap
    batches over every local device (VERDICT r1 item 1) and produce outputs
    byte-identical to a single-device run."""
    from pomfret_tpu.cli import main as cli_main
    from pomfret_tpu.parallel import batch as pb
    from pomfret_tpu.testing import make_multi_block_scenario

    d = tmp_path / "mesh"
    d.mkdir()
    bam, vcf, truth = make_multi_block_scenario(str(d), n_blocks=3)
    args = ["-c", "50", "--engine", "jax", "--vcf", vcf, bam]

    p1 = str(d / "mesh8")
    assert cli_main(["methphase", "-o", p1, *args]) == 0
    assert pb.DISPATCH_STATS["n_devices_last"] == 8, \
        "production dispatch did not shard over the 8 local devices"
    assert pb.DISPATCH_STATS["lanes_last"] % 8 == 0

    monkeypatch.setenv("POMFRET_NO_MESH", "1")
    p2 = str(d / "single")
    assert cli_main(["methphase", "-o", p2, *args]) == 0
    assert pb.DISPATCH_STATS["n_devices_last"] == 1
    monkeypatch.delenv("POMFRET_NO_MESH")

    for ext in (".mp.gtf", ".mp.vcf"):
        b1 = open(p1 + ext, "rb").read()
        b2 = open(p2 + ext, "rb").read()
        assert b1 == b2, f"{ext} differs between 8-device mesh and single"


def test_engine_generation_selector(monkeypatch):
    """POMFRET_FUSED_GEN / legacy POMFRET_FUSED_V2 select the right engine."""
    from pomfret_tpu.parallel import batch as B
    rng = np.random.default_rng(7)
    b = pack_gap_batch([_rand_gap(rng) for _ in range(8)], [4] * 8, n_cand=8)
    monkeypatch.setenv("POMFRET_FORCE_FUSED", "1")
    assert B._engine_for(b).func.__name__ == "run_batch_fused3"
    monkeypatch.setenv("POMFRET_FUSED_GEN", "2")
    assert B._engine_for(b).func.__name__ == "run_batch_fused2"
    monkeypatch.setenv("POMFRET_FUSED_GEN", "1")
    assert B._engine_for(b).func.__name__ == "run_batch_fused"
    monkeypatch.delenv("POMFRET_FUSED_GEN")
    monkeypatch.setenv("POMFRET_FUSED_V2", "0")   # legacy: selects v1
    assert B._engine_for(b).func.__name__ == "run_batch_fused"
    monkeypatch.delenv("POMFRET_FUSED_V2")
    assert B._engine_for(b).func.__name__ == "run_batch_fused3"
    monkeypatch.delenv("POMFRET_FORCE_FUSED")
    assert B._engine_for(b).func.__name__ == "_run_batch_jit"


def test_device_failure_falls_back_to_host_oracle(tmp_path, monkeypatch):
    """A terminally failed device dispatch must not abort methphase: the
    group recomputes on the host oracle with identical outputs (elastic
    recovery, SURVEY.md §5.3)."""
    from pomfret_tpu.cli import main as cli_main
    from pomfret_tpu.kernels import engine_jax as ej
    from pomfret_tpu.testing import make_multi_block_scenario

    d = tmp_path / "fallback"
    d.mkdir()
    bam, vcf, truth = make_multi_block_scenario(str(d), n_blocks=3)
    args = ["-c", "50", "--vcf", vcf, bam]

    p_ok = str(d / "ok")
    assert cli_main(["methphase", "-o", p_ok, "--engine", "jax", *args]) == 0

    def boom(*a, **k):
        raise RuntimeError("simulated tunnel death")

    monkeypatch.delenv("POMFRET_NO_HOST_FALLBACK", raising=False)
    monkeypatch.setattr(ej, "run_gap_batch_async", boom, raising=False)
    # run_jobs_batched imports it locally from parallel.batch
    from pomfret_tpu.parallel import batch as pb
    monkeypatch.setattr(pb, "run_gap_batch_async", boom)
    p_fb = str(d / "fb")
    assert cli_main(["methphase", "-o", p_fb, "--engine", "jax", *args]) == 0
    for ext in (".mp.gtf", ".mp.vcf"):
        assert open(p_ok + ext, "rb").read() == open(p_fb + ext, "rb").read()

    # with the escape hatch set, the error propagates instead
    monkeypatch.setenv("POMFRET_NO_HOST_FALLBACK", "1")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated tunnel death"):
        cli_main(["methphase", "-o", str(d / "prop"), "--engine", "jax",
                  *args])
