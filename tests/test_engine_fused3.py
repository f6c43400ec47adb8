"""v3 (whole-loop-in-kernel) engine edge cases vs the vmapped XLA engine.

test_engine_fused.py covers realistic clean/noisy batches; here: padded
dead lanes, tiny candidate budgets, and lanes whose loop never activates.
Interpret mode on the CPU backend."""
import numpy as np

from pomfret_tpu.core.methmer import (get_methmer_sites_and_ranges,
                                      store_mmr_of_reads, wipe_mmr_of_reads)
from pomfret_tpu.core.readset import (READBACK, MmrConfig,
                                      load_reads_given_interval)
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import build_gap_device_data, _round_up
from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3
from pomfret_tpu.parallel.batch import (pack_gap_batch, batch_args,
                                        _run_batch_jit)
from pomfret_tpu.testing import SynthConfig, make_two_block_scenario


def _one_gap_data(tmp_path, **kw):
    cfg_s = SynthConfig(seed=5, ref_len=160_000, read_len=18_000,
                        read_stagger=1100, **kw)
    bam, vcf, truth = make_two_block_scenario(str(tmp_path), cfg=cfg_s)
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]
    rs = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    out = []
    for direction in (0, 1):
        ms = get_methmer_sites_and_ranges(rs, cfg, direction)
        store_mmr_of_reads(rs, ms)
        out.append(build_gap_device_data(
            rs, ms, direction, _round_up(rs.n, 128), _round_up(ms.n, 128)))
        wipe_mmr_of_reads(rs)
    return out


def test_fused3_padded_lanes_and_small_ncand(tmp_path):
    datas = _one_gap_data(tmp_path)
    # pad G=8 real+dead lanes: pack 3 datas into pad_g=8 -> 5 inactive lanes
    batch = pack_gap_batch(datas + datas[:1], [10] * 4, n_cand=3, pad_g=8)
    args = batch_args(batch, 2 * batch.ids.shape[1] + 64)
    hv = np.asarray(_run_batch_jit(*args, D=batch.D, nc_cap=batch.nc_cap))
    h3 = np.asarray(run_batch_fused3(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=8, interpret=True))
    assert np.array_equal(hv, h3)
    assert (hv[:4] <= 1).sum() > 0
    # dead lanes stay fully untagged
    assert (hv[4:] == 2).all()
    # optional int8-resident candidate tiles (cid8 halves the cids scratch;
    # production uses int32 — measured slightly faster at bg=32)
    h3b = np.asarray(run_batch_fused3(*args, D=batch.D, nc_cap=batch.nc_cap,
                                      bg=8, cid8=True, interpret=True))
    assert np.array_equal(hv, h3b)


def test_fused3_fuzz_random_shapes():
    """Randomized parity sweep vs the vmapped engine: odd D, nc_cap ==
    n_cand, empty lanes, all-seeded lanes, tiny R/S — interpret mode."""
    rng = np.random.default_rng(42)
    for trial in range(8):
        G = 8
        R = int(rng.integers(2, 7)) * 16
        S = int(rng.integers(1, 5)) * 32
        D = int(rng.choice([4, 8, 16]))
        n_cand = int(rng.integers(2, 17))
        nc_cap = ((n_cand + 15) // 16) * 16
        ids = rng.integers(-1, D, size=(G, R, S)).astype(np.int8)
        has_mmr = rng.random((G, R)) < 0.9
        ids[~has_mmr] = -1
        hp_init = np.full((G, R), 2, np.int32)
        n_seed = int(rng.integers(4, 12))
        hp_init[:, :n_seed] = rng.integers(0, 2, size=(G, n_seed))
        seed_ok = hp_init <= 1
        n_reads = rng.integers(0, R + 1, size=G).astype(np.int32)
        n_reads[0] = 0                       # dead lane
        n_reads[1] = R                       # full lane
        n_sites = rng.integers(1, S + 1, size=G).astype(np.int32)
        q_break = n_reads.copy()
        min0 = np.minimum(rng.integers(0, 4, size=G), n_sites - 1).astype(np.int32)
        max0 = np.minimum(min0 + rng.integers(0, 8, size=G),
                          n_sites - 1).astype(np.int32)
        cov = rng.integers(1, 6, size=G).astype(np.int32)
        args = (ids, has_mmr, hp_init, seed_ok, n_reads, n_sites, q_break,
                min0, max0, cov, np.full(G, n_cand, np.int32),
                np.full(G, 2 * R + 16, np.int32))
        hv = np.asarray(_run_batch_jit(*args, D=D, nc_cap=nc_cap))
        h3 = np.asarray(run_batch_fused3(*args, D=D, nc_cap=nc_cap, bg=8,
                                         interpret=True))
        assert np.array_equal(hv, h3), \
            f"trial {trial}: R={R} S={S} D={D} n_cand={n_cand}"


def test_fused3_zero_max_iters(tmp_path):
    datas = _one_gap_data(tmp_path)
    batch = pack_gap_batch(datas, [10] * 2, n_cand=14, pad_g=8)
    args = list(batch_args(batch, 0))
    hv = np.asarray(_run_batch_jit(*args, D=batch.D, nc_cap=batch.nc_cap))
    h3 = np.asarray(run_batch_fused3(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=8, interpret=True))
    assert np.array_equal(hv, h3)


def test_pick_bg3_vmem_compile_probe_fallback(monkeypatch):
    """A Mosaic scoped-VMEM failure lowers the learned per-shape lane-block
    cap (lower_bg_cap) and pick_bg3 honors it thereafter; the cap bottoms
    out at 8 lanes (VERDICT r1 weak item 6)."""
    from pomfret_tpu.kernels import engine_fused3 as f3
    from pomfret_tpu.parallel.batch import _is_vmem_error

    monkeypatch.setattr(f3.jax, "default_backend", lambda: "tpu")
    f3._BG_CAP.clear()
    try:
        bg0 = f3.pick_bg3(4, 1536, 16, R=512)
        assert bg0 == 32, "anchor configuration should pick the full block"
        assert f3.lower_bg_cap(4, 1536, 16, 512)
        assert f3.pick_bg3(4, 1536, 16, R=512) == bg0 // 2
        # other shapes are unaffected
        assert f3.pick_bg3(4, 256, 16, R=512) == 32
        while f3.lower_bg_cap(4, 1536, 16, 512):
            pass
        # round 4: exhausting the cap at the 8-lane Pallas floor
        # DISABLES v3 for the shape (0 -> vmapped XLA body) instead of
        # failing forever (BENCH_SCALE=5's dense (R=1792, D=8, NC=64)
        # windows overflow even at bg=8)
        assert f3.pick_bg3(4, 1536, 16, R=512) == 0
        assert not f3.lower_bg_cap(4, 1536, 16, 512)
    finally:
        f3._BG_CAP.clear()

    assert _is_vmem_error(RuntimeError(
        "Mosaic failed: Ran out of memory in scoped vmem"))
    assert _is_vmem_error(RuntimeError("exceeded VMEM limit"))
    assert not _is_vmem_error(RuntimeError("shape mismatch"))
