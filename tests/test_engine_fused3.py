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


def test_fused3_zero_max_iters(tmp_path):
    datas = _one_gap_data(tmp_path)
    batch = pack_gap_batch(datas, [10] * 2, n_cand=14, pad_g=8)
    args = list(batch_args(batch, 0))
    hv = np.asarray(_run_batch_jit(*args, D=batch.D, nc_cap=batch.nc_cap))
    h3 = np.asarray(run_batch_fused3(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=8, interpret=True))
    assert np.array_equal(hv, h3)
