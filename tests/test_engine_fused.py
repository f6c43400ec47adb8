"""Fused (Pallas-scoring, hand-batched) engine vs the vmapped XLA engine.

The fused core must produce IDENTICAL final hp vectors: its per-site ratio
math is the same f32 expression; only kernel scheduling differs. Runs the
Pallas kernel in interpret mode (CPU backend)."""
import numpy as np
import pytest

from pomfret_tpu.core.methmer import (get_methmer_sites_and_ranges,
                                      store_mmr_of_reads, wipe_mmr_of_reads)
from pomfret_tpu.core.readset import READBACK, MmrConfig, load_reads_given_interval
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import build_gap_device_data, _round_up
from pomfret_tpu.kernels.engine_fused import (BG, run_batch_fused,
                                              run_batch_fused2)
from pomfret_tpu.kernels.engine_fused3 import run_batch_fused3
from pomfret_tpu.parallel.batch import pack_gap_batch, batch_args, _run_batch_jit
from pomfret_tpu.testing import SynthConfig, make_two_block_scenario


@pytest.mark.parametrize("trans,noise", [(False, 0.0), (True, 0.05)])
def test_fused_matches_vmap(tmp_path, trans, noise):
    cfg_s = SynthConfig(noise=noise, nocall=noise, seed=11,
                        ref_len=200_000, read_len=20_000, read_stagger=900)
    bam, vcf, truth = make_two_block_scenario(str(tmp_path), trans=trans,
                                              cfg=cfg_s)
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]
    rs = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    datas = []
    for direction in (0, 1):
        ms = get_methmer_sites_and_ranges(rs, cfg, direction)
        store_mmr_of_reads(rs, ms)
        datas.append(build_gap_device_data(
            rs, ms, direction, _round_up(rs.n, 128), _round_up(ms.n, 128)))
        wipe_mmr_of_reads(rs)
    assert BG % 2 == 0
    batch = pack_gap_batch(datas * (BG // 2), [10] * BG, n_cand=14)
    args = batch_args(batch, 2 * batch.ids.shape[1] + 64)
    hv = np.asarray(_run_batch_jit(*args, D=batch.D, nc_cap=batch.nc_cap))
    hf = np.asarray(run_batch_fused(*args, D=batch.D, nc_cap=batch.nc_cap,
                                    interpret=True))
    assert np.array_equal(hv, hf)
    h2 = np.asarray(run_batch_fused2(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     interpret=True))
    assert np.array_equal(hv, h2)
    h3 = np.asarray(run_batch_fused3(*args, D=batch.D, nc_cap=batch.nc_cap,
                                     bg=BG, interpret=True))
    assert np.array_equal(hv, h3)
    # sanity: the engine actually tagged reads in these lanes
    assert (hv <= 1).sum() > 0
