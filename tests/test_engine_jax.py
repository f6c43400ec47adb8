"""Device engine (kernels.engine_jax) vs host oracle equivalence."""
import tempfile

import numpy as np
import pytest

from pomfret_tpu.core.engine_host import haplotag_region
from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
from pomfret_tpu.core.readset import READBACK, MmrConfig, load_reads_given_interval
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import run_gap_jax
from pomfret_tpu.testing import SynthConfig, make_two_block_scenario


def _run_both(tmpdir, trans, synth_cfg):
    bam, vcf, truth = make_two_block_scenario(tmpdir, trans=trans, cfg=synth_cfg)
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]

    rs_h = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    f_h = get_methmer_sites_and_ranges(rs_h, cfg, 0)
    b_h = get_methmer_sites_and_ranges(rs_h, cfg, 1)
    dec_h = haplotag_region(rs_h, f_h, b_h, 14, 10)

    rs_j = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    f_j = get_methmer_sites_and_ranges(rs_j, cfg, 0)
    b_j = get_methmer_sites_and_ranges(rs_j, cfg, 1)
    dec_j = run_gap_jax(rs_j, f_j, b_j, 14, 10)

    tags_h = [r.hp for r in rs_h.reads]
    tags_j = [r.hp for r in rs_j.reads]
    return dec_h, dec_j, tags_h, tags_j, truth


@pytest.mark.parametrize("trans,seed,noise", [
    (False, 0, 0.0),
    (True, 1, 0.0),
    (False, 3, 0.03),
    (True, 7, 0.05),
])
def test_device_matches_host(tmp_path, trans, seed, noise):
    synth_cfg = SynthConfig(noise=noise, nocall=noise, seed=seed,
                            ref_len=120_000, read_len=16_000, read_stagger=900)
    # shrink blocks to the smaller region
    import pomfret_tpu.testing as T
    dec_h, dec_j, tags_h, tags_j, truth = _run_both(
        str(tmp_path), trans, synth_cfg) if synth_cfg.ref_len >= 200_000 else \
        _run_both_small(str(tmp_path), trans, synth_cfg)
    assert dec_h == dec_j
    assert tags_h == tags_j


def _run_both_small(tmpdir, trans, synth_cfg):
    # make_two_block_scenario hardcodes 200kb blocks; use the full-size one
    synth_cfg.ref_len = 200_000
    synth_cfg.read_len = 20_000
    synth_cfg.read_stagger = 900
    return _run_both(tmpdir, trans, synth_cfg)
