"""Device-vs-host equivalence across methmer parameter space (k, k_span,
qual thresholds) — guards the engine against config-dependent regressions."""
import pytest

from pomfret_tpu.core.engine_host import haplotag_region
from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
from pomfret_tpu.core.readset import READBACK, MmrConfig, load_reads_given_interval
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import run_gap_jax
from pomfret_tpu.testing import SynthConfig, make_two_block_scenario


@pytest.mark.parametrize("k,k_span,lo,hi", [
    (1, 5000, 100, 156),
    (7, 2000, 100, 156),
    (3, 500, 128, 129),   # aggressive span + tight qual band
])
def test_params_device_matches_host(tmp_path, k, k_span, lo, hi):
    bam, vcf, truth = make_two_block_scenario(
        str(tmp_path), cfg=SynthConfig(noise=0.04, nocall=0.04, seed=k))
    bamr = BamReader(bam)
    cfg = MmrConfig(k=k, k_span=k_span, lo=lo, hi=hi,
                    cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]

    rs_h = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    dec_h = haplotag_region(rs_h,
                            get_methmer_sites_and_ranges(rs_h, cfg, 0),
                            get_methmer_sites_and_ranges(rs_h, cfg, 1), 14, 10)

    rs_j = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    dec_j = run_gap_jax(rs_j,
                        get_methmer_sites_and_ranges(rs_j, cfg, 0),
                        get_methmer_sites_and_ranges(rs_j, cfg, 1), 14, 10)
    assert dec_h == dec_j
    assert [r.hp for r in rs_h.reads] == [r.hp for r in rs_j.reads]
