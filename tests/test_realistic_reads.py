"""E2E with realistic read shapes: soft clips + CpG-neutral indels on both
strands; the join must still be found and decode must agree across engines."""
import os

import numpy as np
import pytest

from pomfret_tpu.core.engine_host import haplotag_region
from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
from pomfret_tpu.core.readset import READBACK, MmrConfig, load_reads_given_interval
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import run_gap_jax
from pomfret_tpu.testing import SynthConfig, SynthRegion


def _two_block_messy(tmpdir, trans=False):
    import pomfret_tpu.testing as T
    cfg = SynthConfig(noise=0.03, nocall=0.03, seed=5)
    sr = SynthRegion(cfg)
    b1, b2 = (5_000, 80_000), (120_000, 195_000)
    snp_pos = []
    for lo, hi in (b1, b2):
        p = lo
        while p < hi:
            for q in range(p, min(p + 200, cfg.ref_len)):
                if sr.ref[q] == "A":
                    snp_pos.append(q)
                    break
            p += 2_000
    sr.add_snps(snp_pos, [i % 2 for i in range(len(snp_pos))])
    recs = sr.make_reads(tagged=True, frac_clipped=0.4, frac_indel=0.5)
    bam = os.path.join(tmpdir, "messy.bam")
    sr.write_bam(bam, recs)
    block1 = [p for p in snp_pos if b1[0] <= p < b1[1]]
    block2 = [p for p in snp_pos if b2[0] <= p < b2[1]]
    return bam, (block1[-1] + 1, block2[0] + 1), sr


def test_messy_reads_decode_and_join(tmp_path):
    bam, gap, sr = _two_block_messy(str(tmp_path))
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    rs = load_reads_given_interval(bamr, "chr1", gap[0], gap[1], READBACK, cfg)
    assert rs.n > 300
    # decode sanity: every call lands on a known CpG site
    site_set = set(sr.cpg_sites)
    for r in rs.reads[:50]:
        assert all(int(c) in site_set for c in r.calls), r.qname
    ms_f = get_methmer_sites_and_ranges(rs, cfg, 0)
    ms_b = get_methmer_sites_and_ranges(rs, cfg, 1)
    dec_h = haplotag_region(rs, ms_f, ms_b, 14, 10)
    assert dec_h == 0  # cis join despite clips/indels
    tags_h = [r.hp for r in rs.reads]

    rs2 = load_reads_given_interval(bamr, "chr1", gap[0], gap[1], READBACK, cfg)
    dec_j = run_gap_jax(rs2,
                        get_methmer_sites_and_ranges(rs2, cfg, 0),
                        get_methmer_sites_and_ranges(rs2, cfg, 1), 14, 10)
    assert dec_j == dec_h
    assert [r.hp for r in rs2.reads] == tags_h


def test_messy_reads_varhaptag(tmp_path):
    from pomfret_tpu.core.varhaptag import pre_haplotagging_read_in_one_ref
    from pomfret_tpu.core.variants import variant_from_vcf_fields
    bam, gap, sr = _two_block_messy(str(tmp_path))
    bamr = BamReader(bam)
    known = []
    for pos, ref, alt, hap_alt in sr.snps:
        a0, a1 = (1, 0) if hap_alt == 0 else (0, 1)
        cols = ["chr1", str(pos + 1), ".", ref, alt, "60", "PASS", ".",
                "GT:PS", f"{a0}|{a1}:100"]
        v = variant_from_vcf_fields(cols)
        assert v is not None
        known.append(v)
    tags = {}
    pre_haplotagging_read_in_one_ref(bamr, "chr1", known, tags)
    wrong = sum(1 for qn, hp in tags.items()
                if hp in (0, 1) and hp != int(qn.split("_")[1]))
    tagged = sum(1 for hp in tags.values() if hp in (0, 1))
    assert tagged > 0.7 * len(tags)
    assert wrong == 0  # MD/CIGAR voting correct through clips and indels
