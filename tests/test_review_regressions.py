"""Regression tests for review findings."""
import numpy as np

from pomfret_tpu.core.methmer import Methmers, store_mmr_of_reads
from pomfret_tpu.core.readset import MmrConfig, Read, ReadSet


def test_methmer_overflow_clamped():
    """The i>1 dedup quirk can triple-emit on a duplicated bwd start grid;
    the C writes out of bounds (UB) — we clamp to the site array."""
    ms = Methmers(config=MmrConfig(), n=2,
                  sites_real_poss=np.array([1000, 1200], dtype=np.uint32),
                  sites_starts=np.array([1000, 1000], dtype=np.uint32),
                  mmr_lens=np.array([2, 1], dtype=np.uint8))
    rd = Read(i=0, qname="q", hp=0, strand=0, length=20000,
              start_pos=900, end_pos=1300,
              calls=np.array([1000, 1200], dtype=np.uint32),
              quals=np.array([0, 1], dtype=np.uint8))
    rs = ReadSet(ref_start=900, ref_end=1300, reads=[rd])
    store_mmr_of_reads(rs, ms)
    assert rd.mmr_start_i + rd.mmr_n <= ms.n  # no out-of-bounds inserts


def test_weird_hp_tag_device_matches_host(tmp_path):
    """HP:i:5 (hp=4, 4&3==0) must not seed count tables in either engine
    (the reference tests the RAW haptag at insert time, blockjoin.c:3796)."""
    from pomfret_tpu.core.engine_host import haplotag_region
    from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
    from pomfret_tpu.core.readset import READBACK, load_reads_given_interval
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.kernels.engine_jax import run_gap_jax
    from pomfret_tpu.testing import make_two_block_scenario, SynthConfig

    def hp_label_fn(start, hap):
        # a scattering of absurd HP values among normal ones
        return 5 if (start // 700) % 7 == 0 else hap + 1

    import pomfret_tpu.testing as T
    cfg = SynthConfig(seed=13)
    sr = T.SynthRegion(cfg)
    b1, b2 = (5_000, 80_000), (120_000, 195_000)
    snp = []
    for lo, hi in (b1, b2):
        p = lo
        while p < hi:
            for q in range(p, min(p + 200, cfg.ref_len)):
                if sr.ref[q] == "A":
                    snp.append(q)
                    break
            p += 2_000
    sr.add_snps(snp, [i % 2 for i in range(len(snp))])
    recs = sr.make_reads(tagged=True, hp_label_fn=hp_label_fn)
    import os
    bam = os.path.join(str(tmp_path), "weird.bam")
    sr.write_bam(bam, recs)
    b1v = [p for p in snp if b1[0] <= p < b1[1]]
    b2v = [p for p in snp if b2[0] <= p < b2[1]]
    gap = (b1v[-1] + 1, b2v[0] + 1)

    bamr = BamReader(bam)
    mc = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    rs_h = load_reads_given_interval(bamr, "chr1", gap[0], gap[1], READBACK, mc)
    dec_h = haplotag_region(rs_h,
                            get_methmer_sites_and_ranges(rs_h, mc, 0),
                            get_methmer_sites_and_ranges(rs_h, mc, 1), 14, 10)
    rs_j = load_reads_given_interval(bamr, "chr1", gap[0], gap[1], READBACK, mc)
    dec_j = run_gap_jax(rs_j,
                        get_methmer_sites_and_ranges(rs_j, mc, 0),
                        get_methmer_sites_and_ranges(rs_j, mc, 1), 14, 10)
    assert dec_h == dec_j
    assert [r.hp for r in rs_h.reads] == [r.hp for r in rs_j.reads]
