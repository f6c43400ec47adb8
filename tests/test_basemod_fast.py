"""Differential test: vectorized single-item 'C+m' fast path vs the general
MM decode, over real synthetic reads (both strands, noise, nocalls)."""
import pomfret_tpu.io.basemod as B
from pomfret_tpu.testing import SynthConfig, SynthRegion


def test_fast_path_matches_general(monkeypatch):
    sr = SynthRegion(SynthConfig(ref_len=60_000, read_len=16_000,
                                 read_stagger=1500, noise=0.1, nocall=0.1,
                                 frac_reverse=0.5, seed=11))
    recs = sr.make_reads(tagged=True, region=(0, 60_000))
    assert len(recs) > 20
    n_checked = 0
    for rec in recs:
        fast = B._extract_cpg_fast(rec, 100, 156)
        assert fast is not None  # generator emits single-item C+m tags
        orig = B.extract_cpg_5mc_calls
        monkeypatch.setattr(B, "_extract_cpg_fast", lambda *a: None)
        general = B.extract_cpg_5mc_calls(rec, 100, 156)
        monkeypatch.undo()
        assert fast == general, rec.qname
        n_checked += 1
    assert n_checked == len(recs)
