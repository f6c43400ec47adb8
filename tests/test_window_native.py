"""Parity tests for the native one-call window loader (bam_window_load).

The C++ fast path in io/native must produce a ReadSet identical to the pure
Python loader (load_reads_given_interval with POMFRET_NO_NATIVE_WINDOW=1) on
realistic windows and on crafted edge cases: fallback MM shapes, tag-type
variants, filters, and region-boundary semantics.
"""
import os

import numpy as np
import pytest

from pomfret_tpu.io import native
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.io.bam_writer import BamWriter
from pomfret_tpu.io.records import make_record
from pomfret_tpu.core.readset import (READBACK, MmrConfig,
                                      load_reads_given_interval)
from pomfret_tpu.testing import make_two_block_scenario

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native lib unavailable")


def _snap(rs):
    return {
        "reads": [(r.qname, r.hp, r.strand, r.length, r.start_pos, r.end_pos,
                   r.calls.tolist(), r.quals.tolist()) for r in rs.reads],
        "ids_left": rs.ids_left, "ids_left_strict": rs.ids_left_strict,
        "ids_right": rs.ids_right, "ids_right_strict": rs.ids_right_strict,
        "rev_order": rs.rev_order,
        "ref_start": rs.ref_start, "ref_end": rs.ref_end,
    }


def _both(bam_path, chrom, s, e, cfg, raw=None):
    bamr = BamReader(bam_path)
    os.environ["POMFRET_NO_NATIVE_WINDOW"] = "1"
    try:
        py = _snap(load_reads_given_interval(bamr, chrom, s, e, READBACK, cfg, raw))
    finally:
        del os.environ["POMFRET_NO_NATIVE_WINDOW"]
    nat = _snap(load_reads_given_interval(bamr, chrom, s, e, READBACK, cfg, raw))
    return py, nat


def test_window_parity_realistic(tmp_path):
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]
    py, nat = _both(bam, "chr1", gs, ge, cfg)
    assert py == nat
    assert len(py["reads"]) > 100
    # a second, offset window exercising different chunk spans
    py2, nat2 = _both(bam, "chr1", gs - 7000, ge + 9000, cfg)
    assert py2 == nat2
    # unknown chromosome -> empty on both paths
    py3, nat3 = _both(bam, "chrMissing", gs, ge, cfg)
    assert py3 == nat3
    assert py3["reads"] == []


def test_window_parity_raw_tag_override(tmp_path):
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]
    # raw-haptag override path (-u): every read unphased except a few
    rd = BamReader(bam)
    names = [rec.qname for rec in rd.fetch_all()]
    raw = {qn: i % 2 for i, qn in enumerate(names[:50])}
    py, nat = _both(bam, "chr1", gs, ge, cfg, raw)
    assert py == nat


def _edge_bam(path):
    """Crafted single-chrom BAM with filter & fallback edge cases.

    32 long-enough filler reads straddle the left boundary so the <15
    per-hap coverage gate (blockjoin.c:1161-1163) keeps the window alive.
    """
    recs = []
    seq40 = "ACGCGTACGCGTACGCGTACGCGTACGCGTACGCGTACGC"  # CpGs throughout
    for i in range(32):
        recs.append(make_record(
            f"fill{i}", 0, 500 + i, seq40, [("M", 40)],
            flag=16 if i % 4 == 0 else 0, mapq=60,
            tags=[("HP", "C", (i % 2) + 1), ("MM", "Z", "C+m.,0,0;"),
                  ("ML", "B:C", [250, 250])]))
    pos = 600
    mk = lambda qn, **kw: make_record(qn, 0, pos, seq40, [("M", 40)], **kw)
    # tag-type variants for HP / de
    recs.append(mk("hp_s", mapq=60, tags=[("HP", "s", 2), ("MM", "Z", "C+m,1;"),
                                          ("ML", "B:C", [200])]))
    recs.append(mk("hp_zero", mapq=60, tags=[("HP", "C", 0), ("MM", "Z", "C+m,1;"),
                                             ("ML", "B:C", [200])]))
    recs.append(mk("hp_absent", mapq=60, tags=[("MM", "Z", "C+m,1;"),
                                               ("ML", "B:C", [200])]))
    recs.append(mk("de_ok", mapq=60, tags=[("de", "f", 0.05), ("HP", "C", 1),
                                           ("MM", "Z", "C+m,1;"), ("ML", "B:C", [200])]))
    recs.append(mk("de_bad", mapq=60, tags=[("de", "f", 0.5), ("HP", "C", 1),
                                            ("MM", "Z", "C+m,1;"), ("ML", "B:C", [200])]))
    # fallback MM shapes: multi-item, ChEBI, minus-strand item, multi-code
    recs.append(mk("fb_multi", mapq=60,
                   tags=[("MM", "Z", "C+m,1;A+a,0;"), ("ML", "B:C", [200, 9])]))
    recs.append(mk("fb_chebi", mapq=60,
                   tags=[("MM", "Z", "C+27551,1;"), ("ML", "B:C", [200])]))
    recs.append(mk("fb_minus", mapq=60,
                   tags=[("MM", "Z", "C-m,1;"), ("ML", "B:C", [200])]))
    recs.append(mk("fb_multicode", mapq=60,
                   tags=[("MM", "Z", "C+mh,1;"), ("ML", "B:C", [200, 100])]))
    # lowercase tag names; missing ML; empty MM; no MM at all
    recs.append(mk("mm_lower", mapq=60, tags=[("Mm", "Z", "C+m,1;"),
                                              ("Ml", "B:C", [200])]))
    recs.append(mk("ml_missing", mapq=60, tags=[("MM", "Z", "C+m,1,0;")]))
    recs.append(mk("mm_empty", mapq=60, tags=[("MM", "Z", "")]))
    recs.append(mk("mm_none", mapq=60, tags=[("HP", "C", 1)]))
    # filters: mapq, flags
    recs.append(mk("mapq_low", mapq=3, tags=[("MM", "Z", "C+m,1;"), ("ML", "B:C", [200])]))
    recs.append(mk("secondary", flag=256, mapq=60,
                   tags=[("MM", "Z", "C+m,1;"), ("ML", "B:C", [200])]))
    recs.append(mk("supp", flag=2048, mapq=60,
                   tags=[("MM", "Z", "C+m,1;"), ("ML", "B:C", [200])]))
    # reverse strand with calls; implicit-mode read (non-CpG call)
    recs.append(make_record("rev1", 0, pos + 1, seq40, [("M", 40)], flag=16,
                            mapq=60, tags=[("MM", "Z", "C+m.,0,1;"),
                                           ("ML", "B:C", [250, 10])]))
    recs.append(make_record(
        "implicit1", 0, pos + 2, "ACTTTTTTCGTTTTTTTTTT", [("M", 20)], mapq=60,
        tags=[("MM", "Z", "C+m,0,0;"), ("ML", "B:C", [250, 250])]))
    # soft clips + indels around the window edge
    recs.append(make_record("clip1", 0, pos + 3, seq40,
                            [("S", 4), ("M", 20), ("I", 3), ("M", 8), ("D", 6), ("M", 5)],
                            mapq=60, tags=[("MM", "Z", "C+m.,0,0,0;"),
                                           ("ML", "B:C", [250, 10, 200])]))
    # a far-right read that only overlaps via endpos (deletion-extended)
    recs.append(make_record("span_end", 0, 2000, seq40, [("M", 40)], mapq=60,
                            tags=[("MM", "Z", "C+m,0;"), ("ML", "B:C", [250])]))
    recs.sort(key=lambda r: r.pos)
    with BamWriter(path, ["c1"], [100000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=1)


def test_window_parity_edge_cases(tmp_path):
    p = str(tmp_path / "edge.bam")
    _edge_bam(p)
    cfg = MmrConfig(readlen_threshold=10, min_mapq=10,
                    cov_for_selection=1, cov_for_runtime=2)
    py, nat = _both(p, "c1", 620, 640, cfg)
    assert py == nat
    names = [r[0] for r in nat["reads"]]
    # fallback shapes decoded via the Python oracle are present + identical
    assert "fb_minus" in names and "fb_multi" in names
    # filters applied: excluded reads
    for gone in ("de_bad", "mapq_low", "secondary", "supp", "mm_none", "mm_empty"):
        assert gone not in names, gone
    # HP semantics: type variants, zero, absent
    by = {r[0]: r for r in nat["reads"]}
    assert by["hp_s"][1] == 1        # HP:s:2 -> hap 1
    assert by["hp_zero"][1] == 254   # HP=0 -> HAPTAG_UNPHASED
    assert by["hp_absent"][1] == 254


def test_window_parity_coverage_gate(tmp_path):
    """Fewer than 15 left reads per hap wipes the ReadSet on both paths."""
    p = str(tmp_path / "thin.bam")
    seq = "ACGCGTACGCGTACGCGTAC"
    recs = [make_record(f"r{i}", 0, 100 + i, seq, [("M", 20)], mapq=60,
                        tags=[("HP", "C", (i % 2) + 1), ("MM", "Z", "C+m,0;"),
                              ("ML", "B:C", [250])])
            for i in range(8)]
    with BamWriter(p, ["c1"], [10000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=1)
    cfg = MmrConfig(readlen_threshold=10, min_mapq=10)
    py, nat = _both(p, "c1", 150, 160, cfg)
    assert py == nat
    assert nat["reads"] == []


def test_window_duplicate_qname_raises(tmp_path):
    p = str(tmp_path / "dup.bam")
    seq = "ACGCGTACGCGTACGCGTAC"
    recs = [make_record("same", 0, 100 + i, seq, [("M", 20)], mapq=60,
                        tags=[("MM", "Z", "C+m,0;"), ("ML", "B:C", [250])])
            for i in range(2)]
    with BamWriter(p, ["c1"], [10000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=1)
    cfg = MmrConfig(readlen_threshold=10, min_mapq=10)
    bamr = BamReader(p)
    with pytest.raises(ValueError, match="duplicated read name"):
        load_reads_given_interval(bamr, "c1", 105, 110, READBACK, cfg)


# --------------------------------------------------------- methmer extract

def test_mmr_extract_native_fuzz():
    """The batch C++ walk (mmr_extract_reads) must equal the Python walk on
    random site grids (incl. bwd-style duplicate runs) and random reads."""
    from pomfret_tpu.core.methmer import Methmers, _get_mmr_of_read_walk
    from pomfret_tpu.core.readset import MmrConfig, Read, UINT32_MAX

    rng = np.random.default_rng(1234)
    for trial in range(300):
        n_sites = int(rng.integers(2, 40))
        pos = np.sort(rng.choice(np.arange(100, 100000, 7), size=n_sites,
                                 replace=False)).astype(np.uint32)
        starts = pos.copy()
        for i in range(1, n_sites):
            if rng.random() < 0.3:
                starts[i] = starts[i - 1]
        starts = np.maximum.accumulate(starts)
        if trial % 2 == 0:
            starts = pos  # fwd grid
        lens = rng.integers(1, 6, size=n_sites).astype(np.uint8)
        ms = Methmers(config=MmrConfig(), n=n_sites, sites_real_poss=pos,
                      sites_starts=starts, mmr_lens=lens)
        reads = []
        for i in range(int(rng.integers(1, 6))):
            grid = np.unique(starts)
            k = rng.integers(2, max(3, len(grid)))
            sel = np.sort(rng.choice(grid, size=min(k, len(grid)), replace=False))
            extra = rng.choice(np.arange(50, 110000, 13), size=3, replace=False)
            calls = np.unique(np.concatenate([sel, extra])).astype(np.uint32)
            quals = rng.integers(0, 3, size=len(calls)).astype(np.uint8)
            reads.append(Read(i=i, qname=f"r{i}", hp=0, strand=0, length=20000,
                              start_pos=int(calls[0]), end_pos=int(calls[-1]) + 1,
                              calls=calls, quals=quals))
        calls_cat = np.concatenate([r.calls for r in reads])
        quals_cat = np.concatenate([r.quals for r in reads])
        call_n = np.asarray([len(r.calls) for r in reads], dtype=np.int32)
        call_off = np.zeros(len(reads), dtype=np.int64)
        np.cumsum(call_n[:-1], out=call_off[1:])
        res = native.mmr_extract_reads(starts, lens, calls_cat, quals_cat,
                                       call_off, call_n)
        assert res is not None
        for j, r in enumerate(reads):
            mers, start = _get_mmr_of_read_walk(r, ms)
            # apply the storage clamp the native path folds in
            if start != UINT32_MAX and start + len(mers) > n_sites:
                mers = mers[: n_sites - start]
                if not mers:
                    start = UINT32_MAX
            o, nm = int(res["off"][j]), int(res["n"][j])
            got = res["mers"][o : o + nm].tolist()
            got_start = int(res["start_i"][j])
            if start == UINT32_MAX:
                assert nm == 0, (trial, j)
            else:
                assert got == mers and got_start == start, (trial, j)


def test_store_mmr_native_matches_python(tmp_path):
    from pomfret_tpu.core.methmer import (get_methmer_sites_and_ranges,
                                          store_mmr_of_reads, wipe_mmr_of_reads)
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]
    rs = load_reads_given_interval(BamReader(bam), "chr1", gs, ge, READBACK, cfg)
    for direction in (0, 1):
        ms = get_methmer_sites_and_ranges(rs, cfg, direction)
        os.environ["POMFRET_NO_NATIVE_MMR"] = "1"
        try:
            store_mmr_of_reads(rs, ms)
            py = [(r.mmr_n, r.mmr_start_i,
                   r.mmr.tolist() if r.mmr is not None else None)
                  for r in rs.reads]
        finally:
            del os.environ["POMFRET_NO_NATIVE_MMR"]
        wipe_mmr_of_reads(rs)
        store_mmr_of_reads(rs, ms)
        nat = [(r.mmr_n, r.mmr_start_i,
                r.mmr.tolist() if r.mmr is not None else None)
               for r in rs.reads]
        wipe_mmr_of_reads(rs)
        assert py == nat
        assert sum(1 for t in nat if t[0] > 0) > 100


# ------------------------------------------------------------- varhaptag

def _vh_both(bam_path, chrom, variants):
    from pomfret_tpu.core.varhaptag import pre_haplotagging_read_in_one_ref
    rd = BamReader(bam_path)
    os.environ["POMFRET_NO_NATIVE_VARHAPTAG"] = "1"
    try:
        py = {}
        pre_haplotagging_read_in_one_ref(rd, chrom, variants, py)
    finally:
        del os.environ["POMFRET_NO_NATIVE_VARHAPTAG"]
    nat = {}
    pre_haplotagging_read_in_one_ref(rd, chrom, variants, nat)
    return py, nat


def test_varhaptag_native_matches_python(tmp_path):
    from pomfret_tpu.io.intervals_loader import load_intervals_from_file, IS_VCF
    from pomfret_tpu.core.intervals import Storage
    bam, vcf, truth = make_two_block_scenario(str(tmp_path), tagged=False)
    st = Storage()
    vbc = {}
    load_intervals_from_file(vcf, IS_VCF, st, load_vcf_variants_too=True,
                             haptag_callback=lambda c, v: vbc.__setitem__(c, v))
    py, nat = _vh_both(bam, "chr1", vbc["chr1"])
    assert py == nat
    assert len(py) > 400
    assert sum(1 for v in py.values() if v in (0, 1)) > 300


def test_varhaptag_native_edges(tmp_path):
    """Invalid-MD reads fall back to the Python oracle; missing MD raises on
    both paths; secondary/supplementary reads are skipped."""
    from pomfret_tpu.core.variants import Variant, VAR_OP_X
    p = str(tmp_path / "vh.bam")
    seq = "ACGTACGTACGTACGTACGT"
    recs = [
        make_record("r_snp", 0, 100, seq, [("M", 20)], mapq=60,
                    tags=[("MD", "Z", "5A14")]),
        make_record("r_del", 0, 130, seq, [("M", 10), ("D", 3), ("M", 10)],
                    mapq=60, tags=[("MD", "Z", "10^GCA10")]),
        make_record("r_ins", 0, 160, seq, [("M", 8), ("I", 4), ("M", 8)],
                    mapq=60, tags=[("MD", "Z", "16")]),
        make_record("r_badmd", 0, 190, seq, [("M", 20)], mapq=60,
                    tags=[("MD", "Z", "5?14")]),       # invalid char -> oracle
        make_record("r_sec", 0, 200, seq, [("M", 20)], flag=256, mapq=60,
                    tags=[("MD", "Z", "20")]),
        make_record("r_clip", 0, 220, seq, [("S", 3), ("M", 14), ("S", 3)],
                    mapq=60, tags=[("MD", "Z", "2C11")]),
    ]
    with BamWriter(p, ["c1"], [10000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=1)
    kv = [Variant(105, VAR_OP_X, 1, (0,), 0),   # SNP A at 105, REF=hap0
          Variant(133, VAR_OP_X, 1, (2,), 1),
          Variant(222, VAR_OP_X, 1, (1,), 0)]
    # invalid MD raises identically through both paths? No: the Python oracle
    # raises on the INVALID char; the native path routes r_badmd to the same
    # oracle, so both raise.
    with pytest.raises(ValueError):
        _vh_both(p, "c1", kv)

    # drop the bad read: full parity, secondary excluded
    recs2 = [r for r in recs if r.qname != "r_badmd"]
    p2 = str(tmp_path / "vh2.bam")
    with BamWriter(p2, ["c1"], [10000], keep_index_info=True) as w:
        for r in recs2:
            w.write(r)
    w.build_index(n_ref=1)
    py, nat = _vh_both(p2, "c1", kv)
    assert py == nat
    assert "r_sec" not in nat
    assert set(nat) == {"r_snp", "r_del", "r_ins", "r_clip"}


def test_varhaptag_native_missing_md_raises(tmp_path):
    p = str(tmp_path / "vh3.bam")
    recs = [make_record("no_md", 0, 100, "ACGTACGTAC", [("M", 10)], mapq=60,
                        tags=[("HP", "C", 1)])]
    with BamWriter(p, ["c1"], [10000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=1)
    from pomfret_tpu.core.varhaptag import pre_haplotagging_read_in_one_ref
    from pomfret_tpu.core.variants import Variant, VAR_OP_X
    kv = [Variant(105, VAR_OP_X, 1, (0,), 0)]
    with pytest.raises(ValueError, match="lacks MD tag"):
        pre_haplotagging_read_in_one_ref(BamReader(p), "c1", kv, {})


def test_chrom_source_matches_per_window_loads(tmp_path):
    """ChromReadSource (whole-chromosome segmented decode, sliced per gap)
    must produce ReadSets identical to load_reads_given_interval for every
    window — incl. boundary classification, HP semantics, the coverage
    gate, raw-tag overrides and small-segment boundaries."""
    from pomfret_tpu.core.readset import ChromReadSource
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    bamr = BamReader(bam)
    gs, ge = truth["gap"]
    # small segments force many segment boundaries across the 200 kb region
    src = ChromReadSource(bamr, "chr1", cfg, seg_len=13_000)
    assert src.ok
    windows = [(gs, ge), (gs - 7000, ge + 9000), (100, 9000),
               (180_000, 199_000), (0, 200_000)]
    for s, e in windows:
        direct = _snap(load_reads_given_interval(bamr, "chr1", s, e,
                                                 READBACK, cfg))
        sliced = _snap(src.window(s, e, READBACK))
        assert direct == sliced, f"window {s}-{e} differs"
    # raw-tag override path
    raw = {r[0]: i % 3 for i, r in enumerate(
        _snap(load_reads_given_interval(bamr, "chr1", gs, ge, READBACK,
                                        cfg))["reads"])}
    d = _snap(load_reads_given_interval(bamr, "chr1", gs, ge, READBACK,
                                        cfg, raw))
    s_ = _snap(src.window(gs, ge, READBACK, raw))
    assert d == s_
    # unknown chromosome -> ok source with empty windows
    src2 = ChromReadSource(bamr, "chrMissing", cfg)
    assert src2.ok
    assert _snap(src2.window(gs, ge, READBACK))["reads"] == []


def test_pipeline_chrom_scan_end_to_end(tmp_path):
    """Forcing POMFRET_CHROM_SCAN=1 through the batched jax pipeline gives
    identical decisions/tags to the per-window loads."""
    import jax
    from pomfret_tpu.pipeline import CliOpt, main_blockjoin
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    outs = []
    for tag, env in (("scan", "1"), ("win", None)):
        if env:
            os.environ["POMFRET_CHROM_SCAN"] = env
        else:
            os.environ.pop("POMFRET_CHROM_SCAN", None)
            os.environ["POMFRET_NO_CHROM_SCAN"] = "1"
        try:
            opt = CliOpt(fn_vcf=vcf, fn_bam=bam, cov=50,
                         output_prefix=str(tmp_path / f"o_{tag}"),
                         engine="jax")
            main_blockjoin(opt)
        finally:
            os.environ.pop("POMFRET_CHROM_SCAN", None)
            os.environ.pop("POMFRET_NO_CHROM_SCAN", None)
        outs.append((open(str(tmp_path / f"o_{tag}") + ".mp.gtf").read(),
                     open(str(tmp_path / f"o_{tag}") + ".mp.vcf").read()))
    assert outs[0] == outs[1]


def test_mer_grid_fill_matches_numpy_fuzz():
    """The C++ dense mer-id grid (per-site linear dictionary in
    first-appearance order) must equal the numpy lexsort construction,
    including duplicate (row, site) writes and the int8/overflow gate."""
    import random
    from pomfret_tpu.kernels.engine_jax import _grid_from_arrays
    rng = random.Random(99)
    for trial in range(40):
        n_reads = rng.randint(1, 40)
        S = rng.randint(1, 60)
        R = n_reads + rng.randint(0, 8)
        SP = S + rng.randint(0, 16)
        perm = list(range(n_reads))
        rng.shuffle(perm)
        inv_perm = np.empty(n_reads, dtype=np.int64)
        for dev_row, orig in enumerate(perm):
            inv_perm[orig] = dev_row
        rows, lens, starts, mers = [], [], [], []
        for r in range(n_reads):
            if rng.random() < 0.3:
                continue
            ln = rng.randint(1, min(S, 12))
            st = rng.randint(0, S - ln)
            rows.append(r)
            lens.append(ln)
            starts.append(st)
            mers.extend(rng.randint(0, 6) for _ in range(ln))
        rows = np.asarray(rows, dtype=np.int64)
        lens = np.asarray(lens, dtype=np.int64)
        starts = np.asarray(starts, dtype=np.int64)
        mers_a = np.asarray(mers, dtype=np.uint32)
        offs = np.zeros(len(rows), dtype=np.int64)
        if len(rows) > 1:
            np.cumsum(lens[:-1], out=offs[1:])
        ids_np, has_np, d_np = _grid_from_arrays(
            rows, lens, starts, mers_a, inv_perm, R, SP)
        res = native.mer_grid_fill(rows, lens, starts, offs, mers_a,
                                   inv_perm, R, SP)
        assert res is not None
        ids_c, has_c, d_c = res
        assert d_c == d_np, trial
        assert np.array_equal(has_c, has_np), trial
        assert np.array_equal(ids_c.astype(np.int32),
                              ids_np.astype(np.int32)), trial


def test_chrom_source_regions_union(tmp_path):
    """regions= (window-union) mode: a source limited to the merged halos
    of a SPARSE window set (the WGS shape the round-3 50%-of-chromosome
    gate never served) yields windows identical to per-window loads, and
    duplicate decode across touching regions is suppressed."""
    from pomfret_tpu.core.readset import ChromReadSource
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    bamr = BamReader(bam)
    gs, ge = truth["gap"]
    windows = [(gs, ge), (10_000, 15_000), (170_000, 176_000)]
    halos = sorted((max(s - READBACK - 1, 0), e + READBACK)
                   for s, e in windows)
    regions = []
    for lo, hi in halos:
        if regions and lo <= regions[-1][1]:
            regions[-1][1] = max(regions[-1][1], hi)
        else:
            regions.append([lo, hi])
    src = ChromReadSource(bamr, "chr1", cfg, seg_len=13_000,
                          regions=regions)
    assert src.ok
    # no record decoded twice
    assert len(set(zip(src.pos.tolist(), src.qnames))) == len(src.pos)
    assert np.all(np.diff(src.pos) >= 0)
    for s, e in windows:
        direct = _snap(load_reads_given_interval(bamr, "chr1", s, e,
                                                 READBACK, cfg))
        sliced = _snap(src.window(s, e, READBACK))
        assert direct == sliced, f"window {s}-{e} differs (regions mode)"
