import gzip

from pomfret_tpu.core.intervals import (
    FlipLookup, Ranges, Storage, UnphasedLookup, check_if_in_dropped_intervals,
    generate_new_phase_blocks, get_new_phaseblock_id, lift_decisions,
    make_decisions_flippings_onraw, merge_close_intervals, store_raw_intervals,
)
from pomfret_tpu.io.intervals_loader import IS_GTF, IS_TSV, IS_VCF, load_intervals_from_file


def _vcf_line(chrom, pos, ps, gt="0|1"):
    return f"{chrom}\t{pos}\t.\tA\tC\t50\tPASS\t.\tGT:PS\t{gt}:{ps}"


def _write(path, lines, gz=False):
    data = "\n".join(lines) + "\n"
    if gz:
        with gzip.open(path, "wt") as f:
            f.write(data)
    else:
        with open(path, "w") as f:
            f.write(data)


VCF_HEADER = [
    "##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsample",
]


def test_vcf_gap_extraction(tmp_path):
    p = str(tmp_path / "a.vcf")
    lines = VCF_HEADER + [
        _vcf_line("chr1", 100, 100),
        _vcf_line("chr1", 150, 100),
        _vcf_line("chr1", 220, "."),      # PS '.' skipped, state untouched
        _vcf_line("chr1", 300, 300),      # new block: gap (150, 300)
        _vcf_line("chr1", 400, 300),
        _vcf_line("chr1", 900, 900),      # gap (400, 900)
        # second chromosome: abs_start stays 0 (global prev_group_ID quirk)
        _vcf_line("chr2", 50, 50),
        _vcf_line("chr2", 80, 50),
        _vcf_line("chr2", 500, 500),      # gap (80, 500)
    ]
    _write(p, lines)
    st = Storage()
    load_intervals_from_file(p, IS_VCF, st)
    assert st.ref_names == ["chr1", "chr2"]
    r1, r2 = st.ranges
    assert r1.abs_start == 100
    assert r1.starts == [150, 400]
    assert r1.ends == [300, 900]
    assert r1.abs_end == 900
    assert r2.abs_start == 0   # quirk preserved
    assert r2.starts == [80]
    assert r2.ends == [500]
    assert r2.abs_end == 500


def test_vcf_gzip_and_variant_collection(tmp_path):
    p = str(tmp_path / "a.vcf.gz")
    lines = VCF_HEADER + [
        "chr1\t100\t.\tA\tC\t50\tPASS\t.\tGT:PS\t0|1:100",
        "chr1\t120\t.\tAT\tA\t50\tPASS\t.\tGT:PS\t1|0:100",   # DEL
        "chr1\t140\t.\tA\tACC\t50\tPASS\t.\tGT:PS\t0|1:100",  # INS
        "chr1\t160\t.\tA\tC\t50\tPASS\t.\tGT:PS\t0/1:100",    # unphased: skip
        "chr1\t180\t.\tAG\tCT\t50\tPASS\t.\tGT:PS\t0|1:100",  # MNP: skip
    ]
    _write(p, lines, gz=True)
    st = Storage()
    collected = {}

    def cb(chrom, variants):
        collected[chrom] = list(variants)

    load_intervals_from_file(p, IS_VCF, st, load_vcf_variants_too=True, haptag_callback=cb)
    assert st.stores_raw_tag
    vs = collected["chr1"]
    assert len(vs) == 3
    snp, dele, ins = vs
    assert (snp.pos, snp.op, snp.length, snp.chars, snp.haptag) == (99, 1, 1, (1,), 0)
    assert (dele.pos, dele.op, dele.length, dele.chars, dele.haptag) == (120, 3, 1, (3,), 1)
    assert (ins.pos, ins.op, ins.length, ins.chars, ins.haptag) == (139, 2, 2, (1, 1), 0)


def test_gtf_tsv_loading(tmp_path):
    g = str(tmp_path / "a.gtf")
    _write(g, [
        'chr1\tPhasing\texon\t100\t200\t.\t+\t.\tgene_id "100";',
        'chr1\tPhasing\texon\t500\t800\t.\t+\t.\tgene_id "500";',
        'chr2\tPhasing\texon\t10\t20\t.\t+\t.\tgene_id "10";',
    ])
    st = Storage()
    load_intervals_from_file(g, IS_GTF, st)
    assert st.ranges[0].abs_start == 100
    assert st.ranges[0].starts == [200]
    assert st.ranges[0].ends == [500]
    assert st.ranges[0].abs_end == 800
    assert st.ranges[1].abs_start == 10  # GTF resets per-chromosome (asymmetry vs VCF)
    assert st.ranges[1].abs_end == 20

    t = str(tmp_path / "a.tsv")
    _write(t, ["chr1\t100\t200", "chr1\t500\t800"])
    st2 = Storage()
    load_intervals_from_file(t, IS_TSV, st2)
    assert st2.ranges[0].starts == [200]
    assert st2.ranges[0].ends == [500]


def _mk_ranges():
    rg = Ranges(abs_start=50, abs_end=2000)
    rg.starts = [100, 300, 1000, 1300]
    rg.ends = [200, 400, 1100, 1400]
    rg.decisions = [-1, -1, -1, -1]
    return rg


def test_merge_and_lift_flow():
    rg = _mk_ranges()
    store_raw_intervals(rg)
    merge_close_intervals(rg, 150)
    assert rg.starts == [100, 1000, 1300]
    assert rg.ends == [400, 1100, 1400]
    assert rg.dropped == [(200, 300)]
    assert len(rg.decisions) == 4  # pre-merge length retained
    assert rg.rawunphasedblocks == [[100, 200], [300, 400], [1000, 1100], [1300, 1400]]

    st = Storage(ref_names=["chr1"], ranges=[rg])
    # merged gap 0 joins cis (0): collapses raw gaps 0+1; gap1 no-join; gap2 trans
    rg.decisions[0] = 0
    rg.decisions[1] = -1
    rg.decisions[2] = 1
    lift_decisions(st)
    assert rg.rawunphasedblocks == [[100, 400], [1000, 1100], [1300, 1400]]
    assert rg.decisions_onraw == [0, -1, 1]
    make_decisions_flippings_onraw(st)
    assert rg.flips_onraw == [0, 0, 1]
    generate_new_phase_blocks(st, use_raw=True)
    # non-joined gaps split blocks: gap (1000,1100) only. Reference quirk:
    # the trailing block starts at the LAST non-joined gap's START (not end),
    # blockjoin.c:2354-2357.
    assert rg.phaseblocks == [(50, 1000), (1000, 2000)]

    assert get_new_phaseblock_id(rg, 999) == 50
    assert get_new_phaseblock_id(rg, 1000) == 1000  # strict <: trailing block wins
    assert get_new_phaseblock_id(rg, 1150) == 1000
    assert check_if_in_dropped_intervals(rg, 250)
    assert not check_if_in_dropped_intervals(rg, 350)

    fl = FlipLookup()
    assert fl.get(rg, 60) == 0        # before first gap
    assert fl.get(rg, 500) == 0       # after joined cis gap: flip 0
    fl2 = FlipLookup()
    assert fl2.get(rg, 1200) == 0     # between gap1(end 1100) and gap2 start
    assert fl2.get(rg, 1500) == 1     # after the trans gap
    fl3 = FlipLookup()
    assert fl3.get(rg, 1350) == 1     # inside the trans gap: falls through to last flip


def test_all_no_join_keeps_blocks():
    rg = _mk_ranges()
    store_raw_intervals(rg)
    merge_close_intervals(rg, 50)  # nothing merges
    st = Storage(ref_names=["chr1"], ranges=[rg])
    lift_decisions(st)
    assert rg.decisions_onraw == [-1, -1, -1, -1]
    make_decisions_flippings_onraw(st)
    generate_new_phase_blocks(st, use_raw=True)
    # trailing-block-starts-at-gap-start quirk again
    assert rg.phaseblocks == [(50, 100), (200, 300), (400, 1000), (1100, 1300), (1300, 2000)]


def test_unphased_lookup():
    rg = _mk_ranges()
    ul = UnphasedLookup()
    ok, upd = ul.check(rg, 250)   # between gap0 end(200) and gap1 start(300)
    assert ok and not upd         # j == prev(1)
    ok, upd = ul.check(rg, 1200)  # between gap2 end(1100) and gap3 start(1300)
    assert ok and upd
    ok, _ = ul.check(rg, 1350)    # inside a gap
    assert not ok
