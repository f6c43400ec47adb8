from pomfret_tpu.core.variants import (HAPTAG_UNPHASED, VAR_OP_D, VAR_OP_I,
                                       VAR_OP_X, Variant, seq_nt4)
from pomfret_tpu.core.varhaptag import (haptag_one_read_with_variants,
                                        parse_variants_for_one_read)
from pomfret_tpu.io.records import make_record


def mk(seq, cigar, md, pos=100):
    return make_record("q", 0, pos, seq, cigar, tags=[("MD", "Z", md)])


def test_md_snp():
    r = mk("ACGTACGTAC", [("M", 10)], "4A5")
    vs = parse_variants_for_one_read(r)
    assert len(vs) == 1
    v = vs[0]
    assert (v.pos, v.op, v.length) == (104, VAR_OP_X, 1)
    assert v.chars == seq_nt4("A")  # read base at self_pos 4


def test_md_adjacent_snps():
    r = mk("ACGTACGTAC", [("M", 10)], "4GT4")
    vs = parse_variants_for_one_read(r)
    assert [(v.pos, v.op) for v in vs] == [(104, VAR_OP_X), (105, VAR_OP_X)]
    assert vs[0].chars == seq_nt4("A")
    assert vs[1].chars == seq_nt4("C")


def test_md_deletion():
    r = mk("ACGTACGTAC", [("M", 4), ("D", 2), ("M", 6)], "4^AC6")
    vs = parse_variants_for_one_read(r)
    assert len(vs) == 1
    v = vs[0]
    assert (v.pos, v.op, v.length) == (104, VAR_OP_D, 2)
    assert v.chars == seq_nt4("AC")


def test_md_del_at_end_dropped():
    # pending deletion at end of MD never flushes (reference quirk)
    r = mk("ACGTACGTAC", [("M", 10), ("D", 2)], "10^AC")
    vs = parse_variants_for_one_read(r)
    assert vs == []


def test_cigar_insertion_recorded():
    r = mk("ACGTTTACGTAC", [("M", 4), ("I", 2), ("M", 6)], "10")
    vs = parse_variants_for_one_read(r)
    assert len(vs) == 1
    v = vs[0]
    assert (v.pos, v.op, v.length) == (104, VAR_OP_I, 2)
    assert v.chars == seq_nt4("TT")


def test_md_snp_right_after_insertion_reads_inserted_base():
    # strict '>' in the insertion-skip: the SNP base comes from the inserted
    # sequence (reference quirk, blockjoin.c:1631-1635)
    r = mk("ACGTTTACGTAC", [("M", 4), ("I", 2), ("M", 6)], "4G5")
    vs = parse_variants_for_one_read(r)
    snps = [v for v in vs if v.op == VAR_OP_X]
    assert len(snps) == 1
    assert snps[0].pos == 104
    assert snps[0].chars == seq_nt4("T")  # inserted base, not seq[6]


def test_md_with_leading_softclip():
    r = mk("ACGTACGTAC", [("S", 3), ("M", 7)], "3G3")
    vs = parse_variants_for_one_read(r)
    assert len(vs) == 1
    assert vs[0].pos == 103
    assert vs[0].chars == seq_nt4(("ACGTACGTAC")[6])


def _kv(pos, alt, hp):
    return Variant(pos, VAR_OP_X, 1, seq_nt4(alt), hp)


def test_vote_alt_and_ref():
    known = [_kv(100, "C", 0), _kv(200, "G", 1), _kv(300, "T", 0)]
    read_vars = [Variant(100, VAR_OP_X, 1, seq_nt4("C"), HAPTAG_UNPHASED),
                 Variant(300, VAR_OP_X, 1, seq_nt4("A"), HAPTAG_UNPHASED)]
    # ALT match at 100 -> vote hap 0^1=1; absent at 200 -> REF vote hap 1;
    # mismatching ALT at 300 -> no vote. (but 300 also skips REF vote)
    tag = haptag_one_read_with_variants(known, read_vars, 50, 350, [0])
    assert tag == 1


def test_vote_deletion_explains_absence():
    known = [_kv(200, "G", 1)]
    read_vars = [Variant(195, VAR_OP_D, 10, seq_nt4("ACGTACGTAC"), HAPTAG_UNPHASED),
                 Variant(210, VAR_OP_X, 1, seq_nt4("A"), HAPTAG_UNPHASED)]
    # REF vote at 200 suppressed by the covering deletion -> 0 votes -> unphased
    tag = haptag_one_read_with_variants(known, read_vars, 50, 350, [0])
    assert tag == HAPTAG_UNPHASED


def test_vote_end_of_interval_ignores_deletion():
    # reference quirk: when the known variant is the LAST piggyback entry, the
    # REF vote is cast without the deletion look-back (blockjoin.c:1757-1761)
    known = [_kv(200, "G", 1)]
    read_vars = [Variant(195, VAR_OP_D, 10, seq_nt4("ACGTACGTAC"), HAPTAG_UNPHASED)]
    tag = haptag_one_read_with_variants(known, read_vars, 50, 350, [0])
    assert tag == 1


def test_vote_ambiguity_rules():
    # 5 vs 4 with both >3 and ratio<5 -> unphased
    known = [_kv(100 + i * 10, "C", 0) for i in range(5)] + \
            [_kv(300 + i * 10, "C", 1) for i in range(4)]
    tag = haptag_one_read_with_variants(known, [], 50, 500, [0])
    assert tag == HAPTAG_UNPHASED
    # 1 vs 0 -> hap0
    tag2 = haptag_one_read_with_variants([_kv(100, "C", 0)], [], 50, 500, [0])
    assert tag2 == 0
    # strong override: 20 vs 4 ratio=5 >= 5 -> majority wins
    known3 = [_kv(100 + i * 10, "C", 0) for i in range(20)] + \
             [_kv(700 + i * 10, "C", 1) for i in range(4)]
    tag3 = haptag_one_read_with_variants(known3, [], 50, 1000, [0])
    assert tag3 == 0


def test_vote_indel_match():
    known = [Variant(150, VAR_OP_I, 2, seq_nt4("AT"), 1)]
    rv_match = [Variant(150, VAR_OP_I, 2, seq_nt4("AT"), HAPTAG_UNPHASED)]
    assert haptag_one_read_with_variants(known, rv_match, 50, 400, [0]) == 0
    rv_diff = [Variant(150, VAR_OP_I, 2, seq_nt4("AA"), HAPTAG_UNPHASED)]
    # mismatch -> no ALT vote; and no REF vote either (position present)
    assert haptag_one_read_with_variants(known, rv_diff, 50, 400, [0]) == HAPTAG_UNPHASED


def test_range_restriction():
    known = [_kv(100, "C", 0), _kv(900, "C", 1)]
    # read spans only 50-200: variant at 900 out of range -> one REF vote hap0
    assert haptag_one_read_with_variants(known, [], 50, 200, [0]) == 0
