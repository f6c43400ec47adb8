"""C++ native IO fast-path tests (vs the pure-Python implementations)."""
import os

import numpy as np
import pytest

from pomfret_tpu.io import native
from pomfret_tpu.io.bgzf import BgzfReader, BgzfWriter, BGZF_EOF
from pomfret_tpu.io.bam import BamReader, bam_endpos
from pomfret_tpu.io.bam_writer import BamWriter
from pomfret_tpu.io.records import make_record

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native lib unavailable")


def test_bgzf_inflate_matches_python(tmp_path):
    p = str(tmp_path / "x.bgzf")
    payload = os.urandom(500000) + b"tail"
    with BgzfWriter(p, threads=2) as w:
        w.write(payload)
    comp = open(p, "rb").read()
    out = native.bgzf_inflate_all(comp, n_threads=4)
    assert out == payload


def test_bgzf_deflate_roundtrip(tmp_path):
    payload = os.urandom(300000)
    comp = native.bgzf_deflate_all(payload, n_threads=4)
    assert comp is not None
    p = str(tmp_path / "y.bgzf")
    with open(p, "wb") as f:
        f.write(comp + BGZF_EOF)
    assert BgzfReader(p).read_all() == payload


def test_bam_scan_matches_python(tmp_path):
    p = str(tmp_path / "t.bam")
    recs = []
    for i in range(40):
        recs.append(make_record(
            f"r{i}", i % 2, 100 + i * 37, "ACGTACGTAC",
            [("M", 5), ("D", 3), ("M", 5)] if i % 2 else [("M", 10)],
            flag=16 if i % 3 == 0 else 0, mapq=10 + i % 50,
            tags=[("HP", "i", (i % 2) + 1), ("de", "f", 0.01 * (i % 5)),
                  ("MD", "Z", "10"), ("xx", "Z", "junk")]))
    with BamWriter(p, ["c1", "c2"], [100000, 100000], keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    rd = BamReader(p)
    buf = rd._bgzf.read_all()
    start = rd._data_voffset  # header written+flushed -> block boundary
    # translate virtual offset to plain offset in the decompressed stream
    # (header blocks were fully flushed, so coffset maps via block sizes)
    offs, sizes = rd._bgzf.block_offsets()
    plain = dict(zip(offs, np.concatenate([[0], np.cumsum(sizes)[:-1]])))
    start_plain = plain[start >> 16] + (start & 0xFFFF)
    cols = native.bam_scan(buf, int(start_plain))
    assert cols is not None
    assert len(cols["pos"]) == len(recs)
    got = list(rd.fetch_all())
    for i, rec in enumerate(got):
        assert cols["refID"][i] == rec.refID
        assert cols["pos"][i] == rec.pos
        assert cols["flag"][i] == rec.flag
        assert cols["mapq"][i] == rec.mapq
        assert cols["l_seq"][i] == rec.l_seq
        assert cols["endpos"][i] == bam_endpos(rec)
        assert cols["hp"][i] == rec.get_tag("HP")
        assert abs(cols["de"][i] - rec.get_tag("de")) < 1e-6


def test_meth_decode_read_native_matches_python(tmp_path):
    """The C++ meth decoder must reproduce the Python oracle exactly on
    every read of a realistic window (softclips, indels, rev strand,
    implicit-mode MM) and on crafted edge cases."""
    import numpy as np
    from pomfret_tpu.io import native
    from pomfret_tpu.io import basemod
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.io.records import make_record
    from pomfret_tpu.testing import make_two_block_scenario

    if not native.native_available():
        import pytest
        pytest.skip("native lib unavailable")

    def python_oracle(rec, lo, hi):
        poss, quals, imp = basemod.extract_cpg_5mc_calls(rec, lo, hi)
        if not poss:
            return [], [], imp
        seq = rec.seq() if imp else None
        calls, cq = basemod.lift_mod_positions_to_ref(
            rec.cigar, rec.pos, 1 if rec.is_reverse else 0,
            list(poss), list(quals), seq, rec.l_seq)
        return calls, cq, imp

    def run_native(rec, lo, hi):
        mm = rec.get_tag("MM") or rec.get_tag("Mm")
        ml = rec.get_tag("ML") or rec.get_tag("Ml")
        return native.meth_decode_read(
            rec.seq_packed, rec.l_seq, 1 if rec.is_reverse else 0, mm,
            ml[1] if ml else None, rec.cigar, rec.pos, lo, hi)

    def check(rec, lo=100, hi=156):
        got = run_native(rec, lo, hi)
        assert got is not None, rec.qname
        exp_calls, exp_quals, exp_imp = python_oracle(rec, lo, hi)
        # the C (and native) path stores positions as uint32; normalize
        exp_u32 = [c & 0xFFFFFFFF for c in exp_calls]
        assert got[0].tolist() == exp_u32, rec.qname
        assert got[1].tolist() == list(exp_quals), rec.qname
        assert got[2] == exp_imp, rec.qname

    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    n = 0
    for rec in BamReader(bam).fetch_all():
        if rec.get_tag("MM"):
            check(rec)
            n += 1
    assert n > 100

    # crafted edges: leading softclip with trigger at clip boundary,
    # deletions/insertions around triggers, implicit mode ('.'), missing ML,
    # rev strand, trigger at M-op boundary, no-delta MM
    edges = [
        ("ACGTACGTAC", [("S", 2), ("M", 8)], "C+m?,0,0;", [200, 50], 0),
        ("CCGGACGTAC", [("S", 1), ("M", 6), ("D", 5), ("M", 3)], "C+m.,0;", [200], 0),
        ("ACGTACGTAC", [("M", 4), ("I", 2), ("M", 4)], "C+m,0,0;", [255, 255], 0),
        ("AACGTTACGT", [("M", 10)], "C+m?,0,0;", [220, 10], 16),
        ("ACGCGCGTAC", [("M", 3), ("D", 2), ("M", 7)], "C+m.,0;", None, 0),
        ("ACGTACGTAC", [("M", 10)], "C+m;", [], 0),
        ("ACGTACGTAC", [("M", 2), ("N", 3), ("M", 8)], "C+m?,0,0;", [200, 50], 0),
        ("CGCGCGCGCG", [("M", 10)], "C+m.,1;", [140], 16),
    ]
    for i, (seq, cig, mm, ml, flag) in enumerate(edges):
        tags = [("MM", "Z", mm)]
        if ml is not None:
            tags.append(("ML", "B:C", ml))
        rec = make_record(f"e{i}", 0, 1000, seq, cig, flag=flag, tags=tags)
        check(rec)

    # unsupported shapes must return None (Python path takes over)
    rec = make_record("multi", 0, 10, "ACGTACGTAC", [("M", 10)],
                      tags=[("MM", "Z", "C+m,0;A+a,0;"), ("ML", "B:C", [1, 2])])
    assert run_native(rec, 100, 156) is None
    rec2 = make_record("chebi", 0, 10, "ACGTACGTAC", [("M", 10)],
                       tags=[("MM", "Z", "C+27551,0;"), ("ML", "B:C", [9])])
    assert run_native(rec2, 100, 156) is None


def test_site_select_native_matches_numpy():
    """Native site_select == the numpy unique-key oracle on fuzzed calls."""
    from pomfret_tpu.io import native
    if not native.native_available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(7)
    for trial in range(25):
        n = int(rng.integers(0, 5000))
        pos = rng.integers(0, 2000, size=n).astype(np.uint32)
        q = rng.integers(0, 3, size=n).astype(np.uint8)
        cov = int(rng.integers(1, 8))
        got = native.site_select(pos, q, cov)
        assert got is not None
        key = pos.astype(np.uint64) * 4 + q
        uniq, cnts = np.unique(key, return_counts=True)
        pos_u = (uniq // 4).astype(np.uint64)
        cls_u = (uniq % 4).astype(np.uint8)
        positions, inv = np.unique(pos_u, return_inverse=True)
        cmat = np.zeros((len(positions), 3), dtype=np.int64)
        np.add.at(cmat, (inv, np.minimum(cls_u, 2).astype(np.int64)), cnts)
        want = positions[(cmat[:, 0] >= cov) & (cmat[:, 1] >= cov)]
        np.testing.assert_array_equal(got.astype(np.uint64), want,
                                      err_msg=f"trial {trial}")
