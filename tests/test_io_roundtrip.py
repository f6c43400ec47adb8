import os

import pytest

from pomfret_tpu.io.bgzf import BgzfReader, BgzfWriter, is_bgzf
from pomfret_tpu.io.bam import BamReader, bam_endpos
from pomfret_tpu.io.bam_writer import BamWriter, build_bai_index
from pomfret_tpu.io.records import make_record


def test_bgzf_roundtrip(tmp_path):
    p = str(tmp_path / "x.bgzf")
    payload = os.urandom(300000) + b"tail"
    with BgzfWriter(p, threads=3) as w:
        w.write(payload)
    assert is_bgzf(p)
    r = BgzfReader(p, threads=2)
    assert r.read_all() == payload
    r2 = BgzfReader(p)
    assert r2.read(10) == payload[:10]
    assert r2.read(len(payload)) == payload[10:]


def _sample_records():
    recs = []
    for i in range(50):
        pos = 1000 + i * 500
        recs.append(
            make_record(
                f"read{i}", 0, pos, "ACGTACGTAC", [("M", 10)],
                flag=16 if i % 3 == 0 else 0,
                tags=[("HP", "i", (i % 2) + 1), ("de", "f", 0.01),
                      ("MD", "Z", "10"), ("MM", "Z", "C+m?,0;"),
                      ("ML", "B:C", [200])],
            )
        )
    # second chromosome
    for i in range(10):
        recs.append(make_record(f"r2_{i}", 1, 100 + i * 50, "ACGT", [("M", 4)]))
    return recs


def test_bam_roundtrip_and_fetch(tmp_path):
    p = str(tmp_path / "t.bam")
    recs = _sample_records()
    with BamWriter(p, ["chr1", "chr2"], [1000000, 5000], header_text="@HD\tVN:1.6\n",
                   keep_index_info=True) as w:
        for r in recs:
            w.write(r)
    w.build_index(n_ref=2)
    assert os.path.exists(p + ".bai")

    rd = BamReader(p)
    assert rd.ref_names == ["chr1", "chr2"]
    got = list(rd.fetch_all())
    assert len(got) == len(recs)
    assert got[0].qname == "read0"
    assert got[0].seq() == "ACGTACGTAC"
    assert got[0].get_tag("HP") == 1
    assert abs(got[0].get_tag("de") - 0.01) < 1e-6
    assert got[0].get_tag("MM") == "C+m?,0;"
    assert got[0].get_tag("ML") == ("C", [200])
    assert bam_endpos(got[0]) == 1010

    # region fetch via index
    sel = list(rd.fetch("chr1", 5000, 8000))
    expect = [r for r in recs if r.refID == 0 and r.pos < 8000 and bam_endpos(r) > 5000]
    assert [r.qname for r in sel] == [r.qname for r in expect]
    sel2 = list(rd.fetch("chr2", 0, 10000))
    assert len(sel2) == 10

    # 1-based region API
    sel3 = list(rd.fetch_region_1based("chr1", 5001, 8000))
    assert [r.qname for r in sel3] == [r.qname for r in expect]


def test_tag_update(tmp_path):
    r = make_record("q", 0, 5, "ACGT", [("M", 4)], tags=[("HP", "i", 1), ("MD", "Z", "4")])
    r.set_int_tag("HP", 2)
    assert r.get_tag("HP") == 2
    assert r.get_tag("MD") == "4"
    r2 = make_record("q", 0, 5, "ACGT", [("M", 4)], tags=[("MD", "Z", "4")])
    r2.set_int_tag("HP", 255)
    assert r2.get_tag("HP") == 255


def test_external_index_compat(tmp_path):
    """Our BAI parser must read the reference's real index files."""
    ref_bai = "/root/reference/example/phased.bam.bai"
    if not os.path.exists(ref_bai):
        pytest.skip("reference example index missing")
    from pomfret_tpu.io.bam import BaiIndex
    idx = BaiIndex(ref_bai)
    assert len(idx.bins) >= 1
    # chr6 region used by the bundled example
    chunks = idx.chunks_for_region(0, 11_000_000, 11_200_000)
    assert isinstance(chunks, list)
