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
