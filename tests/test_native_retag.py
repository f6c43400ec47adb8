"""Native whole-BAM HP retag (bam_retag_hp) vs the per-record Python path.

The outputs must be byte-identical — same BamWriter streaming, same record
bytes, same .bai — on both the tagged path (HP aux replace) and the
untagged -u path (raw-map lookup, HP append)."""
import os

import numpy as np
import pytest

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.io import native
from pomfret_tpu.testing import make_two_block_scenario


def _run_pair(tmp_path, monkeypatch, extra, subdir):
    d = tmp_path / subdir
    d.mkdir()
    bam, vcf, truth = make_two_block_scenario(
        str(d), tagged="untagged" not in subdir)
    args = ["-c", "50", "--vcf", vcf, "--write-bam", *extra, bam]
    p1 = str(d / "nat")
    rc = cli_main(["methphase", "-o", p1, *args])
    assert rc == 0
    monkeypatch.setenv("POMFRET_NO_NATIVE_RETAG", "1")
    p2 = str(d / "py")
    rc = cli_main(["methphase", "-o", p2, *args])
    assert rc == 0
    monkeypatch.delenv("POMFRET_NO_NATIVE_RETAG")
    b1 = open(p1 + ".mp.bam", "rb").read()
    b2 = open(p2 + ".mp.bam", "rb").read()
    assert b1 == b2, "BAM bytes differ between native and Python retag"
    i1 = open(p1 + ".mp.bam.bai", "rb").read()
    i2 = open(p2 + ".mp.bam.bai", "rb").read()
    assert i1 == i2, ".bai differs between native and Python retag"


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_tagged(tmp_path, monkeypatch):
    _run_pair(tmp_path, monkeypatch, [], "tagged")


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_untagged(tmp_path, monkeypatch):
    _run_pair(tmp_path, monkeypatch, ["-u"], "untagged")


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_two_chromosomes(tmp_path, monkeypatch):
    """Chromosome transitions exercise the UnphasedLookup reset + the
    need_flip-persists-across-chromosomes quirk (blockjoin.c:3057-3062)."""
    from pomfret_tpu.testing import make_two_chrom_scenario
    d = tmp_path / "twochrom"
    d.mkdir()
    bam, vcf, truths = make_two_chrom_scenario(str(d))
    args = ["-c", "50", "--vcf", vcf, "--write-bam", bam]
    p1 = str(d / "nat")
    assert cli_main(["methphase", "-o", p1, *args]) == 0
    monkeypatch.setenv("POMFRET_NO_NATIVE_RETAG", "1")
    p2 = str(d / "py")
    assert cli_main(["methphase", "-o", p2, *args]) == 0
    assert open(p1 + ".mp.bam", "rb").read() == open(p2 + ".mp.bam", "rb").read()
    assert open(p1 + ".mp.bam.bai", "rb").read() == open(p2 + ".mp.bam.bai", "rb").read()


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_trailing_junk(tmp_path):
    """Non-gzip bytes after the BGZF EOF block are tolerated with a warning
    (matching the block-structured readers), not a failed rewrite."""
    from pomfret_tpu.core.intervals import Storage
    from pomfret_tpu.io.writers import output_modify_bam
    d = tmp_path / "junk"
    d.mkdir()
    bam, vcf, truth = make_two_block_scenario(str(d))
    with open(bam, "ab") as f:
        f.write(b"\x00junkJUNKjunk")
    out = str(d / "out.bam")
    output_modify_bam(bam, Storage(), out, threads=2)
    from pomfret_tpu.io.bam import BamReader
    n = sum(1 for _ in BamReader(out).fetch_all())
    assert n > 400


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_short_junk_tail(tmp_path):
    """A junk tail SHORTER than a minimal BGZF header (<12 bytes) must also
    warn-and-stop, not abort the rewrite (round-1 advisor finding)."""
    from pomfret_tpu.core.intervals import Storage
    from pomfret_tpu.io.writers import output_modify_bam
    d = tmp_path / "shortjunk"
    d.mkdir()
    bam, vcf, truth = make_two_block_scenario(str(d))
    with open(bam, "ab") as f:
        f.write(b"\x00junk")  # 5 bytes, non-gzip
    out = str(d / "out.bam")
    output_modify_bam(bam, Storage(), out, threads=2)
    from pomfret_tpu.io.bam import BamReader
    n = sum(1 for _ in BamReader(out).fetch_all())
    assert n > 400


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_retag_truncated_block_raises_and_cleans_up(tmp_path):
    """A genuinely truncated final block (valid gzip magic, payload cut)
    must raise — and must not leave a partial output BAM/.bai on disk."""
    from pomfret_tpu.core.intervals import Storage
    from pomfret_tpu.io.writers import output_modify_bam
    d = tmp_path / "trunc"
    d.mkdir()
    bam, vcf, truth = make_two_block_scenario(str(d))
    data = open(bam, "rb").read()
    trunc = str(d / "trunc.bam")
    with open(trunc, "wb") as f:
        # drop the EOF block's tail so the last header parses but its
        # payload is incomplete
        f.write(data[:-10])
    out = str(d / "out.bam")
    with pytest.raises(ValueError):
        output_modify_bam(trunc, Storage(), out, threads=2)
    assert not os.path.exists(out), "partial output BAM left on disk"
    assert not os.path.exists(out + ".bai"), "partial .bai left on disk"


@pytest.mark.skipif(not native.native_available(), reason="no native lib")
def test_native_varhaptag_matches_python(tmp_path, monkeypatch):
    d = tmp_path / "vh"
    d.mkdir()
    bam, vcf, truth = make_two_block_scenario(str(d), tagged=False)
    p1 = str(d / "nat.bam")
    rc = cli_main(["varhaptag", "-o", p1, vcf, bam])
    assert rc == 0
    monkeypatch.setenv("POMFRET_NO_NATIVE_RETAG", "1")
    p2 = str(d / "py.bam")
    rc = cli_main(["varhaptag", "-o", p2, vcf, bam])
    assert rc == 0
    assert open(p1, "rb").read() == open(p2, "rb").read()
    assert open(p1 + ".bai", "rb").read() == open(p2 + ".bai", "rb").read()
    t1 = open(p1 + ".varhaptag.tsv").read()
    t2 = open(p2 + ".varhaptag.tsv").read()
    assert t1 == t2 and t1.count("\n") > 100
