"""Secondary CLI flags: --output-tsv, --dbg, -U, --dont-write-bam."""
import os

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_block_scenario


def test_output_tsv_and_dbg(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf,
                   "--output-tsv", "--dbg", bam])
    assert rc == 0
    tsv = open(prefix + ".mp.tsv").read().strip().split("\n")
    assert len(tsv) == 1
    c = tsv[0].split("\t")
    assert c[0] == "chr1" and int(c[1]) == truth["ps1"]
    dbg = open(prefix + ".mp.dbg.read2tag").read().strip().split("\n")
    assert len(dbg) > 100
    assert all(r.split("\t")[1] == "-1" for r in dbg[:10])


def test_write_input_tagging(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False, tagged=False)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "-u", "-U",
                   "--vcf", vcf, bam])
    assert rc == 0
    rows = open(prefix + ".mp.input_haptag.tsv").read().strip().split("\n")
    assert rows[0].startswith("#qname")
    assert len(rows) > 100
    # untagged input: real_hp column is HAPTAG_UNPHASED+1 = 255
    assert rows[1].split("\t")[1] == "255"


def test_varhaptag_no_bam(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False, tagged=False)
    out = os.path.join(d, "x.bam")
    rc = cli_main(["varhaptag", "-o", out, "--dont-write-bam", vcf, bam])
    assert rc == 0
    assert not os.path.exists(out)
    assert os.path.exists(out + ".varhaptag.tsv")
