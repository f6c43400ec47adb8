"""End-to-end pipeline tests on synthetic data via the CLI entry points."""
import os

import pytest

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_block_scenario


def _read(path):
    with open(path) as f:
        return f.read()


@pytest.fixture(scope="module")
def cis_case(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cis"))
    bam, vcf, truth = make_two_block_scenario(d, trans=False)
    return d, bam, vcf, truth


def test_methphase_cis_join(cis_case):
    d, bam, vcf, truth = cis_case
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf,
                   "--write-bam", bam])
    assert rc == 0
    gtf = _read(prefix + ".mp.gtf")
    lines = [l for l in gtf.strip().split("\n") if l]
    # the two blocks join into one
    assert len(lines) == 1
    cols = lines[0].split("\t")
    assert cols[0] == "chr1"
    assert int(cols[3]) == truth["ps1"]
    assert f'gene_id "{truth["ps1"]}"' in cols[8]

    out_vcf = _read(prefix + ".mp.vcf")
    rows = []
    for line in out_vcf.strip().split("\n"):
        if line.startswith("#"):
            continue
        fields = line.split("\t")
        fmt = fields[8].split(":")
        sample = fields[9].split(":")
        if "PS" in fmt:
            rows.append((int(fields[1]), sample[fmt.index("PS")],
                         sample[fmt.index("GT")]))
    # all phased variants share one PS — except the LAST one (pos == abs_end)
    # which v0.1-r14's strict `pos < e` leaves unmodified (blockjoin.c:2373)
    last_pos = max(r[0] for r in rows)
    for pos, ps, gt in rows:
        if pos == last_pos:
            assert ps == str(truth["ps2"])
        else:
            assert ps == str(truth["ps1"])
    # cis join: no GT flipping anywhere
    sr = truth["region"]
    for (pos, ps, gt) in rows:
        hap_alt = next(h for (p, r, a, h) in sr.snps if p == pos - 1)
        expect = "1|0" if hap_alt == 0 else "0|1"
        assert gt == expect, (pos, gt, expect)

    # rewritten BAM exists with HP tags
    from pomfret_tpu.io.bam import BamReader
    rd = BamReader(prefix + ".mp.bam")
    n = hp_count = 0
    for rec in rd.fetch_all():
        n += 1
        if rec.get_tag("HP") in (1, 2):
            hp_count += 1
    assert n > 0 and hp_count > 0
    assert os.path.exists(prefix + ".mp.bam.bai")


def test_methphase_trans_join(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=True)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0
    gtf = _read(prefix + ".mp.gtf")
    assert len(gtf.strip().split("\n")) == 1  # joined

    sr = truth["region"]
    b2 = truth["blocks"][1]
    data_lines = [l for l in _read(prefix + ".mp.vcf").strip().split("\n")
                  if not l.startswith("#")]
    last_pos0 = max(int(l.split("\t")[1]) for l in data_lines) - 1
    for line in data_lines:
        fields = line.split("\t")
        pos0 = int(fields[1]) - 1
        fmt = fields[8].split(":")
        sample = fields[9].split(":")
        gt = sample[fmt.index("GT")]
        hap_alt = next(h for (p, r, a, h) in sr.snps if p == pos0)
        written = "1|0" if hap_alt == 0 else "0|1"
        if pos0 == last_pos0:
            # final variant unmodified (strict < quirk): keeps the flipped GT
            assert gt == ("0|1" if hap_alt == 0 else "1|0")
        elif pos0 >= b2[0]:
            # input had the flipped GT; trans join flips it back
            assert gt == written
        else:
            assert gt == written


def test_varhaptag_cli(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False, tagged=False)
    out = os.path.join(d, "tagged.bam")
    rc = cli_main(["varhaptag", "-o", out, vcf, bam])
    assert rc == 0
    assert os.path.exists(out)
    assert os.path.exists(out + ".bai")
    tsv = _read(out + ".varhaptag.tsv")
    rows = [l.split("\t") for l in tsv.strip().split("\n")[1:]]
    n_tagged = sum(1 for r in rows if r[2] in ("1", "2"))
    assert n_tagged > 0.8 * len(rows)
    # every tagged read matches its true haplotype (qname encodes it)
    for qn, _, new in rows:
        if new in ("1", "2"):
            assert int(new) - 1 == int(qn.split("_")[1])


def test_methphase_untagged_path(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False, tagged=False)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "-u", "--vcf", vcf, bam])
    assert rc == 0
    gtf = _read(prefix + ".mp.gtf")
    assert len(gtf.strip().split("\n")) == 1  # joined via varhaptag path
