"""Multi-gap scenario: all gaps join and PS values unify (host engine)."""
import os

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_multi_block_scenario


def test_multiblock_joins_all(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_multi_block_scenario(d, n_blocks=3)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0
    gtf = open(prefix + ".mp.gtf").read().strip().split("\n")
    assert len(gtf) == 1  # all blocks joined
    cols = gtf[0].split("\t")
    assert int(cols[3]) == truth["ps_ids"][0]

    # PS unified (modulo the final-variant strict-< quirk)
    ps_vals = {}
    for line in open(prefix + ".mp.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        fmt = f[8].split(":")
        if "PS" in fmt:
            ps_vals[int(f[1])] = f[9].split(":")[fmt.index("PS")].strip()
    last = max(ps_vals)
    for pos, ps in ps_vals.items():
        if pos != last:
            assert ps == str(truth["ps_ids"][0])


def test_methstat_subcommand(tmp_path):
    d = str(tmp_path)
    bam, vcf, truth = make_multi_block_scenario(d, n_blocks=3)
    prefix = os.path.join(d, "ms")
    rc = cli_main(["methstat", "-o", prefix, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0
    rows = open(prefix + ".methstat.tsv").read().strip().split("\n")
    assert len(rows) > 10
    assert all(r.split("\t")[0] == "chr1" for r in rows)
