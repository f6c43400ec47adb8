"""Two-chromosome E2E: joins on both chroms; the abs_start quirk makes the
second chromosome's phase blocks placeholders that the GTF writer skips."""
import os

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_chrom_scenario


def test_two_chromosomes(tmp_path):
    d = str(tmp_path)
    bam, vcf, truths = make_two_chrom_scenario(d)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "-t", "2",
                   "--vcf", vcf, bam])
    assert rc == 0
    gtf = [l.split("\t") for l in open(prefix + ".mp.gtf").read().strip().split("\n")]
    # chr1 gets a real block; chr2's blocks carry start=0 (abs_start never
    # set after the first chromosome) and are skipped as placeholders
    assert [g[0] for g in gtf] == ["chr1"]
    assert int(gtf[0][3]) == truths[0]["ps1"]

    # the VCF rewrite still unifies PS on chr1; chr2 gets block 0..abs_end
    ps = {"chr1": set(), "chr2": set()}
    for line in open(prefix + ".mp.vcf"):
        if line.startswith("#"):
            continue
        f = line.split("\t")
        fmt = f[8].split(":")
        if "PS" in fmt:
            ps[f[0]].add(f[9].split(":")[fmt.index("PS")].strip())
    assert str(truths[0]["ps1"]) in ps["chr1"]
    # chr2: decisions were made (manifest) even though its GTF block is a
    # placeholder
    from pomfret_tpu.utils.manifest import load_manifest
    entries = load_manifest(prefix + ".mp.manifest.jsonl")
    assert ("chr2", 0) in entries
    assert entries[("chr2", 0)]["decision"] == 0
    assert entries[("chr1", 0)]["decision"] == 0
