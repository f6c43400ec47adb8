"""Checkpoint/resume via the per-gap manifest."""
import json
import os

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_block_scenario
from pomfret_tpu.utils.manifest import load_manifest


def test_resume_skips_done_gaps(tmp_path, capsys):
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0
    man = prefix + ".mp.manifest.jsonl"
    assert os.path.exists(man)
    entries = load_manifest(man)
    assert len(entries) == 1
    e = entries[("chr1", 0)]
    assert e["decision"] == 0
    assert len(e["tags"]) > 0
    gtf1 = open(prefix + ".mp.gtf").read()

    # resume: no gaps recomputed, identical output
    import time
    t0 = time.time()
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf,
                   "--resume", bam])
    dt = time.time() - t0
    assert rc == 0
    assert open(prefix + ".mp.gtf").read() == gtf1
    assert dt < 15  # resume skips the (multi-second) engine work


def test_partial_resume_recomputes_missing_gaps(tmp_path):
    """Simulate a crash: drop one chromosome's entry from the manifest and
    resume — only that gap is recomputed and outputs are identical."""
    from pomfret_tpu.testing import make_two_chrom_scenario
    d = str(tmp_path)
    bam, vcf, truths = make_two_chrom_scenario(d)
    prefix = os.path.join(d, "out")
    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0
    gtf1 = open(prefix + ".mp.gtf").read()
    vcf1 = open(prefix + ".mp.vcf").read()
    man = prefix + ".mp.manifest.jsonl"
    lines = open(man).read().strip().split("\n")
    assert len(lines) == 2
    kept = [l for l in lines if json.loads(l)["ref"] == "chr1"]
    with open(man, "w") as f:
        f.write("\n".join(kept) + "\n")

    rc = cli_main(["methphase", "-o", prefix, "-c", "50", "--vcf", vcf,
                   "--resume", bam])
    assert rc == 0
    assert open(prefix + ".mp.gtf").read() == gtf1
    assert open(prefix + ".mp.vcf").read() == vcf1
    entries = load_manifest(man)
    assert ("chr1", 0) in entries and ("chr2", 0) in entries


def test_manifest_tolerates_torn_tail(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with open(p, "w") as f:
        f.write(json.dumps({"ref": "c", "gap_i": 0, "start": 1, "end": 2,
                            "decision": 0, "tags": {}}) + "\n")
        f.write('{"ref": "c", "gap_i": 1, "start"')  # torn line
    entries = load_manifest(p)
    assert list(entries) == [("c", 0)]
