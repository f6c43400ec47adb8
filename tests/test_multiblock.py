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


def test_multichrom_trans_alternate_all_gaps_trans(tmp_path):
    """trans_alternate generator (VERDICT r4 #7): odd blocks carry
    hap-swapped GT/HP labels, so every gap's truth is a trans join — the
    engine must decide trans (1) at each gap; a cis decision would be a
    switch error."""
    from pomfret_tpu.testing import make_multichrom_multigap_scenario
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import READBACK, MmrConfig
    from pomfret_tpu.io.intervals_loader import (IS_VCF,
                                                 load_intervals_from_file)
    from pomfret_tpu.core.intervals import (merge_close_intervals,
                                            store_raw_intervals)
    from pomfret_tpu.pipeline import (Storage, _derive_chrom_params,
                                      estimate_read_coverage_cached,
                                      haplotag_region_given_bam)

    bam_path, vcf, truths = make_multichrom_multigap_scenario(
        tmp_path.as_posix(), n_chroms=1, n_blocks=3, trans_alternate=True)
    assert truths[0]["expected_decisions"] == [1, 1]
    bam = BamReader(bam_path)
    st = Storage()
    load_intervals_from_file(vcf, IS_VCF, st)
    for rg in st.ranges:
        store_raw_intervals(rg)
        merge_close_intervals(rg, READBACK)
    name2cov = estimate_read_coverage_cached(bam_path, 2)
    rg = st.ranges[0]
    ref = st.ref_names[0]
    cfg, n_cand = _derive_chrom_params(MmrConfig(), 14,
                                       name2cov.get(ref, 0), ref)
    for i in range(len(rg.starts)):
        dec, _rs = haplotag_region_given_bam(
            st, bam, ref, rg.starts[i], rg.ends[i], cfg, n_cand,
            engine="host")
        assert dec == 1, (i, dec)
