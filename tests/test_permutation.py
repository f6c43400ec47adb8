"""Permutation-voting path of haplotag_region2 (blockjoin.c:4088-4214).

The reference main path hardcodes n_permutation=1 (blockjoin.c:4675); the
permutation machinery (permute_haplotags + majority voting) is nonetheless
part of the component inventory and is exposed here via --n-permutations.
"""
import numpy as np
import pytest

from pomfret_tpu.core.engine_host import Drand48, ks_shuffle, permute_haplotags
from pomfret_tpu.core.readset import ReadSet, Read


def test_drand48_matches_glibc():
    # first 8 draws of glibc's unseeded drand48 (X0=0; generated with gcc)
    exp = [3.907985046680551e-14, 0.00098539467465030839,
           0.041631001594613082, 0.17664264254291595,
           0.36460224839060729, 0.091330612112294318,
           0.092297647698675434, 0.48721722394682843]
    r = Drand48()
    got = [r.next() for _ in range(8)]
    assert got == exp


def test_ks_shuffle_matches_libc_trace():
    # ks_shuffle (ksort.h:260-268) over [0..9] drawing from the unseeded
    # stream; expected permutation generated with gcc + libc drand48
    a = list(range(10))
    ks_shuffle(a, Drand48())
    assert a == [3, 5, 6, 4, 7, 2, 1, 8, 9, 0]


def _mini_readset(haps):
    rs = ReadSet(ref_start=0, ref_end=100)
    for i, hp in enumerate(haps):
        r = Read(i=i, qname=f"r{i}", hp=hp, strand=0, length=100,
                 start_pos=0, end_pos=100,
                 calls=np.zeros(0, dtype=np.uint32),
                 quals=np.zeros(0, dtype=np.uint8))
        rs.reads.append(r)
    return rs


def test_permute_haplotags_swaps_up_to_n_per_side():
    # 6 hap0 + 6 hap1 boundary reads; n=5 -> exactly 5 flips per side
    rs = _mini_readset([0] * 6 + [1] * 6 + [2] * 3)
    ids = list(range(12))
    rng = Drand48()
    ret = permute_haplotags(rs, ids, 5, rng)
    assert ret == 0
    haps = [rs.reads[i].hp for i in range(12)]
    assert sum(1 for i in range(6) if haps[i] == 1) == 5
    assert sum(1 for i in range(6, 12) if haps[i] == 0) == 5
    # unphased reads untouched
    assert all(rs.reads[i].hp == 2 for i in range(12, 15))


def test_permute_haplotags_empty_ids_reports_failure():
    rs = _mini_readset([0, 1])
    assert permute_haplotags(rs, [], 5, Drand48()) == 1
    # n is clamped to len(ids); len>0 still permutes
    assert permute_haplotags(rs, [0, 1], 5, Drand48()) == 0


def test_permute_consumes_stream_hap0_first():
    # the hap0 shuffle must consume the stream before hap1's: replicate by
    # hand with a single stream and compare final tags
    haps = [0, 1, 0, 1, 0, 1, 0, 1]
    rs = _mini_readset(haps)
    ids = list(range(8))
    rng = Drand48()
    permute_haplotags(rs, ids, 2, rng)

    ref = Drand48()
    buf0 = [i for i in range(8) if haps[i] == 0]
    buf1 = [i for i in range(8) if haps[i] == 1]
    ks_shuffle(buf0, ref)
    ks_shuffle(buf1, ref)
    exp = list(haps)
    for i in buf0[:2]:
        exp[i] = 1
    for i in buf1[:2]:
        exp[i] = 0
    assert [r.hp for r in rs.reads] == exp


@pytest.mark.parametrize("n_perm", [3, 7])
def test_permutation_voting_agrees_on_clean_scenario(tmp_path, n_perm):
    """On a clean two-block scenario every permutation run should reach the
    same (correct) join, so voting returns the n_permutations=1 decision."""
    from pomfret_tpu.testing import make_two_block_scenario
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import load_reads_given_interval, MmrConfig, READBACK
    from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
    from pomfret_tpu.core.engine_host import haplotag_region

    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]

    def run(n_permutations):
        rs = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
        ms_fwd = get_methmer_sites_and_ranges(rs, cfg, 0)
        ms_bwd = get_methmer_sites_and_ranges(rs, cfg, 1)
        return haplotag_region(rs, ms_fwd, ms_bwd, 15, cfg.cov_for_runtime,
                               n_permutations)

    base = run(1)
    assert base == truth["expected_decision"]
    assert run(n_perm) == base


def test_cli_n_permutations_flag(tmp_path):
    from pomfret_tpu.testing import make_two_block_scenario
    from pomfret_tpu.cli import main as cli_main

    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    prefix = str(tmp_path / "out_perm")
    ret = cli_main(["methphase", "-o", prefix, "--vcf", vcf,
                    "--engine", "host", "--n-permutations", "3", bam])
    assert ret == 0
    gtf = open(prefix + ".mp.gtf").read()
    assert "exon" in gtf


@pytest.mark.parametrize("n_perm", [3, 11])
def test_batched_permutation_pipeline_matches_host(tmp_path, n_perm):
    """--n-permutations N --engine jax must ride the grouped batch (one
    dispatch per group, N lanes per gap-direction) and produce outputs
    byte-identical to the host oracle, which draws the same per-gap
    srand48 streams (VERDICT r1 item 7)."""
    from pomfret_tpu.testing import SynthConfig, make_multi_block_scenario
    from pomfret_tpu.cli import main as cli_main
    from pomfret_tpu.parallel import batch as pb

    bam, vcf, truth = make_multi_block_scenario(
        str(tmp_path), n_blocks=3,
        cfg=SynthConfig(noise=0.06, nocall=0.06, seed=5))
    args = ["-c", "50", "--vcf", vcf, "--n-permutations", str(n_perm), bam]

    p_h = str(tmp_path / "host")
    assert cli_main(["methphase", "-o", p_h, "--engine", "host", *args]) == 0
    before = pb.DISPATCH_STATS["n_dispatches"]
    p_j = str(tmp_path / "jax")
    assert cli_main(["methphase", "-o", p_j, "--engine", "jax", *args]) == 0
    assert pb.DISPATCH_STATS["n_dispatches"] == before + 1, \
        "permutation voting did not ride the single grouped dispatch"
    assert pb.DISPATCH_STATS["lanes_last"] >= 2 * 2 * n_perm

    for ext in (".mp.gtf", ".mp.vcf"):
        b_h = open(p_h + ext, "rb").read()
        b_j = open(p_j + ext, "rb").read()
        assert b_h == b_j, f"{ext} differs between host and batched-jax " \
                           f"permutation voting (N={n_perm})"


@pytest.mark.parametrize("trans,noise,n_perm", [
    (False, 0.0, 3),
    (False, 0.08, 7),
    (True, 0.05, 7),
])
def test_permutation_voting_device_matches_host(tmp_path, trans, noise, n_perm):
    """With n_permutations>1 the device engine dispatches one lane per
    permutation seed; decisions AND per-read tags must equal the host
    oracle's (both draw seeds from the same drand48 stream position)."""
    from pomfret_tpu.testing import SynthConfig, make_two_block_scenario
    from pomfret_tpu.io.bam import BamReader
    from pomfret_tpu.core.readset import READBACK, MmrConfig, load_reads_given_interval
    from pomfret_tpu.core.methmer import get_methmer_sites_and_ranges
    from pomfret_tpu.core.engine_host import haplotag_region, reset_drand48
    from pomfret_tpu.kernels.engine_jax import run_gap_jax

    synth_cfg = SynthConfig(noise=noise, nocall=noise, seed=13)
    bam, vcf, truth = make_two_block_scenario(str(tmp_path), trans=trans,
                                              cfg=synth_cfg)
    bamr = BamReader(bam)
    cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
    gs, ge = truth["gap"]

    reset_drand48()
    rs_h = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    f_h = get_methmer_sites_and_ranges(rs_h, cfg, 0)
    b_h = get_methmer_sites_and_ranges(rs_h, cfg, 1)
    dec_h = haplotag_region(rs_h, f_h, b_h, 14, 10, n_perm)

    reset_drand48()
    rs_j = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
    f_j = get_methmer_sites_and_ranges(rs_j, cfg, 0)
    b_j = get_methmer_sites_and_ranges(rs_j, cfg, 1)
    dec_j = run_gap_jax(rs_j, f_j, b_j, 14, 10, n_perm)

    assert dec_h == dec_j
    assert [r.hp for r in rs_h.reads] == [r.hp for r in rs_j.reads]
