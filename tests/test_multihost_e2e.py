"""Multi-host determinism: 2-process methphase output == single-host output
(the SURVEY §4 "same output for 1 vs N hosts" requirement)."""
import os
import subprocess
import sys

import pytest

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_block_scenario, SynthConfig


def _run_multihost(cli_args, n_procs, port_salt, extra_env=None,
                   timeout=600):
    """Spawn n_procs CPU-backend processes running the same CLI argv under
    jax.distributed; host 0 writes. Asserts every process exits 0."""
    env0 = dict(os.environ)
    env0.update({
        "PYTHONPATH": "/root/repo",
        "POMFRET_COORDINATOR":
            "127.0.0.1:%d" % (20000 + ((os.getpid() + port_salt) % 20000)),
        "POMFRET_NUM_PROCS": str(n_procs),
        "JAX_PLATFORMS": "cpu",
    })
    env0.update(extra_env or {})
    procs = []
    for pid in range(n_procs):
        env = dict(env0)
        env["POMFRET_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from pomfret_tpu.cli import main; import sys;"
             f"sys.exit(main({cli_args!r}))"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, err[-3000:]


@pytest.mark.slow
@pytest.mark.parametrize("n_procs", [2, 4])
def test_multihost_multichrom_manygap_identical(tmp_path, n_procs):
    """2 chromosomes x 3 gaps, round-robin over N processes so EVERY
    process decides gaps on both chromosomes (the round-1 fixture had one
    gap and host 1 sat idle — VERDICT r1 item 6b). Each process also runs
    the jax engine over an 8-virtual-device mesh, composing the local
    multi-chip path with the multi-host merge. Host 0's outputs must equal
    the single-process run byte-for-byte."""
    from pomfret_tpu.testing import make_multichrom_multigap_scenario
    d = str(tmp_path)
    bam, vcf, truths = make_multichrom_multigap_scenario(
        d, n_chroms=2, n_blocks=4, read_stagger=1400)
    args = ["-c", "25", "--engine", "jax", "--vcf", vcf, bam]

    p1 = os.path.join(d, "single")
    assert cli_main(["methphase", "-o", p1, *args]) == 0
    gtf1 = open(p1 + ".mp.gtf").read()
    # all 3 chr1 gaps join -> ONE block spanning every chr1 variant (chr2
    # emits only a placeholder block the GTF writer skips — the abs_start-
    # only-for-the-first-chromosome quirk, blockjoin.c:1406-1410, 2743)
    assert gtf1.count("exon") == 1, gtf1
    assert "chr1" in gtf1 and "\t333005\t" in gtf1, gtf1
    # chr2's joins show up as a single unified PS across its variants
    import gzip as _gz
    chr2_ps = set()
    for line in open(p1 + ".mp.vcf"):
        if line.startswith("chr2"):
            chr2_ps.add(line.rsplit(":", 1)[-1].strip())
    assert len(chr2_ps) <= 2, f"chr2 gaps did not join: PS={chr2_ps}"

    p2 = os.path.join(d, f"multi{n_procs}")
    _run_multihost(
        ["methphase", "-o", p2, *args], n_procs, port_salt=37 * n_procs,
        extra_env={"XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    for suffix in (".mp.gtf", ".mp.vcf"):
        a = open(p1 + suffix).read()
        b = open(p2 + suffix).read()
        assert a == b, f"{suffix} differs between 1 and {n_procs} hosts"


@pytest.mark.slow
def test_two_host_output_identical(tmp_path):
    d = str(tmp_path)
    # two gaps so the round-robin actually splits work across hosts: use two
    # separate two-block scenarios? simpler: one gap still validates the
    # merge path; generate the standard scenario
    bam, vcf, truth = make_two_block_scenario(d, trans=False)

    # single-host run
    p1 = os.path.join(d, "single")
    rc = cli_main(["methphase", "-o", p1, "-c", "50", "--vcf", vcf, bam])
    assert rc == 0

    # two-host run (subprocesses; host 0 writes)
    p2 = os.path.join(d, "multi")
    env0 = dict(os.environ)
    env0.update({
        "PYTHONPATH": "/root/repo",
        "POMFRET_COORDINATOR": "127.0.0.1:%d" % (20000 + ((os.getpid() + 7) % 20000)),
        "POMFRET_NUM_PROCS": "2",
        "JAX_PLATFORMS": "cpu",
    })
    procs = []
    for pid in range(2):
        env = dict(env0)
        env["POMFRET_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from pomfret_tpu.cli import main; import sys;"
             f"sys.exit(main(['methphase','-o','{p2}','-c','50','--vcf','{vcf}','{bam}']))"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]

    for suffix in (".mp.gtf", ".mp.vcf"):
        a = open(p1 + suffix).read()
        b = open(p2 + suffix).read()
        assert a == b, f"{suffix} differs between 1-host and 2-host runs"


@pytest.mark.slow
def test_two_host_report_identical(tmp_path):
    """report shards probe windows across hosts; host 0's TSV must equal
    the single-host TSV byte-for-byte."""
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False)
    args = ["report", "-c", "50", "--chunk-size", "40000",
            "--chunk-stride", "30000", "--vcf", vcf]

    p1 = os.path.join(d, "single")
    assert cli_main(["report", "-o", p1] + args[1:] + [bam]) == 0

    p2 = os.path.join(d, "multi")
    env0 = dict(os.environ)
    env0.update({
        "PYTHONPATH": "/root/repo",
        "POMFRET_COORDINATOR": "127.0.0.1:%d" % (20000 + ((os.getpid() + 131) % 20000)),
        "POMFRET_NUM_PROCS": "2",
        "JAX_PLATFORMS": "cpu",
    })
    cli_args = ["report", "-o", p2] + args[1:] + [bam]
    procs = []
    for pid in range(2):
        env = dict(env0)
        env["POMFRET_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from pomfret_tpu.cli import main; import sys;"
             f"sys.exit(main({cli_args!r}))"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
    assert open(p1 + ".report.tsv").read() == open(p2 + ".report.tsv").read()


@pytest.mark.slow
def test_two_host_permutation_voting_identical(tmp_path):
    """--n-permutations draws per-gap srand48 streams (PARITY.md X7), so a
    2-host run must still equal the single-host run byte-for-byte."""
    d = str(tmp_path)
    bam, vcf, truth = make_two_block_scenario(d, trans=False)
    base = ["methphase", "-c", "50", "--n-permutations", "7", "--vcf", vcf]

    p1 = os.path.join(d, "single")
    assert cli_main(base[:1] + ["-o", p1] + base[1:] + [bam]) == 0

    p2 = os.path.join(d, "multi")
    env0 = dict(os.environ)
    env0.update({
        "PYTHONPATH": "/root/repo",
        "POMFRET_COORDINATOR": "127.0.0.1:%d" % (20000 + ((os.getpid() + 977) % 20000)),
        "POMFRET_NUM_PROCS": "2",
        "JAX_PLATFORMS": "cpu",
    })
    cli_args = base[:1] + ["-o", p2] + base[1:] + [bam]
    procs = []
    for pid in range(2):
        env = dict(env0)
        env["POMFRET_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c",
             "import jax; jax.config.update('jax_platforms','cpu');"
             "from pomfret_tpu.cli import main; import sys;"
             f"sys.exit(main({cli_args!r}))"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
    for suffix in (".mp.gtf", ".mp.vcf"):
        assert open(p1 + suffix).read() == open(p2 + suffix).read(), suffix
