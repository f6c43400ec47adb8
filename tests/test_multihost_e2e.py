"""Multi-host determinism: 2-process methphase output == single-host output
(the SURVEY §4 "same output for 1 vs N hosts" requirement)."""
import os
import subprocess
import sys

import pytest

from pomfret_tpu.cli import main as cli_main
from pomfret_tpu.testing import make_two_block_scenario, SynthConfig


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
