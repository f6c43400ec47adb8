"""Coverage estimator: native columnar path vs pure-Python loop."""
import numpy as np
import pytest

from pomfret_tpu.io import native
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.pipeline import estimate_read_coverage_dirtyfast
from pomfret_tpu.testing import make_two_block_scenario


def test_native_matches_python(tmp_path):
    bam, vcf, truth = make_two_block_scenario(str(tmp_path))
    rd = BamReader(bam)
    fast = estimate_read_coverage_dirtyfast(rd)

    # force the slow path by monkeypatching scan_columns
    rd2 = BamReader(bam)
    rd2.scan_columns = lambda: (None, None)
    slow = estimate_read_coverage_dirtyfast(rd2)
    assert fast == slow
    assert fast[0] > 10  # sanity: ~50x synthetic coverage
