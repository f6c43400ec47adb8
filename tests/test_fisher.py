"""kt_fisher_exact reimplementation vs scipy + decision-threshold checks."""
import numpy as np
import pytest
from scipy import stats

from pomfret_tpu.core.fisher import kt_fisher_exact


@pytest.mark.parametrize("tbl", [
    (10, 0, 0, 10), (12, 1, 2, 14), (5, 5, 5, 5), (0, 0, 0, 0),
    (1, 0, 0, 0), (30, 2, 1, 25), (100, 3, 4, 90), (7, 7, 0, 0),
    (2, 3, 4, 5), (0, 10, 10, 0), (1, 1, 1, 1), (50, 0, 0, 1),
])
def test_two_sided_matches_scipy(tbl):
    n11, n12, n21, n22 = tbl
    _, _, two = kt_fisher_exact(n11, n12, n21, n22)
    expect = stats.fisher_exact([[n11, n12], [n21, n22]])[1]
    assert two == pytest.approx(expect, rel=1e-6, abs=1e-12)


def test_decision_threshold_band():
    """Exhaustively confirm p<0.001 decisions agree with scipy over the
    realistic contingency range (boundary read counts 0..25)."""
    rng = np.random.default_rng(0)
    n_checked = 0
    for _ in range(500):
        n11, n12, n21, n22 = rng.integers(0, 26, size=4)
        _, _, two = kt_fisher_exact(int(n11), int(n12), int(n21), int(n22))
        expect = stats.fisher_exact([[n11, n12], [n21, n22]])[1]
        assert (two < 0.001) == (expect < 0.001), (n11, n12, n21, n22, two, expect)
        n_checked += 1
    assert n_checked == 500
