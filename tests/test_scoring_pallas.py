"""Pallas scoring kernel vs jnp reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pomfret_tpu.kernels.scoring_pallas import (score_candidates_pallas,
                                                score_candidates_reference)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_reference(seed):
    rng = np.random.default_rng(seed)
    S, D, NC = 256, 16, 16
    cnt = rng.integers(0, 30, size=(S, D, 2)).astype(np.float32)
    cnt[rng.random((S, D, 2)) < 0.7] = 0
    sums = cnt.sum(axis=1)
    cids = rng.integers(-1, D, size=(NC, S)).astype(np.int32)
    lo, hi = sorted(rng.integers(0, S, size=2).tolist())
    args = (jnp.asarray(cnt), jnp.asarray(sums), jnp.asarray(cids),
            jnp.int32(lo), jnp.int32(hi))
    interp = jax.default_backend() != "tpu"
    score_p, lf_p, lnz_p = score_candidates_pallas(*args, interpret=interp)
    score_r, lf_r, lnz_r = score_candidates_reference(*args)
    assert np.allclose(np.asarray(score_p), np.asarray(score_r), atol=1e-4)
    assert np.array_equal(np.asarray(lf_p), np.asarray(lf_r))
    assert np.array_equal(np.asarray(lnz_p), np.asarray(lnz_r))
