"""Fuzz the vectorized methmer extraction against the literal buf walk."""
import numpy as np
import pytest

from pomfret_tpu.core.methmer import (Methmers, _get_mmr_of_read_walk,
                                      get_mmr_of_read)
from pomfret_tpu.core.readset import MmrConfig, Read


def _mk_ms(rng, n_sites, with_dups):
    pos = np.sort(rng.choice(np.arange(100, 100000, 7), size=n_sites, replace=False)).astype(np.uint32)
    if with_dups:
        # bwd-style starts: non-decreasing with duplicate runs
        starts = pos.copy()
        for i in range(1, n_sites):
            if rng.random() < 0.3:
                starts[i] = starts[i - 1]
        starts = np.maximum.accumulate(starts)
    else:
        starts = pos
    lens = rng.integers(1, 6, size=n_sites).astype(np.uint8)
    return Methmers(config=MmrConfig(), n=n_sites, sites_real_poss=pos,
                    sites_starts=starts, mmr_lens=lens)


def _mk_read(rng, ms, i):
    # calls at a random subset of grid positions + a few off-grid positions
    grid = np.unique(ms.sites_starts)
    k = rng.integers(2, max(3, len(grid)))
    sel = np.sort(rng.choice(grid, size=min(k, len(grid)), replace=False))
    extra = rng.choice(np.arange(50, 110000, 13), size=3, replace=False)
    calls = np.unique(np.concatenate([sel, extra])).astype(np.uint32)
    quals = rng.integers(0, 3, size=len(calls)).astype(np.uint8)
    return Read(i=i, qname=f"r{i}", hp=0, strand=0, length=20000,
                start_pos=int(calls[0]), end_pos=int(calls[-1]) + 1,
                calls=calls, quals=quals)


@pytest.mark.parametrize("with_dups", [False, True])
def test_fuzz_fast_matches_walk(with_dups):
    rng = np.random.default_rng(42 if with_dups else 7)
    for trial in range(300):
        n_sites = int(rng.integers(2, 40))
        ms = _mk_ms(rng, n_sites, with_dups)
        read = _mk_read(rng, ms, trial)
        fast = get_mmr_of_read(read, ms)
        walk = _get_mmr_of_read_walk(read, ms)
        assert fast == walk, (trial, ms.sites_starts.tolist(),
                              read.calls.tolist(), read.quals.tolist(),
                              ms.mmr_lens.tolist(), fast, walk)
