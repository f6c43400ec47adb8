"""Compact runs-layout upload parity (mer_runs_fill + _densify_runs).

The batched device path ships per-read 128-aligned mer-id blocks instead
of the dense (G,R,S) grid and densifies in-program with a one-hot block
einsum (parallel/batch.py). These tests pin (a) host-side reconstruction
(GapDeviceData.dense_ids) and (b) the in-program densify byte-equal to
the dense mer_grid_fill layout, plus (c) that pack_gap_batch actually
selects runs mode and the engine output is identical either way.
"""
import tempfile

import numpy as np
import pytest

from pomfret_tpu.core.methmer import (extract_mmr_arrays,
                                      get_methmer_sites_and_ranges)
from pomfret_tpu.core.readset import (READBACK, MmrConfig,
                                      load_reads_given_interval)
from pomfret_tpu.io.bam import BamReader
from pomfret_tpu.kernels.engine_jax import _round_up, build_gap_device_data
from pomfret_tpu.parallel.batch import (_densify_runs, pack_gap_batch,
                                        run_gap_batch)
from pomfret_tpu.testing import make_two_block_scenario


@pytest.fixture(scope="module")
def window():
    with tempfile.TemporaryDirectory() as d:
        bam, vcf, truth = make_two_block_scenario(d)
        bamr = BamReader(bam)
        cfg = MmrConfig(cov_for_selection=5, cov_for_runtime=10)
        gs, ge = truth["gap"]
        rs = load_reads_given_interval(bamr, "chr1", gs, ge, READBACK, cfg)
        yield rs, cfg


@pytest.mark.parametrize("direction", [0, 1])
def test_runs_layout_matches_dense(window, direction):
    rs, cfg = window
    ms = get_methmer_sites_and_ranges(rs, cfg, direction)
    res = extract_mmr_arrays(rs, ms)
    assert res is not None, "native methmer extraction unavailable"
    R, S = _round_up(rs.n, 128), _round_up(ms.n, 128)
    dd_d = build_gap_device_data(rs, ms, direction, R, S, mmr_arrays=res)
    dd_r = build_gap_device_data(rs, ms, direction, R, S, mmr_arrays=res,
                                 want_runs=True)
    assert dd_r.blk is not None and dd_r.ids is None
    assert dd_r.blk.shape[1] < S, "runs layout should be narrower than S"
    np.testing.assert_array_equal(dd_r.dense_ids(), dd_d.ids)
    np.testing.assert_array_equal(dd_r.has_mmr, dd_d.has_mmr)
    assert (dd_r.max_d, dd_r.min0, dd_r.max0) == \
        (dd_d.max_d, dd_d.min0, dd_d.max0)

    batch_r = pack_gap_batch([dd_r, dd_r], [10, 10], 14)
    batch_d = pack_gap_batch([dd_d, dd_d], [10, 10], 14)
    assert batch_r.blk is not None and batch_r.ids is None
    dev = np.asarray(_densify_runs(batch_r.blk, batch_r.b0, batch_r.S))
    np.testing.assert_array_equal(dev, batch_d.ids.astype(np.int32))


def test_engine_output_identical_runs_vs_dense(window):
    rs, cfg = window
    datas_r, datas_d = [], []
    for direction in (1, 0):
        ms = get_methmer_sites_and_ranges(rs, cfg, direction)
        res = extract_mmr_arrays(rs, ms)
        assert res is not None
        R, S = _round_up(rs.n, 128), _round_up(ms.n, 128)
        datas_d.append(build_gap_device_data(rs, ms, direction, R, S,
                                             mmr_arrays=res))
        datas_r.append(build_gap_device_data(rs, ms, direction, R, S,
                                             mmr_arrays=res,
                                             want_runs=True))
    b_r = pack_gap_batch(datas_r, [10, 10], 14)
    b_d = pack_gap_batch(datas_d, [10, 10], 14)
    hp_r = run_gap_batch(b_r)
    hp_d = run_gap_batch(b_d)
    np.testing.assert_array_equal(hp_r, hp_d)
