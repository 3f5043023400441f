"""Smoke coverage for the analysis tools (pc_sweep, snp_grid): one cell
each, asserting the scoring plumbing produces sane, complete records (the
full grids are runtime-heavy and their captured outputs live in docs/)."""

import os
import tempfile


def test_snp_grid_cell_scores_both_models():
    from duet_tpu.tools.snp_grid import run_cell

    cell = run_cell(coverage=12.0, sub_error=0.02, seed=202)
    for model in ("counts", "nn"):
        r = cell[model]
        assert 0.0 <= r["precision"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        assert r["truth"] > 0 and r["called"] > 0
        assert r["f1"] > 0.5, r  # 12x clean reads: both callers work


def test_pc_sweep_run_at_scale(tmp_path):
    from duet_tpu.sim import SimConfig, simulate_dataset
    from duet_tpu.tools.pc_sweep import run_at_scale

    d = str(tmp_path / "data")
    simulate_dataset(d, SimConfig(contigs={"chr21": 150_000}, seed=31,
                                  coverage=14.0))
    r = run_at_scale(d, scale=10, out=str(tmp_path / "out"))
    assert r["phased_calls"] > 0
    assert 0.0 <= r["phasing_f1"] <= 1.0
    assert len(r["decisions"]) == r["phased_calls"]
