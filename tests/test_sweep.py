"""run_sweep.py --root path: the exact command that will produce the decisive
EuRoC grid if real data ever lands (reference run.bat:4-10 +
results/metrics_summary.csv schema)."""

import csv
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_run_sweep_root_grid(tmp_path, monkeypatch):
    """2 sequences x 2 offsets over a euroc_writer-generated root directory:
    asserts the CSV schema (one row per seq/offset), trajectory txts, and the
    per-sequence plot artifacts."""
    import run_sweep
    from uav_airvision_tpu.config import euroc_config
    from uav_airvision_tpu.simulation.euroc_writer import write_euroc_dataset
    from uav_airvision_tpu.simulation.world import StereoWorld

    root = tmp_path / "euroc"
    for i, seq in enumerate(["SYN_A", "SYN_B"]):
        write_euroc_dataset(StereoWorld(euroc_config(), seed=i), str(root / seq),
                            duration=3.5, seed=i)

    monkeypatch.chdir(tmp_path)  # results/ lands under tmp
    run_sweep.main([
        "--root", str(root),
        "--sequences", "SYN_A", "SYN_B",
        "--offsets", "0", "1",
        "--csv", "results/metrics_summary.csv",
    ])

    with open(tmp_path / "results" / "metrics_summary.csv") as f:
        rows = list(csv.DictReader(f))
    assert [r["dataset"] for r in rows] == [
        "SYN_A_offset0", "SYN_A_offset1", "SYN_B_offset0", "SYN_B_offset1",
    ]
    # reference schema columns (results/metrics_summary.csv header)
    for col in ("dataset", "ate_rmse", "ate_mean", "ate_std",
                "rte_rmse", "rte_mean", "rte_std"):
        assert col in rows[0], f"missing column {col}"
    for r in rows:
        assert np.isfinite(float(r["ate_rmse"]))
        assert float(r["ate_rmse"]) < 0.2

    # trajectory txt per (seq, offset) in the reference naming scheme
    for seq in ("SYN_A", "SYN_B"):
        for off in ("0", "1"):
            p = tmp_path / "results" / "txts" / f"output_{seq}_offset{off}.txt"
            assert p.exists() and p.stat().st_size > 0
    # per-sequence artifact set for the first offset
    for seq in ("SYN_A", "SYN_B"):
        for png in ("trajectories.png", "ate_vs_path.png", "rte_vs_path.png"):
            assert (tmp_path / "results" / seq / png).exists()
