import json
import os
import subprocess
import sys

import numpy as np
import pytest

from respatpu.bench import corpus, runner
from respatpu.bench.corpus import load_matrix


def test_corpus_registry_complete():
    assert len(corpus.MODERATE) == 21
    assert len(corpus.BIG) == 15
    assert len(corpus.ALL) == 36
    names = {e.name for e in corpus.ALL}
    assert "2cubes_sphere" in names and "Serena" in names


def test_load_matrix_synthetic_scaling():
    a, synth = load_matrix("2cubes_sphere", max_synth_nnz=100_000)
    assert synth  # no real corpus in CI environment
    assert a.nnz <= 250_000  # scaled down
    assert a.shape[0] == a.shape[1]


def test_sweep_spmv_small(tmp_path):
    csv_path = str(tmp_path / "spmv.csv")
    rows = runner.sweep_spmv(["2cubes_sphere", "dc1"], csv_path=csv_path,
                             reps=1, max_synth_nnz=30_000, verbose=False)
    assert len(rows) == 2
    assert float(rows[0]["mean_abs_err"]) < 1e-3
    # CSV is append-mode resumable
    rows2 = runner.sweep_spmv(["Baumann"], csv_path=csv_path, reps=1,
                              max_synth_nnz=30_000, verbose=False)
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 4  # header + 3 rows


def test_sweep_lu_small(tmp_path):
    rows = runner.sweep_lu(["2cubes_sphere"], policy="fp32",
                           max_synth_nnz=20_000, verbose=False)
    assert rows[0]["status"] == "ok"
    assert float(rows[0]["rel_residual"]) < 1e-9


def test_sweep_ilu0_small(tmp_path):
    rows = runner.sweep_ilu0(["Baumann"], policy="fp32", sweeps=6,
                             max_synth_nnz=20_000, verbose=False)
    assert int(rows[0]["pivots_perturbed"]) >= 0
