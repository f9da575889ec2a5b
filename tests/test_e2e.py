"""End-to-end accuracy gates (the reference's QA model, SURVEY §4: golden
numbers + statistical tolerance). Real-data gates need the real datasets;
these gates assert the full train stack *learns* on the planted synthetic
signal, which catches broken gradients/masks/aggregation wiring."""

import subprocess
import sys
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script, *args, timeout=900):
    env = dict(os.environ, DGL_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def _final_test(out):
    import re

    m = re.findall(r"Final Test: ([0-9.]+)", out)
    assert m, out[-2000:]
    return float(m[-1])


def test_cora_sage_accuracy_gate():
    out = _run("benchmarks/node_classification/main_sage.py",
               "--dataset", "cora", "--epochs", "30", "--runs", "1", "--eval")
    assert _final_test(out) > 75.0  # synthetic cora, 140-node train set


def test_cora_sage_precompute_matches_exactly():
    a = _run("benchmarks/node_classification/main_sage.py",
             "--dataset", "cora", "--epochs", "10", "--runs", "1", "--eval")
    b = _run("benchmarks/node_classification/main_sage.py",
             "--dataset", "cora", "--epochs", "10", "--runs", "1", "--eval",
             "--no-precompute")
    assert abs(_final_test(a) - _final_test(b)) < 1e-6


def test_ns_sage_learns():
    out = _run("benchmarks/sampling/ns_sage.py",
               "--dataset", "cora", "--num-epochs", "8", "--batch-size", "64",
               "--fan-out", "5,5", "--eval-every", "7")
    import re

    accs = re.findall(r"Test Acc: ([0-9.]+)", out)
    assert accs and float(accs[-1]) > 0.7
