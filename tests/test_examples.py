"""The shipped example scripts actually run (headless, hardware-free) and
produce loadable products — CI-smoked so the docs' entry points can't rot
(the reference's run.sh requires two physical SDRs and is untestable)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["MPLBACKEND"] = "Agg"
    return env


def test_observe_example(tmp_path):
    r = subprocess.run(
        ["bash", os.path.join(REPO, "examples", "observe.sh"),
         "--platform", "cpu", "--time", "1", "--num_samp", "16384",
         "--resolution", "1024", "-L", "WARNING"],
        cwd=tmp_path, env=_env(), capture_output=True, text=True,
        timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    csv = tmp_path / "visibilities_example.csv"
    assert csv.exists() and (tmp_path / "visibilities_example.png").exists()
    data = np.loadtxt(csv, dtype=np.complex128, delimiter=",", skiprows=2)
    assert np.atleast_2d(data).shape[1] == 1024


def test_multihost_example(tmp_path):
    from fxtpu.sources import NoiseSource, save_recording
    rec = save_recording(NoiseSource(nchan=2, seed=5),
                         str(tmp_path / "rec.npy"), 16384, 6)
    env = _env()
    env["FXTPU_COORD"] = "127.0.0.1:9745"  # off the default test ports
    r = subprocess.run(
        ["bash", os.path.join(REPO, "examples", "multihost.sh"), rec,
         "-L", "WARNING"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    data = np.loadtxt("/tmp/vis_mh.csv", dtype=np.complex128,
                      delimiter=",", skiprows=2)
    assert np.atleast_2d(data).shape[1] == 256
