"""Smoke: the quickstart example runs end-to-end."""

import pathlib
import subprocess
import sys


def test_quickstart_runs():
    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {
        "PYTHONPATH": str(repo),
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "HOME": "/tmp",
    }
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "quickstart.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Sharded MPC" in out.stdout


def test_swingup_runs():
    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {
        "PYTHONPATH": str(repo),
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "HOME": "/tmp",
    }
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "swingup.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "balanced upright" in out.stdout


def test_hover_runs():
    repo = pathlib.Path(__file__).resolve().parents[1]
    env = {
        "PYTHONPATH": str(repo),
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "JAX_PLATFORMS": "cpu",
        "HOME": "/tmp",
    }
    out = subprocess.run(
        [sys.executable, str(repo / "examples" / "hover.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "corridor" in out.stdout
