"""Multi-process (multi-host role) sharded pipeline.

Two JAX processes x 4 virtual CPU devices each; gloo collectives play
the DCN role. The demo validates through the reference CLI and checks
bit-identity with the single-process mesh pipeline (the cross-process
ring chain must be exact).
"""

import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def test_multihost_two_process_pipeline():
    env = dict(os.environ, BROTLI_TPU_MH_PORT="12791")
    env.pop("XLA_FLAGS", None)  # demo sets its own device count
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts/multihost_demo.py")],
        capture_output=True, timeout=560, env=env)
    out = r.stdout.decode(errors="replace")
    assert r.returncode == 0, out[-2000:] + r.stderr.decode()[-500:]
    assert "multihost ok: 2 processes" in out
    assert "bit-identical" in out


def test_multihost_four_process_pipeline():
    """N=4 processes x 2 devices: the same mesh program across more
    process boundaries (round-2 gap: only N=2 was exercised)."""
    env = dict(os.environ, BROTLI_TPU_MH_PORT="12795",
               BROTLI_TPU_MH_NPROC="4")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts/multihost_demo.py")],
        capture_output=True, timeout=560, env=env)
    out = r.stdout.decode(errors="replace")
    assert r.returncode == 0, out[-2000:] + r.stderr.decode()[-500:]
    assert "multihost ok: 4 processes" in out
    assert "bit-identical" in out


def test_multihost_failure_path():
    """A worker that dies mid-pipeline exits fast with a distinct
    code; the launcher reaps the blocked peers instead of hanging
    (the library-level elastic-recovery contract)."""
    env = dict(os.environ, BROTLI_TPU_MH_PORT="12797",
               BROTLI_TPU_MH_FAIL="1")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts/multihost_demo.py")],
        capture_output=True, timeout=400, env=env)
    out = r.stdout.decode(errors="replace")
    assert r.returncode == 0, out[-2000:] + r.stderr.decode()[-500:]
    assert "failure path ok" in out
