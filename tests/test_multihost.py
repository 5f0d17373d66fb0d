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
