"""CLI surface (parity anchor: c/tools/brotli.c): file roundtrips,
integrity test, coalesced short flags, squash, comment metadata."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_cli(args, data=None, cwd=None):
    return subprocess.run([sys.executable, "-m", "brotli_tpu.cli"] +
                          args, input=data, capture_output=True,
                          cwd=cwd or str(REPO))


def test_file_roundtrip(tmp_path, testdata, ref_cli):
    src = tmp_path / "a.txt"
    src.write_bytes((testdata / "asyoulik.txt").read_bytes())
    r = run_cli(["-q", "5", "-f", str(src)])
    assert r.returncode == 0, r.stderr
    br = tmp_path / "a.txt.br"
    assert br.exists()
    ref = subprocess.run([ref_cli, "-d", "-c", str(br)],
                         capture_output=True)
    assert ref.returncode == 0 and ref.stdout == src.read_bytes()
    # decompress back with -o
    out = tmp_path / "back.txt"
    r = run_cli(["-d", "-f", "-o", str(out), str(br)])
    assert r.returncode == 0, r.stderr
    assert out.read_bytes() == src.read_bytes()
    # -t integrity
    r = run_cli(["-t", str(br)])
    assert r.returncode == 0


def test_stdin_stdout_pipe(testdata):
    data = (testdata / "quickfox").read_bytes()
    comp = run_cli(["-c", "-q", "5"], data=data).stdout
    out = run_cli(["-d", "-c"], data=comp).stdout
    assert out == data


def test_coalesced_flags(tmp_path, testdata, ref_cli):
    """'-5kf' == '-q 5 -k -f' (brotli.c:334 coalesced options)."""
    src = tmp_path / "b.txt"
    src.write_bytes((testdata / "alice29.txt").read_bytes()[:40000])
    r = run_cli(["-5kf", str(src)])
    assert r.returncode == 0, r.stderr
    ref = subprocess.run([ref_cli, "-d", "-c", str(src) + ".br"],
                         capture_output=True)
    assert ref.returncode == 0 and ref.stdout == src.read_bytes()


def test_squash(tmp_path):
    """-s/--squash drops outputs larger than the input."""
    rng = np.random.default_rng(7)
    src = tmp_path / "r.bin"
    src.write_bytes(rng.integers(0, 256, 30000).astype(np.uint8)
                    .tobytes())
    r = run_cli(["-s", "-f", "-q", "5", str(src)])
    assert r.returncode == 0, r.stderr
    assert not (tmp_path / "r.bin.br").exists()
    # squash + stdout is invalid (matches the reference)
    r = run_cli(["-s", "-c", str(src)])
    assert r.returncode == 1


def test_comment_roundtrip(testdata):
    data = (testdata / "quickfox").read_bytes()
    comp = run_cli(["-c", "-q", "5", "--comment", "hello"],
                   data=data).stdout
    out = run_cli(["-d", "-c", "--comment", "hello"], data=comp)
    assert out.returncode == 0 and out.stdout == data
