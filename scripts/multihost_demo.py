"""Multi-process (multi-host role) demo of the sharded pipeline.

Spawns N JAX processes (8/N virtual CPU devices each = an 8-device
"N-host" mesh; gloo plays the DCN role) and runs
parallel.multihost.compress_sharded_mp in all of them. Process 0
validates the stitched stream against the reference CLI and the
launcher checks bit-identity with the single-process mesh pipeline.

Env knobs:
  BROTLI_TPU_MH_NPROC  process count (default 2; must divide 8)
  BROTLI_TPU_MH_FAIL   inject a shard failure in this process id:
                       that worker must exit fast with code 3 and the
                       launcher must detect it and terminate the
                       peers (no hang) -- the failure-path contract
  BROTLI_TPU_MH_PORT   coordinator port

Usage: python scripts/multihost_demo.py            (launcher)
       python scripts/multihost_demo.py WORKER <i> (internal)
"""

import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
PORT = int(os.environ.get("BROTLI_TPU_MH_PORT", "12733"))
NPROC = int(os.environ.get("BROTLI_TPU_MH_NPROC", "2"))
FAIL = os.environ.get("BROTLI_TPU_MH_FAIL")


def payload() -> bytes:
    import numpy as np
    words = [b"information ", b"the quick brown fox ", b"shard ",
             b"multi-host pipeline ", b"entropy coding "]
    rng = np.random.default_rng(3)
    return b"".join(words[i] for i in rng.integers(0, len(words),
                                                   120_000))


def worker(pid: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // NPROC}")
    sys.path.insert(0, str(ROOT))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC, process_id=pid)
    from brotli_tpu.parallel.multihost import compress_sharded_mp
    data = payload()
    if FAIL is not None and int(FAIL) == pid:
        # injected shard failure: a worker that dies mid-pipeline must
        # exit promptly with a distinct code; peers block on the next
        # collective and the LAUNCHER is responsible for reaping them
        # (the elastic-recovery contract: fail fast, never hang)
        print(f"worker {pid}: injected shard failure", flush=True)
        return 3
    t0 = time.time()
    comp = compress_sharded_mp(data, quality=5)
    dt = time.time() - t0
    print(f"worker {pid}: {len(data) / dt / 1e6:.1f} MB/s wall "
          f"({dt:.2f}s incl. cross-process gathers)", flush=True)
    if pid != 0:
        return 0
    ref = ROOT / "build/ref/brotli"
    if ref.exists():
        r = subprocess.run([str(ref), "-d", "-c"], input=comp,
                           capture_output=True)
        assert r.returncode == 0 and r.stdout == data, \
            "multi-host stream rejected by the reference decoder"
        oracle = "reference CLI"
    else:
        import brotli_tpu
        assert brotli_tpu.decompress(comp) == data
        oracle = "in-repo decoder"
    out_path = os.environ.get("BROTLI_TPU_MH_OUT")
    if out_path:
        pathlib.Path(out_path).write_bytes(comp)
    print(f"multihost ok: {NPROC} processes x "
          f"{len(jax.local_devices())} devices, "
          f"{len(data)} -> {len(comp)} bytes, validated by {oracle}",
          flush=True)
    return 0


def launcher_failpath() -> int:
    """Failure-path drill: one worker dies; the launcher must see its
    exit promptly and terminate the blocked peers (no hang)."""
    procs = [subprocess.Popen(
        [sys.executable, __file__, "WORKER", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(NPROC)]
    fail_pid = int(FAIL)
    deadline = time.time() + 240
    failed_rc = None
    while time.time() < deadline:
        rc = procs[fail_pid].poll()
        if rc is not None:
            failed_rc = rc
            break
        time.sleep(0.5)
    for i, p in enumerate(procs):
        if i != fail_pid and p.poll() is None:
            p.terminate()
    for p in procs:
        try:
            p.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
    assert failed_rc == 3, f"injected failure exit code: {failed_rc}"
    print(f"failure path ok: worker {fail_pid} exited 3, "
          f"peers terminated, no hang", flush=True)
    return 0


def launcher() -> int:
    import tempfile
    out_path = tempfile.mktemp(suffix=".br")
    env = dict(os.environ, BROTLI_TPU_MH_OUT=out_path)
    procs = [subprocess.Popen(
        [sys.executable, __file__, "WORKER", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(NPROC)]
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode(errors="replace")
        if i == 0 or p.returncode != 0:
            sys.stdout.write(text)
        rc |= p.returncode
    if rc == 0:
        # bit-identity vs the single-process mesh pipeline: the
        # cross-process ring chain and payload order must reproduce
        # exactly what one process computes
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = \
            "--xla_force_host_platform_device_count=8"
        sys.path.insert(0, str(ROOT))
        import jax
        jax.config.update("jax_platforms", "cpu")
        from brotli_tpu.parallel.shard import compress_sharded
        single = compress_sharded(payload(), quality=5, n_shards=8)
        mp_out = pathlib.Path(out_path).read_bytes()
        os.unlink(out_path)
        assert mp_out == single, (
            f"multi-process stream differs from single-process "
            f"({len(mp_out)} vs {len(single)} bytes)")
        print("bit-identical to the single-process mesh pipeline")
    return rc


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "WORKER":
        sys.exit(worker(int(sys.argv[2])))
    if FAIL is not None:
        sys.exit(launcher_failpath())
    sys.exit(launcher())
