"""Two-process multi-host demo of the sharded pipeline.

Spawns 2 JAX processes (4 virtual CPU devices each = an 8-device
"2-host" mesh; gloo plays the DCN role) and runs
parallel.multihost.compress_sharded_mp in both. Process 0 validates
the stitched stream against the reference CLI and checks bit-identity
with the single-process mesh pipeline.

Usage: python scripts/multihost_demo.py            (launcher)
       python scripts/multihost_demo.py WORKER <i> (internal)
"""

import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
PORT = int(os.environ.get("BROTLI_TPU_MH_PORT", "12733"))
NPROC = 2


def payload() -> bytes:
    import numpy as np
    words = [b"information ", b"the quick brown fox ", b"shard ",
             b"multi-host pipeline ", b"entropy coding "]
    rng = np.random.default_rng(3)
    return b"".join(words[i] for i in rng.integers(0, len(words),
                                                   120_000))


def worker(pid: int) -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, str(ROOT))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=NPROC, process_id=pid)
    from brotli_tpu.parallel.multihost import compress_sharded_mp
    data = payload()
    comp = compress_sharded_mp(data, quality=5)
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
    sys.exit(launcher())
