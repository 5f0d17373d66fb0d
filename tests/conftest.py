import os
import pathlib
import subprocess

# Virtual 8-device CPU mesh for sharding tests. The machine environment
# exports JAX_PLATFORMS=axon (the TPU tunnel) and this JAX build IGNORES
# the env var (the axon plugin registers regardless), so running tests
# through the tunnel means minutes-long remote kernel compiles. The only
# reliable switch is jax.config.update BEFORE the backend initializes;
# do that here and fail loudly if it did not take.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got backend "
    f"{jax.default_backend()!r}; jax.config jax_platforms pin failed")
assert len(jax.devices()) == 8, len(jax.devices())

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
TESTDATA = pathlib.Path("/root/reference/tests/testdata")
REF_CLI = REPO / "build" / "ref" / "brotli"


@pytest.fixture(scope="session")
def ref_cli():
    """Reference brotli CLI (differential oracle); builds it if needed."""
    if not REF_CLI.exists():
        build = REPO / "build" / "ref"
        build.mkdir(parents=True, exist_ok=True)
        subprocess.run(["cmake", "-GNinja", "-DCMAKE_BUILD_TYPE=Release",
                        "/root/reference"], cwd=build, check=True,
                       capture_output=True)
        subprocess.run(["ninja", "brotli"], cwd=build, check=True,
                       capture_output=True)
    return str(REF_CLI)


@pytest.fixture(scope="session")
def testdata():
    if not TESTDATA.exists():
        pytest.skip("reference testdata not available")
    return TESTDATA


def ref_decompress(ref_cli, data: bytes):
    r = subprocess.run([ref_cli, "-d", "-c"], input=data,
                       capture_output=True)
    return r.returncode, r.stdout


def ref_compress(ref_cli, data: bytes, quality: int):
    r = subprocess.run([ref_cli, "-c", "-q", str(quality)], input=data,
                       capture_output=True)
    assert r.returncode == 0
    return r.stdout
