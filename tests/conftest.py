"""Test harness config: run everything on a simulated 8-device CPU mesh.

The standard JAX way to test multi-device sharding without a cluster
(SURVEY.md §4.5) is ``JAX_PLATFORMS=cpu`` +
``--xla_force_host_platform_device_count=8``. In this image, a
sitecustomize hook registers a remote-TPU PJRT plugin at interpreter
startup and force-sets ``jax_platforms`` — so env vars alone are not
enough: we must also re-point jax at CPU and drop the plugin's backend
factory before the first backend initialization, otherwise every test run
dials the remote TPU and stalls for minutes.
"""

import os

# GNET_TPU=1 leaves jax on the real TPU for the hardware-marked tests:
#   GNET_TPU=1 python -m pytest -m tpu tests/
# (see BENCHMARKS.md methodology). Everything else runs on the CPU mesh.
_ON_TPU = os.environ.get("GNET_TPU") == "1"

if not _ON_TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")
    try:  # drop any remote-TPU plugin factory so it is never initialized
        from jax._src import xla_bridge as _xb

        _xb._backend_factories.pop("axon", None)
    except Exception:
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_boxes(rng, n, scale=100.0, min_size=2.0, max_size=40.0):
    """Random well-formed xyxy boxes in a [0, scale] canvas."""
    xy = rng.uniform(0, scale, size=(n, 2))
    wh = rng.uniform(min_size, max_size, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


@pytest.fixture(scope="session", autouse=True)
def fresh_native_lib():
    """Rebuild the native library if gossip_native.cc is newer than the
    .so (r5 review): the ABI handshake only catches signature changes,
    so without this a stale same-ABI build silently shadows edited
    source and the whole parity/fuzz suite validates the old binary.
    `make` is a ~50 ms no-op when the build is already fresh."""
    import pathlib

    native_dir = pathlib.Path(__file__).resolve().parents[1] / "native"
    src = native_dir / "gossip_native.cc"
    lib = native_dir / "libgossip_native.so"
    if src.exists() and lib.exists() and \
            src.stat().st_mtime > lib.stat().st_mtime:
        from gossipnet_tpu import native

        assert native.build(), "stale native lib and rebuild failed"
        native._lib, native._load_failed = None, False
