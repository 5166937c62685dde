"""Installed-package smoke test (VERDICT r4 #5).

"Public API mirrors the reference" implies consumers who pip-install
rather than clone: the wheel must carry the C++ fast paths (as the
``gossipnet_tpu._gossip_native`` extension built by setup.py) and the
shipped experiment YAMLs, and ``gossipnet_tpu.native`` must resolve the
library from the installed layout — previously it only looked at
``<repo>/native/`` and installed consumers silently dropped to numpy
fallbacks (~6.5x slower eval sweep, BENCHMARKS.md).

Builds the wheel, installs it into an isolated --target dir, and runs a
smoke script FROM that install (neutral cwd so the repo checkout cannot
shadow it): native fast path present, experiment YAMLs resolvable,
evaluator correct, serve CLI importable.
"""

import os
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

SMOKE = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb
_xb._backend_factories.pop("axon", None)

import numpy as np
import gossipnet_tpu
site = os.environ["GNET_SITE"]
assert gossipnet_tpu.__file__.startswith(site), gossipnet_tpu.__file__
from gossipnet_tpu import native
assert native.available(), "native fast path missing in installed layout"
assert str(native._find_lib()).startswith(site), native._find_lib()

from gossipnet_tpu.config import experiment_path, load_config
cfg = load_config(experiment_path("coco_persons_best"))
assert cfg.model.num_blocks == 16

from gossipnet_tpu.eval.cocoeval import COCOEvaluator
ev = COCOEvaluator(num_classes=1)
ev.add_arrays(0, np.array([[0, 0, 10, 10.]]), np.array([0.9]),
              np.array([0]), np.array([[0, 0, 10, 10.]]),
              np.array([0]), np.array([False]))
assert ev._use_native()
assert abs(ev.summarize()["AP"] - 1.0) < 1e-9

from gossipnet_tpu.api import Rescorer  # noqa: F401 (lazy surface)
print("INSTALL_SMOKE_OK")
"""


@pytest.mark.slow
def test_wheel_installs_with_native_and_experiments(tmp_path):
    wheel_dir = tmp_path / "wheels"
    site = tmp_path / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(ROOT), "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir)],
        check=True, capture_output=True, text=True)
    wheels = list(wheel_dir.glob("gossipnet_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--target", str(site), str(wheels[0])],
        check=True, capture_output=True, text=True)
    assert list(site.glob("gossipnet_tpu/_gossip_native*.so"))
    assert (site / "gossipnet_tpu/experiments/coco_persons_best.yaml"
            ).exists()

    env = dict(os.environ,
               PYTHONPATH=str(site), GNET_SITE=str(site))
    env.pop("GOSSIP_NATIVE_LIB", None)
    # Neutral cwd: the repo checkout must NOT be importable, so the
    # smoke proves the INSTALLED layout end to end.
    out = subprocess.run(
        [sys.executable, "-c", SMOKE], cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "INSTALL_SMOKE_OK" in out.stdout

    # The serve CLI entry must import and print usage from the install.
    out = subprocess.run(
        [sys.executable, "-m", "gossipnet_tpu.serve", "--help"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "usage" in out.stdout.lower()
