"""The GNET_PAIR_EXP measurement switches must be semantics-preserving.

ops/pallas/pairwise2.py gates r4 VPU-gap experiments behind the
GNET_PAIR_EXP env var. After the r4 head-to-head (scripts/pair_exp.py),
validity-folding won and became the DEFAULT, so the switches are now
"novalidfold" (restores the unfused 3x cmp + 2x and neighbor chain)
and "jexp1" (single broadcast+tile over the stacked j-column plane,
measured neutral). jexp1 is a pure layout change (same lane order);
the validity fold only alters the iou FEATURE of invalid pairs, which
are excluded from the neighbor max, and for valid pairs multiplies by
exactly 1.0f — so every switch combination must match the default
kernel BITWISE, not just within tolerance.

_EXP is frozen at module import, so each setting runs in a fresh
subprocess (CPU interpret mode, conftest-style env); the parent
compares the forward output and input-side gradients bitwise.
"""

import json
import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]

_PAYLOAD = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb
_xb._backend_factories.pop("axon", None)

import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, %(root)r)
from gossipnet_tpu.ops import pair_features as pf
from gossipnet_tpu.ops.pallas.pairwise2 import pallas_pair_pool_v2
from tests.test_pallas_kernel import NEIGHBOR_IOU, _params, _problem

rng = np.random.default_rng(0)
boxes, scores, valid, _ = _problem(rng, b=2, n=160, n_valid=117)
params = _params(np.random.default_rng(0))
cols = pf.det_columns(jnp.asarray(boxes), jnp.asarray(scores),
                      jnp.asarray(valid))
b, n = scores.shape
p = params.wa.shape[1]
r = jnp.asarray(np.random.default_rng(5).normal(
    0, 1, size=(b, n, p)).astype(np.float32))
a = r @ params.wa + params.b1
bb = r @ params.wb
stacked = pf.stack_columns(cols)

def fwd(a, bb):
    return pallas_pair_pool_v2(
        stacked, a, bb, params, NEIGHBOR_IOU,
        interpret=True, compute_dtype="float32")

out, grads = jax.value_and_grad(
    lambda a, bb: jnp.sum(jnp.tanh(fwd(a, bb))), argnums=(0, 1))(a, bb)
full = fwd(a, bb)

# multiclass leg: the class row rides the stacked j-plane under jexp1,
# so its expand path must be covered too
classes = jnp.asarray(np.random.default_rng(7).integers(0, 4, size=(b, n)))
params_mc = _params(np.random.default_rng(1),
                    num_features=pf.NUM_PAIR_FEATURES_MC)
a_mc = r @ params_mc.wa + params_mc.b1
bb_mc = r @ params_mc.wb

def fwd_mc(a, bb):
    return pallas_pair_pool_v2(
        stacked, a, bb, params_mc, NEIGHBOR_IOU, classes=classes,
        interpret=True, compute_dtype="float32")

out_mc, grads_mc = jax.value_and_grad(
    lambda a, bb: jnp.sum(jnp.tanh(fwd_mc(a, bb))),
    argnums=(0, 1))(a_mc, bb_mc)
full_mc = fwd_mc(a_mc, bb_mc)
np.savez(%(out)r, out=np.asarray(full), loss=np.asarray(out),
         da=np.asarray(grads[0]), db=np.asarray(grads[1]),
         mc_out=np.asarray(full_mc), mc_loss=np.asarray(out_mc),
         mc_da=np.asarray(grads_mc[0]), mc_db=np.asarray(grads_mc[1]))
print("OK")
"""


def _run(exp: str, tmp_path: pathlib.Path) -> dict:
    out = tmp_path / f"exp_{exp.replace(',', '_') or 'base'}.npz"
    env = dict(os.environ, GNET_PAIR_EXP=exp)
    # A clean slate: the parent's conftest env (8 fake devices, GNET_TPU)
    # must not leak platform choices into the child.
    env.pop("GNET_TPU", None)
    code = _PAYLOAD % {"root": str(ROOT), "out": str(out)}
    res = subprocess.run([sys.executable, "-c", code], cwd=ROOT, env=env,
                         capture_output=True, text=True, timeout=600)
    assert res.returncode == 0, (
        f"GNET_PAIR_EXP={exp!r} subprocess failed:\n{res.stdout}\n{res.stderr}")
    with np.load(out) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.slow
def test_pair_exp_switches_are_bitwise_exact(tmp_path):
    base = _run("", tmp_path)
    for exp in ("jexp1", "novalidfold", "jexp1,novalidfold"):
        got = _run(exp, tmp_path)
        for key in ("out", "loss", "da", "db",
                    "mc_out", "mc_loss", "mc_da", "mc_db"):
            same = np.array_equal(base[key], got[key])
            assert same, (
                f"GNET_PAIR_EXP={exp!r}: {key} differs from baseline "
                f"(max abs diff "
                f"{np.max(np.abs(base[key] - got[key])):.3e})")
