"""Config-1 golden-logits integration test (SURVEY.md §4.3).

A checked-in fixture pins the exact function computed by the 1-block
GossipNet inference slice: fixed inputs + fixed parameters -> logits.
Catches silent numerical drift in any layer of the stack (features,
pair pooling, block wiring, head). Regenerate deliberately with
scripts/make_golden_fixture.py when the model definition changes.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.models.gossipnet import GossipNet

FIXTURE = Path(__file__).parent / "fixtures" / "golden_config1.npz"


def _load():
    data = np.load(FIXTURE)
    params = {}
    for key in data.files:
        if not key.startswith("param:"):
            continue
        path = key[len("param:"):].split("/")
        node = params
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = jnp.asarray(data[key])
    return data, params


def test_golden_logits_dense():
    data, params = _load()
    cfg = ModelConfig(num_blocks=1, feature_dim=128, reduced_dim=32,
                      pairwise_dim=32, pair_matmul_dtype="float32")
    model = GossipNet(cfg, pool_impl="dense")
    logits = model.apply(
        {"params": params},
        jnp.asarray(data["boxes"]), jnp.asarray(data["scores"]),
        jnp.asarray(data["valid"]),
    )
    np.testing.assert_allclose(
        np.asarray(logits), data["logits"], rtol=1e-4, atol=1e-4
    )


def test_golden_logits_pallas_interpret():
    data, params = _load()
    cfg = ModelConfig(num_blocks=1, feature_dim=128, reduced_dim=32,
                      pairwise_dim=32, pair_matmul_dtype="float32")
    model = GossipNet(cfg, pool_impl="pallas")
    logits = model.apply(
        {"params": params},
        jnp.asarray(data["boxes"]), jnp.asarray(data["scores"]),
        jnp.asarray(data["valid"]),
    )
    np.testing.assert_allclose(
        np.asarray(logits), data["logits"], rtol=1e-3, atol=1e-3
    )
