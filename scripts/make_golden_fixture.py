"""Generate the config-1 golden-logits fixture (tests/fixtures/)."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
try:
    from jax._src import xla_bridge as xb
    xb._backend_factories.pop("axon", None)
except Exception:
    pass
import numpy as np, jax.numpy as jnp
from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.data.bucketing import make_batch
from gossipnet_tpu.data.synthetic import synthetic_record
from gossipnet_tpu.models.gossipnet import GossipNet

rng = np.random.default_rng(2026)
records = [synthetic_record(rng, image_id=i, num_gt=12, dets_per_gt=6,
                            num_clutter=16) for i in range(2)]
batch = make_batch(records, padded_n=128)
cfg = ModelConfig(num_blocks=1, feature_dim=128, reduced_dim=32,
                  pairwise_dim=32, pair_matmul_dtype="float32")
model = GossipNet(cfg, pool_impl="dense")
boxes = jnp.asarray(batch.boxes); scores = jnp.asarray(batch.scores)
valid = jnp.asarray(batch.valid)
params = model.init(jax.random.key(42), boxes, scores, valid)["params"]
logits = model.apply({"params": params}, boxes, scores, valid)

flat = jax.tree_util.tree_flatten_with_path(params)[0]
param_blob = {"/".join(str(k.key) for k in path): np.asarray(v)
              for path, v in flat}
np.savez_compressed(
    "tests/fixtures/golden_config1.npz",
    boxes=batch.boxes, scores=batch.scores, valid=batch.valid,
    logits=np.asarray(logits),
    **{f"param:{k}": v for k, v in param_blob.items()},
)
print("wrote fixture; logits sample:", np.asarray(logits)[0, :4])
