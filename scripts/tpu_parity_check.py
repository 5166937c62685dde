import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from gossipnet_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from gossipnet_tpu.config import ModelConfig
from gossipnet_tpu.models.gossipnet import GossipNet
from __graft_entry__ import _synthetic_arrays

d = _synthetic_arrays(batch=4, n=512, seed=3)
boxes = jnp.asarray(d.boxes); scores = jnp.asarray(d.scores); valid = jnp.asarray(d.valid)

cfg32 = ModelConfig(num_blocks=2, feature_dim=64, reduced_dim=32, pairwise_dim=32,
                    pair_matmul_dtype="float32")
dense = GossipNet(cfg32, pool_impl="dense")
pallas = GossipNet(cfg32, pool_impl="pallas")
# no-sparse variant
cfg_nosparse = ModelConfig(num_blocks=2, feature_dim=64, reduced_dim=32, pairwise_dim=32,
                           pair_matmul_dtype="float32", block_sparse=False)
pallas_ns = GossipNet(cfg_nosparse, pool_impl="pallas")
params = dense.init(jax.random.key(0), boxes, scores, valid)["params"]
out_d = jax.jit(dense.apply)({"params": params}, boxes, scores, valid)
out_p = jax.jit(pallas.apply)({"params": params}, boxes, scores, valid)
out_pn = jax.jit(pallas_ns.apply)({"params": params}, boxes, scores, valid)
print("dense vs pallas(sparse):   max abs diff", float(jnp.max(jnp.abs(out_d-out_p))), flush=True)
print("dense vs pallas(nosparse): max abs diff", float(jnp.max(jnp.abs(out_d-out_pn))), flush=True)
print("pallas out sample:", np.asarray(out_p)[0,:4], flush=True)
print("dense  out sample:", np.asarray(out_d)[0,:4], flush=True)
print("DONE", flush=True)
