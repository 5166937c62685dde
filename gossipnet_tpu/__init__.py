"""gossipnet_tpu — a TPU-native learned-NMS framework.

A from-scratch, TPU-first rebuild of the capabilities of hosang/gossipnet
(GossipNet, "Learning non-maximum suppression", Hosang et al., CVPR 2017,
arXiv:1705.02950). The reference is a TensorFlow-1.x research repo whose
mount was empty during the survey (see SURVEY.md header); this framework is
built from the behavioral spec in SURVEY.md §2 and the paper.

Design (idiomatic JAX/XLA/Pallas — NOT a port):

- Static shapes everywhere: detections padded to bucketed N, validity masks
  instead of the reference's dynamic ``tf.where`` pair lists
  (reference: nms_net/network.py, dynamic pair construction).
- The O(N^2) pairwise-IoU / pair-feature / neighbor-max stage is a tiled
  Pallas kernel with a streaming (flash-style) running max, so the N x N
  pair tensor is never materialized in HBM (reference computed it densely
  in-graph).
- The reference's custom C++ CPU op for greedy det<->GT matching
  (reference: matching_module/det_matching.cc) is a vectorized XLA
  ``lax.scan`` over score order — fully jittable, batched, and
  multi-threshold parallel.
- Training is a jitted optax step with orbax checkpointing; batched sharded
  inference runs under ``shard_map`` over a (data, detection) device mesh.
"""

__version__ = "0.1.0"

from gossipnet_tpu.config import Config, load_config  # noqa: F401

# Heavier entry points resolve lazily so `import gossipnet_tpu` stays
# cheap (config-only) and jax/flax initialize only when actually used.
_LAZY = {
    # NB: no entry may share a name with a SUBMODULE (e.g. "train"):
    # importing the submodule sets it as a package attribute, which
    # would shadow the lazy entry non-deterministically. Use
    # gossipnet_tpu.train.train / .evaluate.evaluate_model directly.
    "Rescorer": ("gossipnet_tpu.api", "Rescorer"),
    "ArtifactRescorer": ("gossipnet_tpu.utils.model_artifact",
                         "ArtifactRescorer"),
    "export_artifact": ("gossipnet_tpu.utils.model_artifact",
                        "export_artifact"),
    "build_model": ("gossipnet_tpu.train", "build_model"),
    "evaluate_model": ("gossipnet_tpu.evaluate", "evaluate_model"),
    "TcpServer": ("gossipnet_tpu.serving", "TcpServer"),
}

__all__ = ["Config", "load_config", *sorted(_LAZY)]


def __getattr__(name: str):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
