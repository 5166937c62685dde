"""Every config knob must change behavior when moved off its default.

VERDICT r1 'honest config schema': a documented knob that is consumed
nowhere is worse than none. These tests flip each previously-dead knob
and assert observable behavior changes (or that the knob is gone).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gossipnet_tpu.config import (
    Config, LossConfig, MatchingConfig, ModelConfig, TrainConfig,
    load_config,
)
from gossipnet_tpu.data.bucketing import BatchIterator
from gossipnet_tpu.data.synthetic import synthetic_roidb
from gossipnet_tpu.losses import matching_loss
from gossipnet_tpu.models.gossipnet import GossipNet
from gossipnet_tpu.train import batch_to_device, build_model, create_train_state


def _small_model(**kw):
    base = dict(num_blocks=2, feature_dim=32, reduced_dim=16,
                pairwise_dim=16, pair_matmul_dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def _setup(cfg):
    roidb = synthetic_roidb(num_images=8, seed=0,
                            num_classes=cfg.model.num_classes)
    it = BatchIterator(roidb, 4, cfg.data.bucket_sizes, seed=0)
    batch = next(it)
    model = build_model(cfg)
    state = create_train_state(cfg, model, batch)
    return model, state, batch_to_device(batch)


# ---------------------------------------------------------------- remat


def test_remat_blocks_same_math_different_jaxpr():
    cfg_off = Config(model=_small_model())
    cfg_on = dataclasses.replace(
        cfg_off, train=TrainConfig(remat_blocks=True))
    model_off, state, arrays = _setup(cfg_off)
    model_on = build_model(cfg_on)
    assert model_on.remat and not model_off.remat

    def fwd(model):
        return model.apply({"params": state.params}, arrays["boxes"],
                           arrays["scores"], arrays["valid"])

    np.testing.assert_allclose(
        np.asarray(fwd(model_off)), np.asarray(fwd(model_on)),
        rtol=1e-6, atol=1e-7,
    )

    def loss(model, params):
        return jnp.sum(model.apply({"params": params}, arrays["boxes"],
                                   arrays["scores"], arrays["valid"]) ** 2)

    g_off = jax.grad(lambda p: loss(model_off, p))(state.params)
    g_on = jax.grad(lambda p: loss(model_on, p))(state.params)
    for x, y in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)

    # The knob must actually alter the computation graph: a remat
    # (checkpoint) equation appears only when enabled.
    jaxpr_on = str(jax.make_jaxpr(
        jax.grad(lambda p: loss(model_on, p)))(state.params))
    jaxpr_off = str(jax.make_jaxpr(
        jax.grad(lambda p: loss(model_off, p)))(state.params))
    assert "remat" in jaxpr_on
    assert "remat" not in jaxpr_off


def test_remat_spmd_forward_parity():
    from gossipnet_tpu.parallel.spmd import gossipnet_sharded_forward

    cfg = Config(model=_small_model())
    model, state, arrays = _setup(cfg)
    ref = model.apply({"params": state.params}, arrays["boxes"],
                      arrays["scores"], arrays["valid"])
    got = gossipnet_sharded_forward(
        state.params, cfg.model, arrays["boxes"], arrays["scores"],
        arrays["valid"], num_shards=1, interpret=True, remat=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------------- crowd_as_ignore


def _crowd_arrays():
    """One image: 1 real GT + 1 crowd GT; det0 on the real GT, det1 on
    the crowd region only, det2 in empty space."""
    boxes = jnp.asarray([[[0., 0., 10., 10.],
                          [100., 100., 120., 120.],
                          [300., 300., 310., 310.]]])
    gt_boxes = jnp.asarray([[[0., 0., 10., 10.],
                             [95., 95., 130., 130.]]])
    return {
        "boxes": boxes,
        "scores": jnp.asarray([[0.9, 0.8, 0.7]]),
        "valid": jnp.ones((1, 3), bool),
        "classes": jnp.zeros((1, 3), jnp.int32),
        "gt_boxes": gt_boxes,
        "gt_classes": jnp.zeros((1, 2), jnp.int32),
        "gt_valid": jnp.ones((1, 2), bool),
        "gt_crowd": jnp.asarray([[False, True]]),
    }


def test_crowd_as_ignore_changes_loss():
    arrays = _crowd_arrays()
    logits = jnp.asarray([[2.0, 2.0, -2.0]])
    cfg_ign = Config(matching=MatchingConfig(crowd_as_ignore=True))
    cfg_neg = Config(matching=MatchingConfig(crowd_as_ignore=False))
    loss_ign, m_ign = matching_loss(logits, arrays, cfg_ign)
    loss_neg, m_neg = matching_loss(logits, arrays, cfg_neg)
    # Ignored: det1 (crowd-covered, unmatched, confident) costs nothing.
    # As-negative: its +2 logit is now a confidently wrong negative ->
    # strictly larger loss.
    assert float(loss_neg) > float(loss_ign) + 0.1
    assert float(m_ign["num_pos"]) == float(m_neg["num_pos"]) == 1.0


# ------------------------------------------------------------ normalize


def test_loss_normalize_per_batch_differs_and_pools():
    """Heterogeneous batch: img0 = 1 easy pos + 1 easy neg; img1 = no GT,
    two confidently-wrong negatives. per_image averages the two image
    losses; per_batch pools weights across images (neg mass spreads over
    3 dets), so the values must differ."""
    arrays = {
        "boxes": jnp.asarray([
            [[0., 0., 10., 10.], [50., 50., 60., 60.]],
            [[0., 0., 10., 10.], [50., 50., 60., 60.]],
        ]),
        "scores": jnp.asarray([[0.9, 0.8], [0.9, 0.8]]),
        "valid": jnp.ones((2, 2), bool),
        "classes": jnp.zeros((2, 2), jnp.int32),
        "gt_boxes": jnp.asarray([[[0., 0., 10., 10.]],
                                 [[0., 0., 0., 0.]]]),
        "gt_classes": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.asarray([[True], [False]]),
        "gt_crowd": jnp.zeros((2, 1), bool),
    }
    logits = jnp.asarray([[3.0, -3.0], [2.0, 2.0]])
    cfg_img = Config(loss=LossConfig(normalize="per_image"))
    cfg_bat = Config(loss=LossConfig(normalize="per_batch"))
    l_img, _ = matching_loss(logits, arrays, cfg_img)
    l_bat, _ = matching_loss(logits, arrays, cfg_bat)
    assert not np.isclose(float(l_img), float(l_bat), rtol=0.05)

    # Pooling sanity: a batch of IDENTICAL images gives the same value
    # under both modes.
    rep = {k: jnp.concatenate([v[:1]] * 4, axis=0)
           for k, v in arrays.items()}
    rep_logits = jnp.concatenate([logits[:1]] * 4, axis=0)
    li, _ = matching_loss(rep_logits, rep, cfg_img)
    lb, _ = matching_loss(rep_logits, rep, cfg_bat)
    np.testing.assert_allclose(float(li), float(lb), rtol=1e-5)


def test_loss_normalize_unknown_raises():
    arrays = _crowd_arrays()
    cfg = Config(loss=LossConfig(normalize="bogus"))
    with pytest.raises(ValueError, match="normalize"):
        matching_loss(jnp.zeros((1, 3)), arrays, cfg)


# ------------------------------------------- expand_hidden_layers depth


def test_expand_hidden_layers_changes_params_and_output():
    cfg2 = Config(model=_small_model())
    cfg3 = Config(model=_small_model(expand_hidden_layers=3))
    model2, state2, arrays = _setup(cfg2)
    model3, state3, _ = _setup(cfg3)
    b0_2 = state2.params["block_0"]
    b0_3 = state3.params["block_0"]
    assert "expand_h1" not in b0_2
    assert "expand_h1" in b0_3
    out = model3.apply({"params": state3.params}, arrays["boxes"],
                       arrays["scores"], arrays["valid"])
    assert np.all(np.isfinite(np.asarray(out)[np.asarray(arrays["valid"])]))


def test_expand_hidden_layers_spmd_parity():
    from gossipnet_tpu.parallel.spmd import gossipnet_sharded_forward

    cfg = Config(model=_small_model(expand_hidden_layers=3))
    model, state, arrays = _setup(cfg)
    ref = model.apply({"params": state.params}, arrays["boxes"],
                      arrays["scores"], arrays["valid"])
    got = gossipnet_sharded_forward(
        state.params, cfg.model, arrays["boxes"], arrays["scores"],
        arrays["valid"], num_shards=1, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


# ------------------------------------------------- removed / strict keys


def test_pair_hidden_layers_removed():
    assert not hasattr(ModelConfig(), "pair_hidden_layers")
    with pytest.raises(KeyError, match="pair_hidden_layers"):
        load_config(overrides={"model": {"pair_hidden_layers": 3}})


# ---------------------------------------------------------- pair_kernel
def test_pair_kernel_knob_selects_kernel():
    """pair_kernel=1 (r2 layout) and 2 (packed v2) must both run, agree
    numerically, and actually lower different kernels (knob consumed)."""
    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 150, (2, 48, 2)).astype(np.float32)
    wh = rng.uniform(10, 50, (2, 48, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores = jnp.asarray(rng.uniform(0, 1, (2, 48)).astype(np.float32))
    valid = jnp.ones((2, 48), bool)

    outs, jaxprs = [], []
    for version in (1, 2):
        cfg = _small_model(pair_kernel=version)
        model = GossipNet(cfg, pool_impl="pallas")
        params = model.init(jax.random.key(0), boxes, scores, valid)["params"]
        fn = lambda s: model.apply({"params": params}, boxes, s, valid)
        outs.append(np.asarray(fn(scores)))
        jaxprs.append(str(jax.make_jaxpr(fn)(scores)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)
    assert jaxprs[0] != jaxprs[1]


# ------------------------------------------------ shipped experiment YAMLs
def test_shipped_experiment_yamls_validate():
    """Every experiments/*.yaml must load through the schema-validating
    config path — catches knob drift in the shipped configs (a stale
    key raises KeyError, an out-of-domain threshold raises ValueError).
    """
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "experiments"
    yamls = sorted(root.glob("*.yaml"))
    assert len(yamls) >= 6, f"experiments/ looks incomplete: {yamls}"
    for y in yamls:
        cfg = load_config(str(y))
        for t in cfg.matching.thresholds:
            assert 0.0 < t <= 1.0
