"""Package-level API contract: lazy attributes must never shadow (or be
shadowed by) submodules."""
import importlib


def test_lazy_names_disjoint_from_submodules():
    import gossipnet_tpu as g

    for name in g._LAZY:
        assert not (importlib.util.find_spec(f"gossipnet_tpu.{name}")), \
            f"lazy attr {name!r} collides with a submodule"


def test_train_is_the_submodule_and_lazy_attrs_resolve():
    import gossipnet_tpu as g
    import gossipnet_tpu.train as train_mod

    # 'train' must deterministically be the submodule (callable train()
    # lives at gossipnet_tpu.train.train)
    assert g.train is train_mod
    assert callable(g.train.train)
    # lazy entries resolve to the real objects
    from gossipnet_tpu.api import Rescorer
    assert g.Rescorer is Rescorer
    assert g.build_model is train_mod.build_model
