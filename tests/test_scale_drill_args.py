"""Argument plumbing of scripts/scale_drill.py.

The drill driver has twice grown silent-misbinding bugs (a 'mt' token
bound as the schedule in r3; 'mt'/'alpha=X' swallowed as the tag by the
full arm and alpha discarded by dense4k in r5) whose cost is hours of
TPU compute recorded under the wrong label. These tests pin the parser
and label helpers every arm now routes through.
"""

import importlib.util
import pathlib
import sys

import pytest

_PATH = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "scale_drill.py"


@pytest.fixture(scope="module")
def sd():
    spec = importlib.util.spec_from_file_location("_sd_under_test", _PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_sd_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_flags_parse_at_any_position(sd):
    for argv in (["3000", "1e-3", "cosine", "mt", "alpha=0.8"],
                 ["mt", "3000", "alpha=0.8", "1e-3", "cosine"],
                 ["alpha=0.8", "mt", "3000", "1e-3", "cosine"]):
        steps, lr, schedule, mt, alpha, extra = sd._parse_arm_args(
            argv, "constant")
        assert (steps, lr, schedule, mt, alpha, extra) == (
            3000, 1e-3, "cosine", True, 0.8, [])


def test_extra_positionals_returned_not_swallowed(sd):
    steps, lr, schedule, mt, alpha, extra = sd._parse_arm_args(
        ["3000", "1e-3", "cosine", "mytag", "mt", "alpha=0.5"], "constant")
    assert extra == ["mytag"] and mt and alpha == 0.5


def test_defaults(sd):
    assert sd._parse_arm_args([], "cosine") == (
        3000, 1e-3, "cosine", False, 0.0, [])


def test_alpha_label_exact_percent_and_collision_proof(sd):
    assert sd._alpha_label(0) == ""
    assert sd._alpha_label(0.5) == "a50"
    assert sd._alpha_label(0.8) == "a80"
    # distinct alphas may NEVER share a label (dataset prefix /
    # checkpoint dir) through 2-digit rounding
    assert sd._alpha_label(0.804) != sd._alpha_label(0.8)
    assert sd._alpha_label(0.004) not in ("", sd._alpha_label(0.0))
    labels = {sd._alpha_label(a) for a in
              (0.1, 0.15, 0.2, 0.25, 0.5, 0.55, 0.8, 0.804, 0.85)}
    assert len(labels) == 9


def test_with_alpha_density(sd):
    assert sd._with_alpha(None, 0.0) == {}
    d = {"gt_range": (1, 2)}
    out = sd._with_alpha(d, 0.8)
    assert out == {"gt_range": (1, 2), "score_corr": 0.8}
    assert "score_corr" not in d          # input not mutated
    assert sd._with_alpha(d, 0.0) == d
