"""CLI override parsing (typed key=value) unit tests."""

import pytest

from tpugraph.cli.main import parse_overrides
from tpugraph.configs import get_config


def test_parse_overrides_types():
    cfg = get_config("base")
    out = parse_overrides(cfg, ["epochs=7", "lr=0.01", "highway=true",
                                "pair=ja_en", "neg_mode=uniform"])
    assert out == {"epochs": 7, "lr": 0.01, "highway": True,
                   "pair": "ja_en", "neg_mode": "uniform"}


def test_parse_overrides_rejects_unknown_key():
    cfg = get_config("base")
    with pytest.raises(SystemExit, match="unknown config key"):
        parse_overrides(cfg, ["bogus=1"])


def test_parse_overrides_rejects_malformed():
    cfg = get_config("base")
    with pytest.raises(SystemExit, match="must be key=value"):
        parse_overrides(cfg, ["epochs"])


def test_recipes_are_valid_config_overrides():
    """Every recipe key must be a TrainConfig field AND a train_oracle
    parameter (the same dict drives both systems in baseline_parity.py)."""
    import inspect

    from tpugraph.configs import RECIPES
    from tpugraph.parity.torch_ref import train_oracle

    oracle_params = set(inspect.signature(train_oracle).parameters)
    for name, recipe in RECIPES.items():
        cfg = get_config("base", **recipe)  # raises on unknown field
        assert cfg.epochs > 0
        missing = set(recipe) - oracle_params
        assert not missing, f"recipe {name}: train_oracle lacks {missing}"


def test_cli_recipe_flag_trains(tmp_path):
    """--recipe applies the tuned table before --set overrides."""
    from tpugraph.cli.main import main

    rc = main(["--recipe", "v1", "--quiet",
               "--set", "epochs=2", "dim=8", "k_neg=2", "syn_n_ent=200",
               "syn_n_triples=600", "eval_every=0", "neg_mode=uniform"])
    assert rc == 0
