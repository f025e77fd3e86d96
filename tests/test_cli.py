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
