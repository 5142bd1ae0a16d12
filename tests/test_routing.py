"""Config-owned kernel routing (pulpo_tpu/routing.py, VERDICT r4 #8):
precedence env > config > registry default, activation via the model
API, serialization round-trips, and the program-surface warning."""

from __future__ import annotations

import logging

import pytest

from pulpo_tpu import routing
from pulpo_tpu.config import PULPoConfig


@pytest.fixture(autouse=True)
def clean_routing():
    routing.activate(())
    yield
    routing.activate(())


def test_registry_default(monkeypatch):
    monkeypatch.delenv("PULPO_WARP_HALO", raising=False)
    assert routing.get("PULPO_WARP_HALO") == "2,3"


def test_config_overrides_default(monkeypatch):
    monkeypatch.delenv("PULPO_WARP_HALO", raising=False)
    routing.activate((("PULPO_WARP_HALO", "2"),))
    assert routing.get("PULPO_WARP_HALO") == "2"


def test_env_overrides_config(monkeypatch):
    routing.activate((("PULPO_WARP_HALO", "2"),))
    monkeypatch.setenv("PULPO_WARP_HALO", "3")
    assert routing.get("PULPO_WARP_HALO") == "3"


def test_unknown_knob_rejected():
    with pytest.raises(KeyError):
        routing.activate((("PULPO_TYPO", "1"),))


def test_model_init_activates_config_routing(monkeypatch):
    from pulpo_tpu.models.api import PULPoModel

    monkeypatch.delenv("PULPO_WARP_COARSE", raising=False)
    cfg = PULPoConfig(input_size=(8, 8, 8), total_levels=2, latent_levels=1,
                      n0=2, dataset="synthetic",
                      routing=(("PULPO_WARP_COARSE", "1"),))
    PULPoModel(cfg)
    assert routing.get("PULPO_WARP_COARSE") == "1"


def test_config_json_roundtrip():
    cfg = PULPoConfig(input_size=(8, 8, 8), total_levels=2, latent_levels=1,
                      n0=2, dataset="synthetic",
                      routing=(("PULPO_WARP_COARSE", "1"),))
    cfg2 = PULPoConfig.from_json(cfg.to_json())
    assert cfg2.routing == (("PULPO_WARP_COARSE", "1"),)
    assert hash(cfg2) is not None  # stays jit-static


def test_resolved_table_covers_every_knob(monkeypatch):
    table = routing.resolved_table()
    assert set(table) == set(routing.KNOBS)


def test_surface_knob_warning(caplog, monkeypatch):
    """The trace-time guard (VERDICT r4 weak #9): compiling extra
    cascade branches logs a warning naming the knob."""
    monkeypatch.delenv("PULPO_WARP_COARSE", raising=False)
    with caplog.at_level(logging.WARNING, logger="pulpo_tpu.routing"):
        routing.activate((("PULPO_WARP_COARSE", "1"),))
    assert any("PULPO_WARP_COARSE" in r.getMessage()
               for r in caplog.records)


def test_overlay_merges_and_env_still_wins(monkeypatch):
    routing.activate(())
    routing.overlay({"PULPO_WARP_COARSE": "1"})
    assert routing.get("PULPO_WARP_COARSE") == "1"
    monkeypatch.setenv("PULPO_WARP_COARSE", "0")
    assert routing.get("PULPO_WARP_COARSE") == "0"
