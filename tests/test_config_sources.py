"""Layered ENV/YAML config surface (container-app-conf analog, reference
py_image_dedup/config.py:58-66). Pure-Python — no SparkSession."""

from __future__ import annotations

import pytest

from py_image_dedup_spark.config import (
    DedupConfig,
    ENV_PREFIX,
    config_from_sources,
)


def test_defaults_when_no_sources():
    assert config_from_sources(env={}) == DedupConfig()


def test_env_layer_coerces_types():
    env = {
        ENV_PREFIX + "MAX_DIST": "0.3",
        ENV_PREFIX + "NUM_HASHES": "64",
        ENV_PREFIX + "LSH_BANDS": "16",
        ENV_PREFIX + "LSH_ROWS": "4",
        ENV_PREFIX + "ACROSS_SOURCES": "false",
        ENV_PREFIX + "DRY_RUN": "1",
        ENV_PREFIX + "MAX_TS_DELTA_S": "90",
        ENV_PREFIX + "PRIORITIZATION_RULES": "more-content, older-timestamp",
        ENV_PREFIX + "MODE": "simhash",
    }
    cfg = config_from_sources(env=env)
    assert cfg.max_dist == 0.3 and cfg.num_hashes == 64
    assert cfg.across_sources is False and cfg.dry_run is True
    assert cfg.max_ts_delta_s == 90.0
    assert cfg.prioritization_rules == ("more-content", "older-timestamp")
    assert cfg.mode == "simhash"


def test_optional_float_none_spelling():
    cfg = config_from_sources(env={ENV_PREFIX + "MAX_TS_DELTA_S": "none"})
    assert cfg.max_ts_delta_s is None


def test_yaml_layer_and_env_precedence(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "max_dist: 0.2\nmode: substring\n"
        "prioritization_rules: [more-content, older-timestamp]\n"
    )
    cfg = config_from_sources(
        yaml_path=str(y), env={ENV_PREFIX + "MAX_DIST": "0.4"}
    )
    assert cfg.max_dist == 0.4  # env beats yaml
    assert cfg.mode == "substring"
    assert cfg.prioritization_rules == ("more-content", "older-timestamp")


def test_overrides_beat_everything(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("max_dist: 0.2\n")
    cfg = config_from_sources(
        yaml_path=str(y), env={ENV_PREFIX + "MAX_DIST": "0.4"}, max_dist=0.5
    )
    assert cfg.max_dist == 0.5


def test_unknown_keys_rejected(tmp_path):
    """Typo'd knobs must fail loudly, never silently no-op (the round-1
    across_sources failure mode)."""
    y = tmp_path / "cfg.yaml"
    y.write_text("max_distt: 0.2\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_sources(yaml_path=str(y), env={})
    with pytest.raises(ValueError, match="unknown config overrides"):
        config_from_sources(env={}, bogus_knob=1)


def test_daemon_job_argparse():
    import jobs.daemon_job as dj

    a = dj.parse_args(
        ["--watch", "/w", "--store", "/s", "--pairs", "/p", "--drain"]
    )
    assert a.drain and a.trigger_seconds == 30
