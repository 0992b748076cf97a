"""CLI surface tests — subcommand dispatch (reference cli.py:38-90 parity)
and layered config precedence in the batch job. No SparkSession needed."""

from __future__ import annotations

import jobs.cli as cli
import jobs.dedup_job as dedup_job


def test_cli_deduplicate_dispatch(monkeypatch):
    seen = {}
    monkeypatch.setattr(dedup_job, "main", lambda argv: seen.setdefault("argv", argv) and 0 or 0)
    rc = cli.main(["deduplicate", "--output", "/tmp/x", "--synthetic-groups", "5"])
    assert rc == 0
    assert seen["argv"] == ["--output", "/tmp/x", "--synthetic-groups", "5"]


def test_cli_analyse_forces_signature_stage(monkeypatch):
    seen = {}
    monkeypatch.setattr(dedup_job, "main", lambda argv: seen.setdefault("argv", argv) and 0 or 0)
    rc = cli.main(["analyse", "--output", "/tmp/x"])
    assert rc == 0
    assert seen["argv"][-2:] == ["--stages", "signatures"]


def test_cli_analyse_rejects_explicit_stages():
    assert cli.main(["analyse", "--output", "/tmp/x", "--stages", "pairs"]) == 2


def test_cli_unknown_command():
    assert cli.main(["frobnicate"]) == 2


def test_cli_help():
    assert cli.main([]) == 0


def test_build_config_env_layer(monkeypatch):
    monkeypatch.setenv("PY_IMAGE_DEDUP_SPARK_MAX_DIST", "0.25")
    args = dedup_job.parse_args(["--output", "/tmp/x"])
    cfg = dedup_job.build_config(args)
    assert cfg.max_dist == 0.25  # env beats dataclass default


def test_build_config_flag_beats_env(monkeypatch):
    monkeypatch.setenv("PY_IMAGE_DEDUP_SPARK_MAX_DIST", "0.25")
    args = dedup_job.parse_args(["--output", "/tmp/x", "--max-dist", "0.4"])
    cfg = dedup_job.build_config(args)
    assert cfg.max_dist == 0.4  # explicit flag is the top layer


def test_build_config_yaml_under_env(monkeypatch, tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text("max_dist: 0.15\nmode: simhash\n")
    monkeypatch.setenv("PY_IMAGE_DEDUP_SPARK_MAX_DIST", "0.25")
    args = dedup_job.parse_args(
        ["--output", "/tmp/x", "--config-yaml", str(y)]
    )
    cfg = dedup_job.build_config(args)
    assert cfg.max_dist == 0.25  # env beats yaml
    assert cfg.mode == "simhash"  # yaml beats default


def test_build_config_rules_flag():
    args = dedup_job.parse_args(
        ["--output", "/tmp/x", "--rules", "more-content,older-timestamp"]
    )
    cfg = dedup_job.build_config(args)
    assert cfg.prioritization_rules == ("more-content", "older-timestamp")
