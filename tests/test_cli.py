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


def test_cli_analyse_rejects_stages_equals_form():
    """argparse is last-wins, so '--stages=pairs' slipping past the check
    would be silently overridden instead of erroring (ADVICE r2)."""
    assert cli.main(["analyse", "--output", "/tmp/x", "--stages=pairs"]) == 2


def test_invalidate_from_requires_committed_predecessors(tmp_path):
    """--from-stage (the reference's --skip-analyse-phase analog) must
    refuse when there is nothing committed to resume from, and must drop
    exactly the requested suffix of stages otherwise."""
    import os

    import pytest

    from py_image_dedup_spark.plans.pipeline import STAGES, invalidate_from

    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(ValueError, match="no committed output"):
        invalidate_from(ckpt, "pairs")
    for s in STAGES:
        os.makedirs(os.path.join(ckpt, s))
        open(os.path.join(ckpt, s, "_SUCCESS"), "w").close()
    dropped = invalidate_from(ckpt, "pairs")
    assert dropped == ["pairs", "clusters", "actions"]
    assert os.path.exists(os.path.join(ckpt, "signatures", "_SUCCESS"))
    assert not os.path.exists(os.path.join(ckpt, "pairs"))
    with pytest.raises(ValueError, match="must be one of"):
        invalidate_from(ckpt, "nope")


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


def test_cli_compact_requires_store():
    import pytest

    from jobs import cli

    with pytest.raises(SystemExit) as exc:
        cli.main(["compact"])  # argparse: missing required --store
    assert exc.value.code == 2


def test_daemon_norm_variants_flag():
    from jobs import daemon_job

    args = daemon_job.parse_args(
        ["--watch", "/tmp/w", "--store", "/tmp/s", "--pairs", "/tmp/p",
         "--norm-variants", "strip_punct,letters_only"]
    )
    assert args.norm_variants == "strip_punct,letters_only"
