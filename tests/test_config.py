"""Config source tests (config.py): precedence defaults < file < env."""

from __future__ import annotations

from magshield_data_pipeline_spark.config import load_config


def test_precedence_defaults_file_env(tmp_path):
    p = tmp_path / "env.yaml"
    p.write_text("page_size: 500\nbase_url: https://api.example\n")
    cfg = load_config(
        str(p),
        defaults={"page_size": 100, "workers": 10},
        environ={"MAGSHIELD_PAGE_SIZE": "200", "UNRELATED": "x"},
    )
    assert cfg["page_size"] == "200"  # env wins (string, caller casts)
    assert cfg["base_url"] == "https://api.example"  # file beats defaults
    assert cfg["workers"] == 10  # defaults survive
    assert "unrelated" not in cfg  # prefix-filtered


def test_missing_file_and_json(tmp_path):
    cfg = load_config(str(tmp_path / "nope.yaml"), defaults={"a": 1}, environ={})
    assert cfg == {"a": 1}
    j = tmp_path / "cfg.json"
    j.write_text('{"retries": 4}')
    assert load_config(str(j), environ={})["retries"] == 4
