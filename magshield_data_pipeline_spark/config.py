"""Config source (SURVEY §2.1 S8).

The reference copy-pastes the same load-env.yaml-then-overlay-env-vars
block into all eight modules (/root/reference/modules/callable.py:25-38,
quote.py:20-37, …). Here it is one function with explicit precedence:

    defaults  <  config file (yaml or json)  <  environment variables

Environment keys use a prefix (default ``MAGSHIELD_``); ``MAGSHIELD_
PAGE_SIZE=200`` overrides the file's ``page_size``. Values from the
environment are strings — callers cast at use sites, mirroring how
Spark confs behave.
"""

from __future__ import annotations

import json
import os
from typing import Any

ENV_PREFIX = "MAGSHIELD_"


def _load_file(path: str) -> dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        if path.endswith(".json"):
            return json.load(f) or {}
        try:
            import yaml

            return yaml.safe_load(f) or {}
        except ImportError:
            # yaml-less images: accept JSON content in a .yaml file or fail loudly
            f.seek(0)
            return json.load(f) or {}


def load_config(
    path: str | None = None,
    defaults: dict[str, Any] | None = None,
    env_prefix: str = ENV_PREFIX,
    environ: dict[str, str] | None = None,
) -> dict[str, Any]:
    """Merge defaults ← file ← env (last wins). ``environ`` is
    injectable for tests; defaults to ``os.environ``."""
    cfg: dict[str, Any] = dict(defaults or {})
    if path and os.path.exists(path):
        cfg.update(_load_file(path))
    env = os.environ if environ is None else environ
    for key, val in env.items():
        if key.startswith(env_prefix):
            cfg[key[len(env_prefix):].lower()] = val
    return cfg
