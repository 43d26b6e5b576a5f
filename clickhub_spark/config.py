"""Config loading — parity with the reference's ``load_config``
(reference clickhub.py:54-60, config.yml keys).  The
ClickHouse-connection keys have no meaning here (the engine IS the
process); the operational keys keep their exact names and defaults
(reference config.yml: data_cache, max_queue_length, sleep_time) so a
reference user's config file drops in unchanged — unknown keys are
accepted and ignored."""

from __future__ import annotations

from typing import Any

#: operational defaults, mirroring reference config.yml values.
DEFAULTS: dict[str, Any] = {
    "data_cache": "/opt/git_cache",   # clone/workdir location
    "max_queue_length": 10_000,       # config.yml:11
    "sleep_time": 10,                 # worker poll period, config.yml:17
    "data_dir": "./data",             # engine tables root (ours)
}


def load_config(path: str | None = None) -> dict[str, Any]:
    """Defaults merged with an optional YAML file (reference
    clickhub.py:54-60 semantics: yaml.safe_load of the whole file)."""
    cfg = dict(DEFAULTS)
    if path:
        import yaml

        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        if not isinstance(loaded, dict):
            raise ValueError(f"config {path!r} must be a YAML mapping")
        cfg.update(loaded)
    return cfg
