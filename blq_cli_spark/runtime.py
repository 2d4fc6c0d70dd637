"""Session-scoped runtime config for the serve tool surface.

Mirrors the reference's three-tier config split (src/blq/runtime.py:1-120):
persistent user config lives in the store JSON (`store.config_*`), run
history lives in the parquet tables, and THIS module holds in-memory
session knobs the agent-facing `config` tool reads/writes — wiped on
process restart, re-seeded from environment variables at first use.

Keys (reference BlqRuntimeConfig, runtime.py:31-51):
    active_root           fallback store root when the caller gives none
    log_level             debug | info | warn | error
    default_lines_window  default for output(lines=...) when omitted
    default_history_limit default for history(n=...) when omitted

Env seeds (read once, on first access / reset): BLQ_SPARK_ACTIVE_ROOT,
BLQ_SPARK_LOG_LEVEL, BLQ_SPARK_DEFAULT_LINES_WINDOW,
BLQ_SPARK_DEFAULT_HISTORY_LIMIT. Invalid values fall back to defaults.
"""

from __future__ import annotations

import os
from dataclasses import asdict, dataclass, fields

_ENV_PREFIX = "BLQ_SPARK_"
_LOG_LEVELS = {"debug", "info", "warn", "warning", "error"}


@dataclass
class RuntimeConfig:
    active_root: str | None = None
    log_level: str = "info"
    default_lines_window: str = ""
    default_history_limit: int = 20

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "RuntimeConfig":
        e = os.environ if env is None else env
        cfg = cls()
        if v := e.get(_ENV_PREFIX + "ACTIVE_ROOT"):
            cfg.active_root = v
        if v := e.get(_ENV_PREFIX + "LOG_LEVEL"):
            if v.lower() in _LOG_LEVELS:
                cfg.log_level = v.lower()
        if v := e.get(_ENV_PREFIX + "DEFAULT_LINES_WINDOW"):
            cfg.default_lines_window = v
        if v := e.get(_ENV_PREFIX + "DEFAULT_HISTORY_LIMIT"):
            try:
                cfg.default_history_limit = int(v)
            except ValueError:
                pass
        return cfg

    def to_dict(self) -> dict:
        return asdict(self)


_current: RuntimeConfig | None = None


def get_runtime() -> RuntimeConfig:
    global _current
    if _current is None:
        _current = RuntimeConfig.from_env()
    return _current


def update_runtime(changes: dict) -> RuntimeConfig:
    """Merge validated changes; unknown keys / bad values raise and leave
    the config untouched (reference update semantics, serve.py:3686-3690)."""
    cfg = get_runtime()
    valid = {f.name for f in fields(RuntimeConfig)}
    unknown = set(changes) - valid
    if unknown:
        raise ValueError(f"unknown config keys: {', '.join(sorted(unknown))}")
    if "log_level" in changes and str(changes["log_level"]).lower() not in _LOG_LEVELS:
        raise ValueError(f"invalid log_level: {changes['log_level']!r}")
    if "default_history_limit" in changes:
        changes = dict(changes)
        changes["default_history_limit"] = int(changes["default_history_limit"])
    for k, v in changes.items():
        setattr(cfg, k, v.lower() if k == "log_level" else v)
    return cfg


def reset_runtime() -> RuntimeConfig:
    global _current
    _current = RuntimeConfig.from_env()
    return _current
