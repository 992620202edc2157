"""Layered ops-time configuration: defaults < ini file < environment
< argv — the reference's LayeredConfig cascade (manager.py:863-910:
``Defaults`` → ``INIFile`` → ``Environment(prefix="FERENDA_")`` →
``Commandline``), reimplemented on the stdlib so a deployed pipeline
can be retuned (checkpoint dir, actor-pool sizing, thresholds)
without code edits.

Typing follows LayeredConfig's rule: a later layer's raw string is
coerced to the TYPE OF THE DEFAULT it overrides (bool accepts
true/false/1/0/yes/no; tuples and lists split on commas; ``None``
defaults stay strings). Unknown keys from any layer are kept as
strings so profiles can carry free-form knobs.

``profile_with_config`` applies the cascade to a ``RepoProfile``'s
scalar fields (callables and grammar objects are code, not config —
the reference's subclass hooks stay in the profile literal) and
returns a new frozen profile.
"""

from __future__ import annotations

import configparser
import os
from typing import Any, Mapping, Sequence

_TRUE = {"1", "true", "yes", "on"}
_FALSE = {"0", "false", "no", "off"}


def _coerce(raw: str, default: Any) -> Any:
    """Coerce a raw override string to the default's type
    (LayeredConfig's typed-layer rule)."""
    if not isinstance(raw, str):
        return raw
    if isinstance(default, bool):
        low = raw.strip().lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ValueError("not a boolean: %r" % raw)
    if isinstance(default, int) and not isinstance(default, bool):
        return int(raw.strip())
    if isinstance(default, float):
        return float(raw.strip())
    if isinstance(default, tuple):
        return tuple(_coerce_item(p, default) for p in _split(raw))
    if isinstance(default, list):
        return [_coerce_item(p, default) for p in _split(raw)]
    return raw


def _split(raw: str) -> list[str]:
    return [p.strip() for p in raw.split(",") if p.strip()]


def _coerce_item(part: str, default_seq) -> Any:
    inner = default_seq[0] if len(default_seq) else ""
    return _coerce(part, inner)


def layered_config(defaults: Mapping[str, Any],
                   inifile: str | None = None,
                   section: str = "ferenda_ray",
                   env: Mapping[str, str] | None = None,
                   env_prefix: str = "FERENDA_RAY_",
                   argv: Sequence[str] | None = None) -> dict:
    """Resolve the four-layer cascade into one plain dict.

    - ``defaults``: the code-level base (lowest priority).
    - ``inifile``: a ``configparser`` file; keys come from
      ``[<section>]`` (missing file/section = empty layer, matching
      the reference's optional ferenda.ini).
    - ``env``: mapping (default ``os.environ``); key ``<env_prefix> +
      NAME.upper()`` overrides ``name``.
    - ``argv``: ``["--name=value", "--flag"]`` pairs (highest
      priority; a bare ``--flag`` means true for bool defaults).
    """
    merged = dict(defaults)

    if inifile and os.path.exists(inifile):
        cp = configparser.ConfigParser()
        cp.read(inifile)
        if cp.has_section(section):
            for key, raw in cp.items(section):
                merged[key] = _coerce(raw, defaults.get(key, ""))

    env = os.environ if env is None else env
    for key in list(merged) + [
            k[len(env_prefix):].lower() for k in env
            if k.startswith(env_prefix)]:
        env_key = env_prefix + key.upper()
        if env_key in env:
            merged[key] = _coerce(env[env_key], defaults.get(key, ""))

    for arg in argv or []:
        if not arg.startswith("--"):
            continue
        body = arg[2:]
        if "=" in body:
            key, raw = body.split("=", 1)
        else:
            key, raw = body, "true"
        key = key.replace("-", "_")
        merged[key] = _coerce(raw, defaults.get(key, ""))

    return merged


# RepoProfile fields that are plain config (re-tunable at ops time);
# callables / grammar registries / facet objects stay code.
PROFILE_CONFIG_FIELDS = ("composite", "checkpoint_dir",
                         "linker_concurrency", "embed_threshold",
                         "patchdir")


def profile_with_config(profile, inifile: str | None = None,
                        section: str = "ferenda_ray",
                        env: Mapping[str, str] | None = None,
                        env_prefix: str = "FERENDA_RAY_",
                        argv: Sequence[str] | None = None):
    """Overlay the cascade onto a ``RepoProfile``'s scalar fields and
    return a new frozen profile (defaults < profile literal < ini <
    env < argv). An env var like ``FERENDA_RAY_CHECKPOINT_DIR=/x``
    redirects checkpointing with zero code edits — the
    manager.load_config deployment story."""
    import dataclasses

    base = {f: getattr(profile, f) for f in PROFILE_CONFIG_FIELDS}
    resolved = layered_config(base, inifile=inifile, section=section,
                              env=env, env_prefix=env_prefix,
                              argv=argv)
    updates = {}
    for f in PROFILE_CONFIG_FIELDS:
        if resolved[f] != base[f]:
            updates[f] = resolved[f]
    if "linker_concurrency" in updates and isinstance(
            updates["linker_concurrency"], str):
        updates["linker_concurrency"] = tuple(
            int(p) for p in _split(updates["linker_concurrency"]))
    return dataclasses.replace(profile, **updates) if updates \
        else profile
