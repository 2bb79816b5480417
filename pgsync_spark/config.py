"""Schema-config loading with environment templating.

Reference parity (ref: pgsync/utils.py:204-300 config_loader): the JSON
schema file may reference environment variables as ``${VAR}`` or
``${VAR:-default}``; unset variables without a default raise. The
reference also loads from HTTP/S3 URLs — out of scope here (local paths
only), the hook is the same function.
"""

from __future__ import annotations

import json
import os
import re

from . import exc
from .node import Tree, parse_tree

_ENV_RE = re.compile(r"\$\{(\w+)(?::-([^}]*))?\}")


def _substitute_env(text: str) -> str:
    def repl(m: re.Match) -> str:
        name, default = m.group(1), m.group(2)
        val = os.environ.get(name)
        if val is None:
            if default is not None:
                return default
            raise exc.SchemaError(f"environment variable {name!r} not set")
        return val

    return _ENV_RE.sub(repl, text)


def config_loader(path: str) -> list[Tree]:
    """Load a schema file → list of Trees (one per index entry)."""
    with open(path) as f:
        raw = _substitute_env(f.read())
    try:
        data = json.loads(raw)
    except json.JSONDecodeError as e:
        raise exc.SchemaError(f"invalid JSON in {path}: {e}") from e
    if isinstance(data, dict):
        data = [data]
    if not isinstance(data, list):
        raise exc.SchemaError(f"schema must be a list or dict: {type(data)}")
    return [parse_tree(entry) for entry in data]
