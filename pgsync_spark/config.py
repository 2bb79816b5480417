"""Schema-config loading with environment templating.

Reference parity (ref: pgsync/utils.py:204-300 config_loader): the JSON
schema file may reference environment variables as ``${VAR}`` or
``${VAR:-default}``; unset variables without a default raise. Configs
load from local paths, http(s) URLs (stdlib urllib, JSON validated on
download like the reference's requests path), or s3:// URLs (gated
behind a boto3 import — not shipped in this environment).
"""

from __future__ import annotations

import json
import os
import re
import urllib.request
from urllib.parse import urlparse

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


def _read_source(path: str) -> str:
    """Local file, http(s) URL, or s3:// URL → raw text
    (ref: pgsync/utils.py:204-300)."""
    scheme = urlparse(path).scheme.lower()
    if scheme in ("http", "https"):
        req = urllib.request.Request(
            path, headers={"Accept": "application/json"}
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.read().decode("utf-8")
    if scheme == "s3":
        try:
            import boto3  # noqa: PLC0415 — optional dependency
        except ImportError as e:
            raise exc.SchemaError(
                "s3:// config URLs require boto3, which is not installed"
            ) from e
        parsed = urlparse(path)
        if not parsed.netloc or not parsed.path:
            raise exc.SchemaError(f"invalid S3 URL: {path}")
        import io

        buf = io.BytesIO()
        boto3.client("s3").download_fileobj(
            parsed.netloc, parsed.path.lstrip("/"), buf
        )
        return buf.getvalue().decode("utf-8")
    if not os.path.exists(path):
        raise exc.SchemaError(f"local config {path!r} not found")
    with open(path) as f:
        return f.read()


def config_loader(path: str) -> list[Tree]:
    """Load a schema config → list of Trees (one per index entry).
    ``path`` may be a local file, an http(s) URL, or an s3:// URL."""
    raw = _substitute_env(_read_source(path))
    try:
        data = json.loads(raw)
    except json.JSONDecodeError as e:
        raise exc.SchemaError(f"invalid JSON in {path}: {e}") from e
    if isinstance(data, dict):
        data = [data]
    if not isinstance(data, list):
        raise exc.SchemaError(f"schema must be a list or dict: {type(data)}")
    return [parse_tree(entry) for entry in data]
