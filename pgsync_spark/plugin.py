"""Plugin UDF chain: user transforms applied to each document.

Reference parity (ref: pgsync/plugin.py:15-115): plugins subclass
``Plugin``, declare a ``name``, and implement
``transform(doc, _id, _index) -> dict | None``; they run in declared
order and returning a falsy value drops the document (used e.g. by the
masking and enrichment samples in the reference's plugins/).

Spark-first execution: the chain runs over Arrow batches via
mapInPandas — one Python round-trip for the whole chain regardless of
plugin count, not a per-row UDF per plugin. Docs travel as JSON strings
(the engine's canonical form), so arbitrary dict-shaped edits are
allowed without schema gymnastics; the output schema stays
``(_id, doc)``.
"""

from __future__ import annotations

import abc
import json
import logging
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

log = logging.getLogger(__name__)


class Plugin(abc.ABC):
    """ref: pgsync/plugin.py Plugin ABC."""

    name: str = ""

    @abc.abstractmethod
    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        ...


def auth_value(plugins: list[Plugin], key: str) -> str | None:
    """The reference's plugin ``auth`` hook (ref: pgsync/plugin.py:106-115):
    the first plugin exposing an ``auth`` method answers the key lookup
    (used for credential indirection, e.g. ES passwords); exceptions are
    logged and yield None, matching the reference exactly."""
    for plugin in plugins:
        if hasattr(plugin, "auth"):
            try:
                return plugin.auth(key)
            except Exception as e:  # noqa: BLE001 — parity with reference
                log.exception("Error calling auth: %s", e)
                return None
    return None


def load_plugins(names: list[str], module: str | None = None) -> list[Plugin]:
    """Resolve config-declared plugin NAMES to instances — the engine
    analog of the reference's package walk (ref: pgsync/plugin.py:24-91
    Plugins.walk collects Plugin subclasses whose ``name`` is declared,
    instantiates them, and orders them by the declared list).

    ``module``: dotted module or package to search; defaults to
    ``$SPARK_GRAFT_PLUGINS_MODULE`` or the built-in examples. Packages
    are walked recursively (the reference supports nested plugin dirs,
    ref: plugins/character/groot.py). Matching is case-insensitive
    (the reference's sample configs use TitleCase names). Unknown
    names RAISE with the available inventory — the reference silently
    ignores them, which turns a typo'd config into silently unmasked
    documents."""
    import importlib
    import inspect
    import os
    import pkgutil

    from . import exc

    if not names:
        return []
    module = module or os.environ.get(
        "SPARK_GRAFT_PLUGINS_MODULE", "pgsync_spark.plugin_examples"
    )
    available: dict[str, type] = {}

    def collect(mod) -> None:
        for _, klass in inspect.getmembers(mod, inspect.isclass):
            if issubclass(klass, Plugin) and klass is not Plugin:
                if getattr(klass, "name", ""):
                    available.setdefault(klass.name.lower(), klass)

    imported = []
    root = importlib.import_module(module)
    imported.append(root)
    collect(root)
    if hasattr(root, "__path__"):  # package → walk recursively, any depth
        for info in pkgutil.walk_packages(
            root.__path__, prefix=f"{module}."
        ):
            child = importlib.import_module(info.name)
            imported.append(child)
            collect(child)

    if not module.startswith("pgsync_spark"):
        # a user plugins module lives on the DRIVER only; executors
        # unpickling the chain would hit ModuleNotFoundError unless the
        # file is shipped (--py-files). Registering the module for
        # pickle-BY-VALUE embeds the class definitions in the task
        # closure instead — config plugins then run on any executor
        # with zero deployment steps (the reference has no executor
        # tier, so this problem is Spark-specific).
        try:
            from pyspark import cloudpickle

            for mod in imported:
                cloudpickle.register_pickle_by_value(mod)
        except Exception:  # noqa: BLE001 — fall back to by-reference
            log.warning(
                "could not register %s for pickle-by-value; executors "
                "need the module shipped via --py-files", module,
            )

    out: list[Plugin] = []
    for name in names:
        klass = available.get(name.lower())
        if klass is None:
            raise exc.SchemaError(
                f"unknown plugin {name!r} (module {module!r} provides: "
                f"{sorted(available)})"
            )
        out.append(klass())
    return out


def apply_plugins(
    docs: DataFrame,
    plugins: list[Plugin],
    index: str = "",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Run the plugin chain over a (_id, doc) DataFrame.

    ``passthrough``: extra STRING columns carried through the crossing
    unchanged (e.g. ``_routing``) — rows a plugin drops lose their
    passthrough values with the row."""
    if not plugins:
        return docs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep_rows, outs = [], []
            for i, (_id, doc_json) in enumerate(zip(pdf["_id"], pdf["doc"])):
                doc = json.loads(doc_json)
                for plugin in plugins:
                    doc = plugin.transform(doc, _id=_id, _index=index)
                    if not doc:  # falsy → drop the document
                        break
                else:
                    keep_rows.append(i)
                    outs.append(json.dumps(doc, separators=(",", ":")))
            kept = pdf.iloc[keep_rows]
            cols = {"_id": kept["_id"].array, "doc": outs}
            for c in passthrough:
                cols[c] = kept[c].array
            yield pd.DataFrame(cols)

    schema = "_id string, doc string" + "".join(
        f", {c} string" for c in passthrough
    )
    return docs.select("_id", "doc", *passthrough).mapInPandas(run, schema)
