"""Example enrichment plugins — the reference ships embedding/LLM doc
enrichment as plugin samples (ref: plugins/sentence_transformer_plugin.py:
1-69, plugins/openai_plugin.py:1-51, plugins/cohere_plugin.py); these are
the engine-side equivalents, proving the mapInPandas plugin chain carries
a model-in-executor workload.

Executor model: the plugin OBJECT is pickled to executors by
``apply_plugins``; anything heavy (a sentence-transformers model) must
load lazily on first ``transform`` call so it initializes once per
executor process, never on the driver and never per row. At scale this
is the standard model-per-executor pattern — batch size is governed by
Arrow batches, and the encoder amortizes across every doc the executor
sees.

The real encoder needs ``sentence-transformers`` (not in this
container); without it a DETERMINISTIC hash encoder stands in — each
dimension is an md5-derived value in [-1, 1), built from the same
md5/round6 primitives as functions/hashing.py, so the DuckDB oracle
reproduces the enriched docs byte-for-byte and the chain stays
hash-verifiable end-to-end.
"""

from __future__ import annotations

import hashlib

from .functions.hashing import h32_py
import math
import re as _re
import unicodedata

from .plugin import Plugin


def hash_embedding(text: str, dims: int) -> list[int]:
    """Deterministic stand-in embedding in FIXED-POINT micro-units:
    dim i is an md5-derived value in [-1, 1) scaled by 1e6 and floored
    to an int. Integer components make the enriched doc JSON render
    byte-identically in Python and DuckDB (tiny floats would flip
    between ``8.3e-05`` and ``0.000083``), mirroring the quantized
    form a production pipeline ships anyway. Matches
    ``hash_embedding_sql`` exactly."""
    out = []
    for i in range(dims):
        h = h32_py(f"{text}|{i}")
        x = 2.0 * (h / 4294967296.0) - 1.0
        out.append(math.floor(x * 1e6 + 0.5))
    return out


def hash_embedding_sql(text_expr: str, dims: int) -> str:
    """DuckDB expression producing the identical embedding list."""
    h = f"(('0x' || substring(md5({text_expr} || '|' || i), 1, 8))::BIGINT)"
    x = f"(2.0 * ({h} / 4294967296.0) - 1.0)"
    return (
        f"list_transform(range(0, {dims}), "
        f"i -> CAST(floor(({x}) * 1e6 + 0.5) AS BIGINT))"
    )


class EmbeddingEnrichmentPlugin(Plugin):
    """Add an embedding of ``text_field`` to every document
    (ref: plugins/sentence_transformer_plugin.py:28-47 transform).

    Tries ``sentence_transformers`` (all-MiniLM-L6-v2, as the reference
    sample uses) and falls back to the deterministic hash encoder when
    the package is absent. Docs without the text field pass through
    unchanged, matching the reference sample's empty-text early return.
    """

    name = "embedding_enrichment"
    MODEL_NAME = "all-MiniLM-L6-v2"

    def __init__(self, text_field: str = "text",
                 target_field: str = "embedding", dims: int = 16):
        self.text_field = text_field
        self.target_field = target_field
        self.dims = dims
        self._encoder = None  # loaded lazily, once per executor process

    def _load_encoder(self):
        try:
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(self.MODEL_NAME)
            return lambda text: [
                float(v) for v in model.encode(text.replace("\n", " "))
            ]
        except ImportError:
            return lambda text: hash_embedding(text, self.dims)

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if self._encoder is None:
            self._encoder = self._load_encoder()
        text = doc.get(self.text_field) or ""
        if not text:
            return doc
        doc[self.target_field] = self._encoder(str(text))
        return doc


class GeometryPlugin(Plugin):
    """Convert PostGIS-style GeoJSON fields to Elasticsearch geo types
    (ref: plugins/sample.py GeometryPlugin, optional geometry imports
    pgsync/base.py:61-69): a GeoJSON ``Point`` in ``point_field``
    becomes a ``geo_point``-shaped ``[lon, lat]`` array in
    ``point_target``, a GeoJSON ``Polygon`` in ``polygon_field`` is
    passed through to ``shape_target`` (ES ``geo_shape`` consumes
    GeoJSON natively). Columns may arrive as dicts or as raw GeoJSON
    strings (how a PostGIS ``ST_AsGeoJSON`` column lands after CDC);
    both parse. A lon/lat column pair is also accepted when
    ``lon_field``/``lat_field`` are set.

    Pair with a ``transform.mapping`` declaration so the generated
    index mapping types the produced fields:

        "transform": {"mapping": {
            "coordinates": {"type": "geo_point"},
            "shape": {"type": "geo_shape"},
        }}
    """

    name = "geometry"

    def __init__(
        self,
        point_field: str = "point",
        point_target: str = "coordinates",
        polygon_field: str = "polygon",
        shape_target: str = "shape",
        lon_field: str | None = None,
        lat_field: str | None = None,
    ):
        self.point_field = point_field
        self.point_target = point_target
        self.polygon_field = polygon_field
        self.shape_target = shape_target
        self.lon_field = lon_field
        self.lat_field = lat_field

    @staticmethod
    def _geojson(value):
        """dict passes through; a string parses as GeoJSON; anything
        else (None, malformed JSON) yields None — the doc is left
        unchanged rather than dropped, matching the reference's
        guard-and-skip behavior."""
        if isinstance(value, dict):
            return value
        if isinstance(value, str):
            try:
                import json

                parsed = json.loads(value)
            except ValueError:
                return None
            return parsed if isinstance(parsed, dict) else None
        return None

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if not doc:
            return doc
        point = self._geojson(doc.get(self.point_field))
        if (
            point
            and point.get("type") == "Point"
            and point.get("coordinates") is not None
        ):
            doc[self.point_target] = point["coordinates"]
        elif self.lon_field and self.lat_field:
            lon, lat = doc.get(self.lon_field), doc.get(self.lat_field)
            if lon is not None and lat is not None:
                doc[self.point_target] = [lon, lat]
        polygon = self._geojson(doc.get(self.polygon_field))
        if polygon and polygon.get("type") == "Polygon":
            doc[self.shape_target] = polygon
        return doc


class MaskingPlugin(Plugin):
    """PII masking through the plugin chain — the reference's
    MaskingPlugin reproduced field-for-field
    (ref: plugins/masking_plugin.py:10-96): declared fields are
    REDACTED (replaced wholesale), MASKED (partial display keyed on
    the field name — email / phone / credit card), or HASHED (one-way
    sha256 prefix for join-safe anonymization). Unknown or absent
    fields pass through untouched; docs are never dropped.

    Every rule is a pure string function, so the whole chain stays
    DuckDB-oracle-verifiable (sha256/regexp/substring exist in both
    engines) — see ``plugin_masking_docs`` in queries.py.
    """

    name = "masking"

    REDACTED = "[REDACTED]"

    def __init__(
        self,
        redact_fields: list[str] = ("ssn", "password", "secret"),
        mask_fields: list[str] = ("email", "phone", "credit_card"),
        hash_fields: list[str] = ("user_id", "customer_id"),
    ):
        self.redact_fields = list(redact_fields)
        self.mask_fields = list(mask_fields)
        self.hash_fields = list(hash_fields)

    # -- rule implementations (ref: plugins/masking_plugin.py:44-70) --
    @staticmethod
    def mask_email(email: str) -> str:
        """First char of the local part + domain; short locals fully
        starred."""
        if "@" not in email:
            return email
        local, domain = email.rsplit("@", 1)
        if len(local) > 1:
            return f"{local[0]}***@{domain}"
        return f"***@{domain}"

    @staticmethod
    def mask_phone(phone: str) -> str:
        """Last 4 digits only."""
        digits = _re.sub(r"\D", "", phone)
        if len(digits) >= 4:
            return f"***-***-{digits[-4:]}"
        return "***"

    @staticmethod
    def mask_credit_card(cc: str) -> str:
        digits = _re.sub(r"\D", "", cc)
        if len(digits) >= 4:
            return f"****-****-****-{digits[-4:]}"
        return "****"

    @staticmethod
    def hash_value(value) -> str:
        return hashlib.sha256(str(value).encode()).hexdigest()[:16]

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if not doc:
            return doc
        for field in self.redact_fields:
            if field in doc:
                doc[field] = self.REDACTED
        for field in self.mask_fields:
            if field in doc and isinstance(doc[field], str):
                low = field.lower()
                if "email" in low:
                    doc[field] = self.mask_email(doc[field])
                elif "phone" in low:
                    doc[field] = self.mask_phone(doc[field])
                elif "credit" in low or "card" in low:
                    doc[field] = self.mask_credit_card(doc[field])
        for field in self.hash_fields:
            if field in doc and doc[field]:
                doc[field] = self.hash_value(doc[field])
        return doc


class SlugPlugin(Plugin):
    """URL-friendly slugs from a text field
    (ref: plugins/slug_plugin.py:10-86): unicode-normalize to ascii,
    lowercase, spaces/underscores to hyphens, strip everything else,
    collapse runs, trim, and truncate at a word boundary. Absent or
    non-string sources leave the doc unchanged."""

    name = "slug"

    def __init__(
        self,
        source_field: str = "title",
        target_field: str = "slug",
        max_length: int = 100,
    ):
        self.source_field = source_field
        self.target_field = target_field
        self.max_length = max_length

    def slugify(self, text: str) -> str:
        if not text:
            return ""
        text = (
            unicodedata.normalize("NFKD", text)
            .encode("ascii", "ignore")
            .decode("ascii")
        )
        text = _re.sub(r"[\s_]+", "-", text.lower())
        text = _re.sub(r"[^a-z0-9-]", "", text)
        text = _re.sub(r"-{2,}", "-", text).strip("-")
        if self.max_length and len(text) > self.max_length:
            text = text[: self.max_length]
            if "-" in text:
                text = text.rsplit("-", 1)[0]
        return text

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if not doc:
            return doc
        value = doc.get(self.source_field)
        if value and isinstance(value, str):
            doc[self.target_field] = self.slugify(value)
        return doc


class InfinityDatePlugin(Plugin):
    """PostgreSQL ``infinity``/``-infinity`` date values mapped to the
    extreme representable timestamps (ref: plugins/infinity.py:9-28
    converts to datetime.max/min; docs travel as JSON strings here, so
    the ISO renderings of those extremes are the analog — which is
    also what a date-typed ES field needs)."""

    name = "infinity_date"

    MAX_ISO = "9999-12-31T23:59:59.999999"  # datetime.max.isoformat()
    MIN_ISO = "0001-01-01T00:00:00"  # datetime.min.isoformat()

    def __init__(self, fields: list[str] = ("publish_date",)):
        self.fields = list(fields)

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if not doc:
            return doc
        for field in self.fields:
            value = doc.get(field)
            if isinstance(value, str):
                if value.lower() == "infinity":
                    doc[field] = self.MAX_ISO
                elif value.lower() == "-infinity":
                    doc[field] = self.MIN_ISO
        return doc


class ShortDocDropPlugin(Plugin):
    """Drop documents whose text is shorter than ``min_chars`` — the
    doc-drop contract (falsy return) composed after enrichment, the
    shape of the reference's filtering plugins."""

    name = "short_doc_drop"

    def __init__(self, text_field: str = "text", min_chars: int = 1):
        self.text_field = text_field
        self.min_chars = min_chars

    def transform(self, doc: dict, _id: str, _index: str) -> dict | None:
        if len(doc.get(self.text_field) or "") < self.min_chars:
            return None
        return doc

    def auth(self, key: str) -> str | None:
        """Example auth hook (ref: pgsync/plugin.py:106-115): answers
        credential lookups for the sink writer."""
        return {"search_token": "example-token"}.get(key)
