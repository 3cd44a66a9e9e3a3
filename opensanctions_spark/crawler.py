"""Reference crawler-API compatibility layer.

The reference's 483 crawlers are driver-side Python against two objects:
a ``Context`` (``zavod/zavod/context.py:54-666`` — make/make_id/
make_slug/lookup/emit/audit_data/resources/log) and an ``Entity``
(``zavod/zavod/entity.py:16-198`` — multi-valued ``add``/``set``/``get``
with None-skip). This module is that surface for the Spark engine: a
crawler written for the reference runs with an import swap, and every
``emit`` lands in the canonical statements DataFrame that the rest of
the engine (J1 timestamp join, A1 assembly, exporters) consumes.

Execution model (SURVEY §2.10 boundary): crawling is inherently
sequential driver-side HTTP/parsing — the Context buffers emitted
statements as plain tuples and converts them to Arrow-backed DataFrames
in bounded batches (``flush_rows``), so driver memory holds one batch,
never the crawl. The statement IR stamping (content-hash ids, P5 guard,
seen timestamps) is the same ``finish_statements`` path the melt
factories use — a crawled statement and a melted statement are
indistinguishable downstream.

Python-side entity factories (``h.make_address`` style) are deliberately
NOT duplicated here: the fixture-parity test shows the pattern — build
the address/sanction parts as source columns and run the DataFrame
factories (``functions/addresses.py`` etc.) over the emitted frame, or
compute small helpers inline. ``context.make_id``/``make_slug`` match
the catalog's F8 forms so ids agree across both routes.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from opensanctions_spark.model.registry import (
    EDGE_SCHEMATA,
    SCHEMA_PARENTS,
)

_SLUG_RE = re.compile(r"[^a-z0-9]+")


def _ensure_list(value: Any) -> list[Any]:
    if value is None:
        return []
    if isinstance(value, (list, tuple, set)):
        return list(value)
    return [value]


@dataclass(frozen=True)
class Schema:
    """Driver-side view of one FtM schema (``zavod/zavod/entity.py``
    delegates to the followthemoney model; the engine's lattice lives in
    ``model/registry.py`` and this wraps it)."""

    name: str

    def is_a(self, other: str | "Schema") -> bool:
        other_name = other.name if isinstance(other, Schema) else other
        if self.name == other_name:
            return True
        return other_name in SCHEMA_PARENTS.get(self.name, [])

    @property
    def edge(self) -> bool:
        return self.name in EDGE_SCHEMATA

    @property
    def source_prop(self) -> str | None:
        # None for non-edge schemata: the reference's Schema.source_prop
        # is Optional and graph walkers guard on it
        # (ann_graph_topics/analyzer.py walk_edge)
        spec = EDGE_SCHEMATA.get(self.name)
        return spec[0] if spec else None

    @property
    def target_prop(self) -> str | None:
        spec = EDGE_SCHEMATA.get(self.name)
        return spec[1] if spec else None

    @property
    def directed(self) -> bool:
        return EDGE_SCHEMATA[self.name][2]


class Statement(tuple):
    """One property assertion: unpacks as the historical 5-tuple
    ``(prop, value, lang, origin, original_value)`` AND carries the
    reference statement attributes analyzers read (``.prop``, ``.value``,
    ``.dataset``, ``.external`` — ``followthemoney.statement.Statement``
    surface, consumed by e.g.
    ``datasets/_analysis/ann_graph_topics/analyzer.py:123,138``).

    ``dataset``/``external`` are provenance the store view attaches when it
    rebuilds entities from the statements IR; crawl-time statements default
    to (None, False) — at crawl time the whole entity belongs to the
    emitting dataset and externality is decided per ``emit`` call.
    """

    def __new__(
        cls,
        prop: str,
        value: str,
        lang: str | None = None,
        origin: str | None = None,
        original_value: str | None = None,
        dataset: str | None = None,
        external: bool = False,
    ) -> "Statement":
        self = super().__new__(cls, (prop, value, lang, origin, original_value))
        self.dataset = dataset
        self.external = external
        return self

    prop = property(lambda s: s[0])
    value = property(lambda s: s[1])
    lang = property(lambda s: s[2])
    origin = property(lambda s: s[3])
    original_value = property(lambda s: s[4])

    def __getnewargs__(self) -> tuple:
        # tuple.__getnewargs__ would return the whole 5-tuple as ONE
        # argument, so pickle/copy round-trips would call __new__ with a
        # single positional and fail; return the real constructor args
        # (keeping the dataset/external provenance attributes).
        return (self[0], self[1], self[2], self[3], self[4],
                self.dataset, self.external)


class Entity:
    """A bag of (prop, value) assertions under one id — ``Entity.add``
    skips None and empty strings exactly like the reference's P5 guard
    (``zavod/zavod/entity.py:47-48``); every property is multi-valued."""

    def __init__(self, schema: Schema) -> None:
        self.schema = schema
        self.id: str | None = None
        #: source datasets this entity's statements came from — populated by
        #: the store view (``zavod`` Entity.datasets parity; empty for
        #: crawl-time entities, which belong to the emitting dataset)
        self.datasets: set[str] = set()
        #: other ids resolved into this entity — populated by the store
        #: view from the linker (``zavod`` Entity.referents parity)
        self.referents: set[str] = set()
        self._stmts: list[Statement] = []

    def add(
        self,
        prop: str,
        values: Any,
        lang: str | None = None,
        origin: str | None = None,
        original_value: str | None = None,
        quiet: bool = False,
    ) -> "Entity":
        # ``quiet`` mirrors the reference's suppress-invalid-prop flag
        # (zavod/zavod/entity.py); this layer has no per-schema property
        # registry, so it is accepted for signature parity and ignored.
        for v in _ensure_list(values):
            if v is None:
                continue
            # entity-valued props (``sanction.add("entity", entity)``)
            # resolve to the entity's id, like the reference's
            # Entity.add with an Entity argument
            if isinstance(v, Entity):
                if v.id is None:
                    continue
                v = v.id
            text = str(v).strip()
            if not text:
                continue
            self._stmts.append(
                Statement(prop, text, lang, origin, original_value)
            )
        return self

    def add_statement(self, stmt: Statement) -> "Entity":
        """Append a fully-attributed statement (store-view path: the
        provenance columns ``dataset``/``external`` survive into the
        entity, which crawl-time ``add`` has no source for)."""
        self._stmts.append(stmt)
        return self

    def set(self, prop: str, values: Any, **kwargs: Any) -> "Entity":
        self._stmts = [s for s in self._stmts if s[0] != prop]
        return self.add(prop, values, **kwargs)

    def get(self, prop: str, quiet: bool = False) -> list[str]:
        # ``quiet`` mirrors the reference's suppress-unknown-prop flag
        # (zavod/zavod/entity.py Entity.get); accepted for signature parity
        return [s[1] for s in self._stmts if s[0] == prop]

    def get_statements(self, prop: str) -> list[Statement]:
        """Statements for one property, with provenance attributes
        (``zavod`` Entity.get_statements — e.g. ann_graph_topics
        ``non_graph_topics`` reads ``.value``/``.dataset`` off them)."""
        return [s for s in self._stmts if s[0] == prop]

    def get_type_values(self, prop_type: Any, matchable: bool = False) -> list[str]:
        """All values of properties of the given registry type
        (``followthemoney`` EntityProxy.get_type_values; reference call
        sites pass ``matchable=True`` to exclude non-matchable props —
        zavod/zavod/exporters/simplecsv.py:69-104, names.py:19,
        integration/logic.py:25-78). The engine's property-type map is
        ``model/registry.py`` TYPE_PROPS."""
        from opensanctions_spark.model.registry import (
            NON_MATCHABLE_PROPS,
            TYPE_PROPS,
        )

        type_name = getattr(prop_type, "name", str(prop_type))
        props: tuple[str, ...] = TYPE_PROPS.get(type_name, (type_name,))
        if matchable:
            props = tuple(p for p in props if p not in NON_MATCHABLE_PROPS)
        out: list[str] = []
        for s in self._stmts:
            if s[0] in props and s[1] not in out:
                out.append(s[1])
        return out

    @property
    def caption(self) -> str:
        """Display name (``followthemoney`` EntityProxy.caption): the
        first value of the schema's caption-property list (per-schema
        ``caption:`` order — e.g. Address captions by ``full``), falling
        back to the schema's display label."""
        from opensanctions_spark.model.registry import (
            SCHEMA_CAPTIONS,
            schema_label,
        )

        caption_props = SCHEMA_CAPTIONS.get(
            self.schema.name, ("name", "alias", "title")
        )
        for prop in caption_props:
            vals = self.get(prop)
            if vals:
                return vals[0]
        return schema_label(self.schema.name)[0]

    def has(self, prop: str) -> bool:
        return any(s[0] == prop for s in self._stmts)

    def first(self, prop: str) -> str | None:
        vals = self.get(prop)
        return vals[0] if vals else None

    @property
    def statements(self):
        return list(self._stmts)

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Entity({self.schema.name}, {self.id!r}, {len(self._stmts)} stmts)>"


class CrawlerContext:
    """The driver-side crawl context (``zavod/zavod/context.py``).

    Statements buffer as tuples and flush to DataFrame batches every
    ``flush_rows`` emits; ``statements_df()`` unions the batches and
    stamps the canonical IR columns. ``issues`` collects warn/error
    entries (the A7 channel); ``resources`` collects export_resource
    registrations (the K12 resources.json input).
    """

    SOURCE_TITLE = "Source data"

    def __init__(
        self,
        spark: SparkSession,
        config: Any,
        work_dir: str | None = None,
        flush_rows: int = 100_000,
    ) -> None:
        from opensanctions_spark.functions.lookups import Lookup

        self.spark = spark
        self.dataset = config
        self.work_dir = work_dir
        self.flush_rows = flush_rows
        self.issues: list[dict[str, Any]] = []
        self.resources: list[dict[str, Any]] = []
        self.log = _Log(self.issues)
        self._lookups: dict[str, Lookup] = dict(getattr(config, "lookups", {}) or {})
        self._buffer: list[tuple] = []
        self._batches: list[DataFrame] = []
        self._n_emitted = 0

    # -- entity construction ------------------------------------------------

    def make(self, schema: str) -> Entity:
        return Entity(Schema(schema))

    def make_id(self, *parts: Any, hash_prefix: str | None = None) -> str | None:
        """Hash-based id (``zavod/zavod/context.py:512-531``): the
        dataset name (or ``hash_prefix``) plus the non-None parts,
        hashed — identical derivation to the catalog's F8 ``make_id``
        (md5 of '|'-joined parts, ``osp-`` prefix)."""
        clean = [str(p) for p in parts if p is not None and str(p).strip()]
        if not clean:
            return None
        prefix = hash_prefix or getattr(self.dataset, "name", "osp")
        digest = hashlib.md5("|".join([prefix, *clean]).encode("utf-8")).hexdigest()
        return f"osp-{digest}"

    def make_slug(self, *parts: Any, prefix: str | None = None) -> str | None:
        """Slug-based id (``zavod/zavod/context.py:504-510``):
        ``{dataset}-{slugified parts}``."""
        clean = []
        for p in parts:
            if p is None:
                continue
            slug = _SLUG_RE.sub("-", str(p).lower()).strip("-")
            if slug:
                clean.append(slug)
        if not clean:
            return None
        prefix = prefix if prefix is not None else getattr(self.dataset, "name", "osp")
        return "-".join([prefix, *clean]) if prefix else "-".join(clean)

    # -- lookups (J13) ------------------------------------------------------

    def lookup(self, name: str, value: str | None):
        lk = self._lookups.get(name)
        return lk.match(value) if lk is not None else None

    def lookup_value(
        self, name: str, value: str | None, default: str | None = None
    ) -> str | None:
        lk = self._lookups.get(name)
        if lk is None:
            return default
        return lk.get_value(value, default=default)

    # -- emit ---------------------------------------------------------------

    def emit(
        self, entity: Entity, external: bool = False, origin: str | None = None
    ) -> None:
        """Append the entity's statements to the run
        (``zavod/zavod/context.py:622-666``); entities without an id are
        a crawler bug — fail loudly like the reference's assert.
        ``origin`` sets the origin for statements where none has been
        provided (context.py:631)."""
        if entity.id is None:
            raise ValueError(f"entity of schema {entity.schema.name} has no id")
        for prop, value, lang, stmt_origin, original_value in entity.statements:
            self._buffer.append(
                (
                    entity.id, entity.schema.name, prop, value,
                    lang, stmt_origin if stmt_origin is not None else origin,
                    original_value, external,
                )
            )
        self._n_emitted += 1
        if len(self._buffer) >= self.flush_rows:
            self._flush()

    def _flush(self) -> None:
        if not self._buffer:
            return
        batch = self.spark.createDataFrame(
            self._buffer,
            "entity_id STRING, schema STRING, prop STRING, value STRING, "
            "lang STRING, origin STRING, original_value STRING, "
            "external BOOLEAN",
        )
        self._batches.append(batch)
        self._buffer = []

    def statements_df(self, run_time: str | None = None) -> DataFrame:
        """The crawl's statements in the canonical IR — same stamping as
        the melt factories (content-hash ids, P5 guard, seen
        timestamps), with crawler-provided lang/origin/original_value
        and external preserved."""
        from pyspark.sql import functions as F

        from opensanctions_spark.model.melt import RUN_TIME, finish_statements

        self._flush()
        if not self._batches:
            batch = self.spark.createDataFrame(
                [],
                "entity_id STRING, schema STRING, prop STRING, value STRING, "
                "lang STRING, origin STRING, original_value STRING, "
                "external BOOLEAN",
            )
            self._batches.append(batch)
        df = self._batches[0]
        for b in self._batches[1:]:
            df = df.unionByName(b)
        ts = run_time or RUN_TIME
        df = df.withColumn("first_seen", F.lit(ts)).withColumn("last_seen", F.lit(ts))
        return finish_statements(df, dataset=getattr(self.dataset, "name", "osp"))

    # -- audit / resources / issues ----------------------------------------

    def audit_data(self, data: dict[str, Any], ignore: list[str] | None = None) -> None:
        """Warn about unconsumed source fields
        (``zavod/zavod/context.py:600-620``)."""
        ignore = set(ignore or [])
        leftover = {
            k: v for k, v in data.items()
            if k not in ignore and v is not None and str(v).strip()
        }
        if leftover:
            self.log.warn("Unconsumed source fields", fields=sorted(leftover))

    def get_resource_path(self, name: str) -> str:
        base = self.work_dir or os.path.join(".", "resources")
        os.makedirs(base, exist_ok=True)
        return os.path.join(base, name)

    @property
    def data_url(self) -> str | None:
        """The dataset's configured source URL (``context.data_url`` —
        dataset YAML ``data.url``, ``zavod/zavod/context.py``)."""
        meta = getattr(self.dataset, "metadata", None) or {}
        data = meta.get("data") or {}
        url = data.get("url") or getattr(self.dataset, "data_url", None)
        return url

    def fetch_resource(self, name: str, url: str | None = None, **kwargs: Any) -> str:
        """Fetch the source document into the run's resource directory
        (``zavod/zavod/context.py fetch_resource``). Local paths and
        file:// URLs copy directly; http(s) URLs route through the S8
        cached fetcher (``sources.fetch_text``) when available, so a
        crawler ported on an import swap keeps its exact call shape."""
        import shutil
        import urllib.parse

        url = url or self.data_url
        if url is None:
            raise ValueError("no url given and the dataset has no data.url")
        dest = self.get_resource_path(name)
        parsed = urllib.parse.urlparse(str(url))
        if parsed.scheme in ("", "file"):
            src = parsed.path if parsed.scheme == "file" else str(url)
            if os.path.abspath(src) != os.path.abspath(dest):
                shutil.copyfile(src, dest)
            return dest
        if _HTTP_FETCHER is None:
            raise NotImplementedError(
                f"no HTTP fetcher registered for {url!r}: this environment "
                "has no network — wire one with register_http_fetcher(fn), "
                "or point data.url at a local fixture (file:// or a path)"
            )
        payload = _HTTP_FETCHER(str(url), **kwargs)
        mode = "wb" if isinstance(payload, bytes) else "w"
        with open(dest, mode) as fh:
            fh.write(payload)
        return dest

    def fetch_html(self, url: str, **kwargs: Any):
        """GET/POST + lenient HTML parse through the pluggable HTTP
        boundary (``zavod/zavod/context.py fetch_html``): the registered
        fetcher receives the url plus the request kwargs (data, headers,
        method, cache_days, ...) and returns the body; the body parses
        through the compat DOM."""
        from opensanctions_spark.helpers import parse_html

        parsed_scheme = str(url).split(":", 1)[0]
        if parsed_scheme in ("file",) or os.path.exists(str(url)):
            src = str(url)[7:] if str(url).startswith("file://") else str(url)
            with open(src) as fh:
                return parse_html(fh.read())
        if _HTTP_FETCHER is None:
            raise NotImplementedError(
                f"no HTTP fetcher registered for {url!r}: wire one with "
                "register_http_fetcher(fn)"
            )
        body = _HTTP_FETCHER(str(url), **kwargs)
        if isinstance(body, bytes):
            body = body.decode("utf-8", "replace")
        return parse_html(body)

    def clear_url(self, url: str, **kwargs: Any) -> None:
        """Evict a cached fetch (``context.clear_url``). Cache discipline
        belongs to the registered fetcher: when it exposes a ``clear``
        attribute that is called, otherwise this is a logged no-op."""
        clear = getattr(_HTTP_FETCHER, "clear", None)
        if clear is not None:
            clear(str(url), **kwargs)
        else:
            self.log.info("clear_url: no cache-evicting fetcher", url=url)

    def parse_resource_xml(self, path: str):
        """Parse a fetched XML resource into an ElementTree with
        namespaces stripped (``zavod/zavod/context.py:480-491`` — the
        reference returns an lxml tree; compat is stdlib ElementTree,
        the same DOM surface the helpers operate on)."""
        from xml.etree import ElementTree

        from opensanctions_spark.helpers import remove_namespace

        tree = ElementTree.parse(path)
        remove_namespace(tree.getroot())
        return tree

    def fetch_json(self, url: str, params: dict | None = None, **kwargs: Any):
        """GET + JSON-parse through the pluggable HTTP boundary
        (``zavod/zavod/context.py fetch_json``). file:// and local paths
        parse directly (fixtures); http(s) requires a registered fetcher."""
        import json as _json
        import urllib.parse

        parsed = urllib.parse.urlparse(str(url))
        if parsed.scheme in ("", "file"):
            # fixture path: params don't apply to a static document
            src = parsed.path if parsed.scheme == "file" else str(url)
            with open(src) as fh:
                return _json.load(fh)
        if params:
            sep = "&" if "?" in url else "?"
            url = url + sep + urllib.parse.urlencode(params)
        if _HTTP_FETCHER is None:
            raise NotImplementedError(
                f"no HTTP fetcher registered for {url!r}: wire one with "
                "register_http_fetcher(fn)"
            )
        payload = _HTTP_FETCHER(str(url), **kwargs)
        if isinstance(payload, bytes):
            payload = payload.decode("utf-8")
        return _json.loads(payload)

    def export_resource(
        self, path: str, mime_type: str | None = None, title: str | None = None
    ) -> None:
        self.resources.append(
            {"name": os.path.basename(str(path)), "path": str(path),
             "mime_type": mime_type, "title": title}
        )

    @property
    def n_emitted(self) -> int:
        return self._n_emitted

    @property
    def lang(self) -> str | None:
        """Dataset default language (``context.lang`` in the reference —
        dataset YAML ``lang:``, surfaced here from config metadata)."""
        meta = getattr(self.dataset, "metadata", None) or {}
        return meta.get("lang") or getattr(self.dataset, "lang", None)


@dataclass
class _Log:
    """Minimal structlog-shaped logger writing to the issues channel
    (``zavod/zavod/runtime/issues.py:27-63`` analogue — A7 counts over
    ``level``)."""

    issues: list = field(default_factory=list)

    def _record(self, level: str, message: str, **data: Any) -> None:
        self.issues.append({"level": level, "message": message, "data": data})

    def debug(self, message: str, **data: Any) -> None:
        self._record("debug", message, **data)

    def info(self, message: str, **data: Any) -> None:
        self._record("info", message, **data)

    def warn(self, message: str, **data: Any) -> None:
        self._record("warning", message, **data)

    warning = warn

    def error(self, message: str, **data: Any) -> None:
        self._record("error", message, **data)


#: pluggable HTTP boundary for ``fetch_resource`` — (url, **kwargs) ->
#: str | bytes. None = network unavailable (this container); a real
#: deployment registers a requests/httpx wrapper with retry + the S8
#: cache discipline.
_HTTP_FETCHER: Any = None


def register_http_fetcher(fn: Any) -> None:
    global _HTTP_FETCHER
    _HTTP_FETCHER = fn


def crawl(
    spark: SparkSession,
    config: Any,
    entry_point,
    work_dir: str | None = None,
    run_time: str | None = None,
) -> tuple[DataFrame, CrawlerContext]:
    """Run one crawler entry point (``zavod/zavod/crawl.py:19-77``):
    build the context, invoke ``entry_point(context)``, return the
    statements DataFrame + the context (issues/resources). Feed the
    frame to ``plans/run.py`` ``run_dataset``/``crawl_dataset`` for the
    rest of the lifecycle."""
    context = CrawlerContext(spark, config, work_dir=work_dir)
    entry_point(context)
    return context.statements_df(run_time=run_time), context
