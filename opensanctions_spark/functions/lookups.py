"""Datapatch-style lookup tables compiled to Spark column expressions.

The reference cleans messy source values through YAML-declared lookup
tables (the ``datapatch`` library, wired in via
``zavod/zavod/runtime/lookups.py:16-83``, ``zavod/zavod/context.py:533-574``
and per-dataset config ``zavod/zavod/meta/dataset.py:117-120``): each
lookup holds *options* that match a raw value by exact string (``match``),
substring (``contains``) or regular expression (``regex``) and rewrite it
to a normalized ``value`` / ``values`` list, optionally re-homing it onto
a different property (``prop``).

The reference evaluates these per-value in Python. Here a lookup compiles
ONCE (driver-side) into a pure Column expression:

- exact ``match`` options fold into a literal ``F.create_map`` probe —
  a constant-folded broadcast map lookup, never a join, never a UDF;
- ``contains`` / ``regex`` options chain into ``CASE WHEN`` with
  ``F.contains`` / ``rlike`` in datapatch's precedence order
  (weight descending, then declaration order — first hit wins);
- when ONLY exact options exist the whole lookup is the map probe.

Everything stays inside whole-stage codegen; at 100 TB the lookup cost is
the cost of the string comparison, with no shuffle and no Python.

Scope notes vs datapatch: ``normalize: true`` is rendered as
whitespace-collapse + strip (datapatch additionally strips some
punctuation via ``normality``); ambiguous same-weight multi-matches take
the first declared option instead of raising — both differences are
conservative for a column compiler and covered by tests mirroring the
reference fixture (``zavod/zavod/tests/fixtures/testdataset1/
testdataset1.yml:46-82``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ensure_list(value: Any) -> list[Any]:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return list(value)
    return [value]


@dataclass
class LookupOption:
    """One datapatch option: match criteria + the rewrite result."""

    match: list[str | None] = field(default_factory=list)
    contains: list[str] = field(default_factory=list)
    regex: list[str] = field(default_factory=list)
    weight: int = 0
    #: result attributes: ``value``, ``values``, ``prop`` and any extras
    result: dict[str, Any] = field(default_factory=dict)

    @property
    def values(self) -> list[str]:
        """Result value list — ``values`` wins, else ``[value]``
        (datapatch ``Result.values``)."""
        vals = _ensure_list(self.result.get("values"))
        if vals:
            return [str(v) for v in vals]
        value = self.result.get("value")
        return [] if value is None else [str(value)]

    @property
    def prop(self) -> str | None:
        return self.result.get("prop")

    def __getattr__(self, name: str) -> Any:
        # datapatch Result semantics: any result key reads as an
        # attribute (res.schema, res.names, ...), absent keys as None
        result = self.__dict__.get("result")
        if result is None or name.startswith("__"):
            raise AttributeError(name)
        return result.get(name)


@dataclass
class Lookup:
    """One named lookup table (``datapatch.lookup.Lookup``)."""

    name: str
    options: list[LookupOption] = field(default_factory=list)
    normalize: bool = False
    lowercase: bool = False
    required: bool = False

    # -- driver-side evaluation (the reference's per-value path) ----------
    def _norm(self, value: str | None) -> str | None:
        if value is None:
            return None
        text = str(value)
        if self.normalize:
            text = re.sub(r"\s+", " ", text).strip()
        if self.lowercase:
            text = text.lower()
        return text

    def _ordered(self) -> list[LookupOption]:
        # weight descending, declaration order stable — datapatch picks
        # the highest-weight matching option
        order = sorted(enumerate(self.options), key=lambda t: (-t[1].weight, t[0]))
        return [o for _, o in order]

    def match(self, value: str | None) -> LookupOption | None:
        """First (highest-weight) option matching ``value`` —
        ``Lookup.match`` in datapatch; None when nothing matches."""
        norm = self._norm(value)
        for opt in self._ordered():
            if norm in (self._norm(m) for m in opt.match):
                return opt
            if norm is not None and any(
                c and self._norm(c) in norm for c in opt.contains
            ):
                return opt
            if value is not None and any(
                re.search(r, str(value)) for r in opt.regex
            ):
                return opt
        return None

    def get_value(self, value: str | None, default: str | None = None) -> str | None:
        """``context.lookup_value`` (``zavod/zavod/context.py:533-556``)."""
        res = self.match(value)
        if res is None or res.result.get("value") is None:
            return default
        return str(res.result["value"])

    def get_values(
        self, value: str | None, default: list[str] | None = None
    ) -> list[str]:
        """``type_lookup`` (``zavod/zavod/runtime/lookups.py:40-49``):
        normalized override list, or the value itself untouched."""
        res = self.match(value)
        if res is None:
            if default is not None:
                return default
            return [] if value is None else [str(value)]
        return res.values

    # -- Spark compilation ------------------------------------------------
    def _norm_col(self, col: Column) -> Column:
        if self.normalize:
            col = F.trim(F.regexp_replace(col, r"\s+", " "))
        if self.lowercase:
            col = F.lower(col)
        return col

    def _exact_only(self) -> bool:
        return all(
            not o.contains and not o.regex and None not in o.match
            for o in self.options
        )

    def _option_condition(self, opt: LookupOption, col: Column) -> Column:
        """Boolean Column: does this option match the raw value column?"""
        norm = self._norm_col(col)
        conds: list[Column] = []
        matches = [self._norm(m) for m in opt.match if m is not None]
        if matches:
            conds.append(norm.isin(matches))
        if None in opt.match:
            conds.append(col.isNull())
        for c in opt.contains:
            cn = self._norm(c)
            if cn:
                conds.append(norm.contains(cn))
        for r in opt.regex:
            conds.append(col.rlike(r))
        if not conds:
            return F.lit(False)
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def value_column(self, col: Column, default: Column | None = None) -> Column:
        """Compile ``lookup_value`` to a Column: the matched option's
        ``value`` (NULL-valued options yield the default), else default
        (the input column itself unless given).

        Exact-only lookups become one literal-map probe; anything with
        contains/regex/weights becomes a CASE WHEN chain in datapatch
        precedence. Both are constant expressions Catalyst folds — no
        join, no UDF, no shuffle.
        """
        if default is None:
            default = col
        if self._exact_only() and self.options:
            pairs: list[Column] = []
            for opt in self._ordered():
                value = opt.result.get("value")
                for m in opt.match:
                    key = self._norm(m)
                    if key is None:
                        continue
                    pairs.append(F.lit(key))
                    pairs.append(
                        F.lit(None).cast("string")
                        if value is None
                        else F.lit(str(value))
                    )
            probe = F.create_map(*pairs)[self._norm_col(col)]
            return F.coalesce(probe, default)
        expr: Column | None = None
        for opt in self._ordered():
            value = opt.result.get("value")
            res = (
                F.lit(None).cast("string") if value is None else F.lit(str(value))
            )
            cond = self._option_condition(opt, col)
            expr = F.when(cond, res) if expr is None else expr.when(cond, res)
        if expr is None:
            return default
        return F.coalesce(expr.otherwise(default), default)

    def values_column(self, col: Column) -> Column:
        """Compile ``get_values`` to an ``array<string>`` Column: the
        matched option's value list, else ``array(col)`` (or empty array
        for NULL input with no null-match option)."""
        fallback = F.when(col.isNull(), F.array().cast("array<string>")).otherwise(
            F.array(col)
        )
        expr: Column | None = None
        for opt in self._ordered():
            if opt.prop is not None and not opt.values:
                # Re-home-only option: the reference keeps the ORIGINAL
                # value under the new property when the option carries a
                # ``prop`` override but no value/values
                # (zavod/zavod/runtime/lookups.py:79-81).
                res = fallback
            else:
                res = F.array(*[F.lit(v) for v in opt.values]).cast("array<string>")
            cond = self._option_condition(opt, col)
            expr = F.when(cond, res) if expr is None else expr.when(cond, res)
        if expr is None:
            return fallback
        return expr.otherwise(fallback)

    def prop_column(self, col: Column, prop_col: Column) -> Column:
        """Compile the property-rewrite half of ``prop_lookup``
        (``zavod/zavod/runtime/lookups.py:52-83``): the matched option's
        ``prop`` override, else the existing property column."""
        expr: Column | None = None
        for opt in self._ordered():
            res = F.lit(opt.prop) if opt.prop is not None else prop_col
            cond = self._option_condition(opt, col)
            expr = F.when(cond, res) if expr is None else expr.when(cond, res)
        if expr is None:
            return prop_col
        return expr.otherwise(prop_col)


def _parse_option(config: dict[str, Any]) -> LookupOption:
    cfg = dict(config)
    return LookupOption(
        match=_ensure_list(cfg.pop("match", [])),
        contains=[str(c) for c in _ensure_list(cfg.pop("contains", []))],
        regex=[str(r) for r in _ensure_list(cfg.pop("regex", []))],
        weight=int(cfg.pop("weight", 0)),
        result=cfg,
    )


def parse_lookup(name: str, config: dict[str, Any]) -> Lookup:
    """One lookup from its YAML mapping — supports the ``options`` list
    and datapatch's ``map`` shorthand (exact value → value)."""
    options = [_parse_option(o) for o in config.get("options", [])]
    for key, value in (config.get("map") or {}).items():
        options.append(LookupOption(match=[key], result={"value": value}))
    return Lookup(
        name=name,
        options=options,
        normalize=bool(config.get("normalize", False)),
        lowercase=bool(config.get("lowercase", False)),
        required=bool(config.get("required", False)),
    )


def load_lookups(source: str | dict[str, Any]) -> dict[str, Lookup]:
    """Load a dataset's ``lookups:`` block — from a YAML string, a path
    to a dataset YAML, or an already-parsed mapping
    (``zavod/zavod/meta/dataset.py:117-120``)."""
    import os

    if isinstance(source, str):
        import yaml

        if os.path.exists(source):
            with open(source) as fh:
                data = yaml.safe_load(fh)
        else:
            data = yaml.safe_load(source)
    else:
        data = source
    if not isinstance(data, dict):
        raise ValueError("lookup config must be a mapping")
    block = data.get("lookups", data)
    return {name: parse_lookup(name, cfg or {}) for name, cfg in block.items()}


def apply_value_lookup(
    df: DataFrame, lookup: Lookup, column: str, out: str | None = None
) -> DataFrame:
    """Rewrite ``column`` through the lookup (single-value semantics) —
    the ``context.lookup_value`` cleaning step as one map-only column op."""
    return df.withColumn(out or column, lookup.value_column(F.col(column)))


def apply_prop_lookup(
    df: DataFrame, lookup: Lookup, prop_col: str = "prop", value_col: str = "value"
) -> DataFrame:
    """Full ``prop_lookup`` semantics over a statements frame: rewrite the
    value through the lookup's value LIST (dropping statements whose
    matched option maps to no values) and re-home the property where the
    option carries a ``prop`` override. One explode, no shuffle.
    """
    value = F.col(value_col)
    return (
        df.withColumn("__lk_values", lookup.values_column(value))
        .withColumn(prop_col, lookup.prop_column(value, F.col(prop_col)))
        .withColumn(value_col, F.explode("__lk_values"))
        .drop("__lk_values")
    )


def apply_statement_lookups(
    df: DataFrame,
    lookups: dict[str, Lookup],
    prop_col: str = "prop",
    value_col: str = "value",
) -> DataFrame:
    """Dataset-config cleaning pass over a statements frame: every lookup
    named ``prop.<name>`` rewrites the values of that property — value
    normalization, one-to-many expansion, empty-result drops and property
    re-homing, exactly the reference's ``prop_lookup`` applied at emit
    time (``zavod/zavod/runtime/lookups.py:52-83``).

    All targeted lookups compile into ONE pair of CASE expressions plus a
    single explode — a map-only stage regardless of how many lookup
    tables the dataset declares. Statement ids are re-derived afterwards
    (the reference hashes the cleaned value too), and the raw value is
    preserved in ``original_value`` where the lookup changed it
    (``zavod/zavod/context.py:622-640`` keeps the pre-clean form).
    """
    targeted = {
        name[len("prop."):]: lk
        for name, lk in lookups.items()
        if name.startswith("prop.")
    }
    if not targeted:
        return df
    value = F.col(value_col)
    prop = F.col(prop_col)
    vals_expr: Column | None = None
    prop_expr: Column | None = None
    for pname, lk in targeted.items():
        cond = prop == F.lit(pname)
        v = lk.values_column(value)
        p = lk.prop_column(value, prop)
        vals_expr = F.when(cond, v) if vals_expr is None else vals_expr.when(cond, v)
        prop_expr = F.when(cond, p) if prop_expr is None else prop_expr.when(cond, p)
    out = (
        df.withColumn("__lk_vals", vals_expr.otherwise(F.array(value)))
        .withColumn(prop_col, prop_expr.otherwise(prop))
        .withColumn("__lk_raw", value)
        .withColumn(value_col, F.explode("__lk_vals"))
    )
    if "original_value" in df.columns:
        out = out.withColumn(
            "original_value",
            F.when(
                F.col(value_col) != F.col("__lk_raw"),
                F.coalesce(F.col("original_value"), F.col("__lk_raw")),
            ).otherwise(F.col("original_value")),
        )
    if "id" in df.columns and "dataset" in df.columns:
        from opensanctions_spark.model.melt import statement_id

        out = out.withColumn(
            "id",
            statement_id(
                F.col("dataset"), F.col("entity_id"), prop, F.col(value_col)
            ),
        )
    return out.drop("__lk_vals", "__lk_raw")
