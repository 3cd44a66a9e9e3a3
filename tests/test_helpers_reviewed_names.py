"""Reviewed-names compat surface (``opensanctions_spark.helpers``):
semantics pinned to ``zavod/zavod/helpers/names.py:469-830`` and its
tests (``zavod/zavod/tests/helpers/names/test_names.py:144-340``) —
review-gated name application, regularity-driven re-categorisation
suggestions, the LLM-cleaning fallback path, and the bridge to the S12
review DataFrame."""

from __future__ import annotations

import json
from types import SimpleNamespace

import pytest

from opensanctions_spark import helpers as h
from opensanctions_spark.crawler import CrawlerContext


def _context(spark=None, name="testds", metadata=None):
    config = SimpleNamespace(name=name, metadata=metadata or {}, lookups={})
    return CrawlerContext(spark, config)


def _person(ctx):
    entity = ctx.make("Person")
    entity.id = "bla"
    return entity


def _stmt_values(entity, prop):
    return [v for p, v, *_rest in entity._stmts if p == prop]


# --------------------------------------------------------------------------
# Names model


def test_names_equality_semantics():
    # order/repetition-insensitive within a prop; str == LangText(lang=None)
    assert h.Names(name="Jim Doe") == h.Names(name=["Jim Doe", "Jim Doe"])
    assert h.Names(name=h.LangText(text="Jim Doe")) == h.Names(name="Jim Doe")
    assert h.Names(name="Jim Doe") != h.Names(alias="Jim Doe")
    assert h.Names(name=["A", "B"]) == h.Names(name=["B", "A"])
    assert h.Names().is_empty()
    assert not h.Names(name="x").is_empty()
    assert h.Names(name="  ").is_empty()  # blank values are skipped


def test_names_add_and_simplified():
    n = h.Names()
    n.add("name", "A")
    n.add("name", "B", lang="deu")
    assert dict(n.as_langtexts())["name"] == [
        h.LangText("A"), h.LangText("B", "deu"),
    ]
    s = h.Names(name=["Only One"]).simplified()
    assert s.name == "Only One"
    payload = n.to_payload()
    assert payload == {"name": ["A", {"text": "B", "lang": "deu"}]}
    assert h.Names.from_payload(payload) == n


def test_review_key_stability():
    ctx = _context()
    e = _person(ctx)
    a = h.review_key(h.review_key_parts(e, h.Names(name=["B", "A"])))
    b = h.review_key(h.review_key_parts(e, h.Names(name=["A", "B"])))
    assert a == b  # sorted parts: insertion order never changes the key
    c = h.review_key(h.review_key_parts(e, h.Names(alias=["A", "B"])))
    assert a != c  # but the prop does


def test_derive_original_values():
    original = h.Names(name="Jim Doe; James Doe")
    extracted = h.Names(name="James Doe", alias="Jim Doe")
    derived = h.derive_original_values(original, extracted)
    # single original value → used for every extracted name
    assert derived == {
        "James Doe": "Jim Doe; James Doe",
        "Jim Doe": "Jim Doe; James Doe",
    }
    # exact match → no original_value needed
    assert h.derive_original_values(
        h.Names(name="Jim Doe"), h.Names(name="Jim Doe")
    ) == {}
    # containment picks the containing original when several exist
    derived = h.derive_original_values(
        h.Names(name=["Jim Doe (bad)", "Other Guy"]), h.Names(name="Jim Doe")
    )
    assert derived == {"Jim Doe": "Jim Doe (bad)"}


# --------------------------------------------------------------------------
# apply_reviewed_names (reference test_names.py:144-340)


def test_apply_reviewed_names_no_cleaning_needed():
    ctx = _context()
    e = _person(ctx)
    original = h.Names(name="Jim Doe")
    h.apply_reviewed_names(ctx, e, original=original)
    assert _stmt_values(e, "name") == ["Jim Doe"]
    assert _stmt_values(e, "alias") == []
    key = h.review_key(h.review_key_parts(e, original))
    assert h.get_review(ctx, key) is None  # no review row created


def test_apply_reviewed_names_manual_irregular():
    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe; James Doe"  # ';' split phrase → irregular
    original = h.Names(name=raw)
    h.apply_reviewed_names(ctx, e, original=original)

    key = h.review_key(h.review_key_parts(e, original))
    review = h.get_review(ctx, key)
    assert review is not None and not review.accepted
    assert review.extracted_data == original  # no LLM: original extraction

    # until accepted, the original string is applied
    assert _stmt_values(e, "name") == [raw]
    assert _stmt_values(e, "alias") == []

    # simulate manually editing and accepting the review
    review.accepted = True
    review.extracted_data = h.Names(name=["James Doe"], alias=["Jim Doe"])
    review.save(ctx, new_revision=True)

    e2 = _person(ctx)
    h.apply_reviewed_names(ctx, e2, original=original)
    assert _stmt_values(e2, "name") == ["James Doe"]
    assert _stmt_values(e2, "alias") == ["Jim Doe"]
    # origin + original_value stamped on applied reviewed names
    stmts = [s for s in e2._stmts if s[0] == "name"]
    assert stmts[0][3] == "analyst"  # origin
    assert stmts[0][4] == raw  # original_value derived from single original


def test_apply_reviewed_names_llm_fallback_without_cleaner():
    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe; James Doe"
    h.apply_reviewed_names(ctx, e, original=h.Names(name=raw), llm_cleaning=True)
    # falls back to the original + analyst review; a warning is logged
    assert _stmt_values(e, "name") == [raw]
    assert any(
        i["level"] == "warning" and "no name cleaner" in i["message"]
        for i in ctx.issues
    )


def test_apply_reviewed_names_llm_cleaner_registered():
    calls = []

    def cleaner(context, schema, names):
        calls.append(schema)
        return h.Names(name="James Doe", alias="Jim Doe")

    h.register_name_cleaner(cleaner, version="test-model-1")
    try:
        ctx = _context()
        e = _person(ctx)
        raw = "Jim Doe; James Doe"
        original = h.Names(name=raw)
        h.apply_reviewed_names(ctx, e, original=original, llm_cleaning=True)
        assert calls == ["Person"]
        # until accepted, original applies
        assert _stmt_values(e, "name") == [raw]

        key = h.review_key(h.review_key_parts(e, original))
        review = h.get_review(ctx, key)
        assert review.extracted_data == h.Names(name="James Doe", alias="Jim Doe")
        assert review.origin == "test-model-1"
        review.accepted = True
        review.save(ctx)

        e2 = _person(ctx)
        h.apply_reviewed_names(ctx, e2, original=original, llm_cleaning=True)
        assert _stmt_values(e2, "name") == ["James Doe"]
        assert _stmt_values(e2, "alias") == ["Jim Doe"]
    finally:
        h.register_name_cleaner(None)


def test_apply_reviewed_names_suggested_with_llm_cleaning_raises():
    ctx = _context()
    e = _person(ctx)
    with pytest.raises(AssertionError, match="LLM cleaning is enabled"):
        h.apply_reviewed_names(
            ctx, e,
            original=h.Names(name="Jim Doe"),
            suggested=h.Names(name="James Doe"),
            llm_cleaning=True,
        )


def test_apply_reviewed_names_suggested_no_llm():
    """A review is created when suggested differs from original even if
    neither is irregular; source_value matches the reference's JSON."""
    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe"  # not irregular
    original = h.Names(name=raw)
    suggested = h.Names(alias=raw)
    h.apply_reviewed_names(ctx, e, original=original, suggested=suggested)

    key = h.review_key(h.review_key_parts(e, original))
    review = h.get_review(ctx, key)
    assert review.extracted_data == suggested
    assert review.source_value == json.dumps(
        {"entity_schema": "Person", "original": {"name": ["Jim Doe"]}}, indent=2
    )
    # until accepted, the ORIGINAL categorisation applies
    assert _stmt_values(e, "name") == [raw]
    assert _stmt_values(e, "alias") == []


def test_review_names_suggested_equals_original():
    """No review unless is_irregular forces one (crawler's own notion)."""
    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe"
    original = h.Names(name=raw)
    suggested = h.Names(name=raw)
    assert h.review_names(ctx, e, original=original, suggested=suggested) is None
    key = h.review_key(h.review_key_parts(e, original))
    assert h.get_review(ctx, key) is None
    r = h.review_names(
        ctx, e, original=original, suggested=suggested, is_irregular=True
    )
    assert r is not None and h.get_review(ctx, key) is r


def test_apply_reviewed_name_string_valid_and_invalid_prop():
    ctx = _context()
    e = _person(ctx)
    h.apply_reviewed_name_string(ctx, e, string="Jim Doe", original_prop="alias")
    assert _stmt_values(e, "alias") == ["Jim Doe"]
    assert _stmt_values(e, "name") == []
    with pytest.raises(ValueError, match="Invalid original_prop"):
        h.apply_reviewed_name_string(ctx, e, string="X Y", original_prop="nmae")


# --------------------------------------------------------------------------
# check_names_regularity + suggesting heuristics


def test_check_names_regularity_suggests_weak_alias():
    ctx = _context(metadata={
        "names": {"suggest_weak_alias_person_single_token": True}
    })
    e = _person(ctx)
    e.dataset = ctx.dataset  # spec-driven checks read entity.dataset
    irregular, suggested = h.check_names_regularity(
        e, h.Names(name=["Dr. Foopie", "Jim Doe"])
    )
    assert irregular
    # single-token (after honorific strip) moved name → weakAlias; the
    # ORIGINAL string moves (names.py:487 appends name_val, not the
    # stripped form)
    assert suggested == h.Names(name=["Jim Doe"], weakAlias=["Dr. Foopie"])


def test_check_names_regularity_suggests_abbreviation():
    ctx = _context(metadata={
        "names": {
            "suggest_abbreviation_uppercase_org_single_token_shorter_than": 6
        }
    })
    e = ctx.make("Organization")
    e.id = "org1"
    e.dataset = ctx.dataset
    irregular, suggested = h.check_names_regularity(
        e, h.Names(name=["NASA", "Long Agency Name"])
    )
    assert irregular
    assert suggested == h.Names(
        name=["Long Agency Name"], abbreviation=["NASA"]
    )
    # a Person never triggers the org heuristic
    p = _person(ctx)
    p.dataset = ctx.dataset
    irregular, _ = h.check_names_regularity(p, h.Names(name="Someone Fine"))
    assert not irregular


def test_check_names_regularity_regular_passthrough():
    ctx = _context()
    e = _person(ctx)
    irregular, suggested = h.check_names_regularity(e, h.Names(name="Jim Doe"))
    assert not irregular
    assert suggested == h.Names(name="Jim Doe")


# --------------------------------------------------------------------------
# S12 bridge


def test_review_rows_round_trip_through_s12_table():
    """Decisions recorded in the S12 review table (REVIEW_SCHEMA rows)
    drive apply_reviewed_names on the next crawl."""
    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe; James Doe"
    original = h.Names(name=raw)
    h.apply_reviewed_names(ctx, e, original=original)
    rows = h.reviews_to_rows(ctx)
    assert len(rows) == 1
    key, status, value, reviewer = rows[0]
    assert status == "unreviewed" and reviewer == "analyst"
    assert json.loads(value) == {"name": [raw]}

    # an analyst edits + accepts DataFrame-side; load back into a fresh run
    edited = json.dumps({"name": ["James Doe"], "alias": ["Jim Doe"]})
    ctx2 = _context()
    h.load_review_rows(ctx2, [(key, "accepted", edited, "analyst")])
    e2 = _person(ctx2)
    h.apply_reviewed_names(ctx2, e2, original=original)
    assert _stmt_values(e2, "name") == ["James Doe"]
    assert _stmt_values(e2, "alias") == ["Jim Doe"]


# --------------------------------------------------------------------------
# make_position translate_name


def test_make_position_translate_name():
    def translator(context, text, lang):
        assert (text, lang) == ("Ministre des Finances", "fra")
        return ("Minister of Finance", "eng", "test-model")

    h.register_position_translator(translator)
    try:
        ctx = _context(metadata={"lang": "fra"})
        pos = h.make_position(ctx, "Ministre des Finances", translate_name=True)
        names = [s for s in pos._stmts if s[0] == "name"]
        assert names == [(
            "name", "Minister of Finance", "eng", "test-model",
            "Ministre des Finances",
        )]
        # the id is derived from the UNTRANSLATED name: identical to a
        # position made without translation
        plain = h.make_position(
            _context(metadata={"lang": "fra"}), "Ministre des Finances"
        )
        assert pos.id == plain.id
    finally:
        h.register_position_translator(None)


def test_make_position_translate_name_english_noop():
    calls = []
    h.register_position_translator(lambda c, t, l: calls.append(t))
    try:
        ctx = _context(metadata={"lang": "eng"})
        pos = h.make_position(ctx, "Minister of Finance", translate_name=True)
        assert calls == []  # English source: no translation attempted
        assert [v for p, v, *_ in pos._stmts if p == "name"] == [
            "Minister of Finance"
        ]
    finally:
        h.register_position_translator(None)


def test_make_position_translate_name_no_translator_warns():
    ctx = _context(metadata={"lang": "fra"})
    pos = h.make_position(ctx, "Ministre des Finances", translate_name=True)
    assert [v for p, v, *_ in pos._stmts if p == "name"] == [
        "Ministre des Finances"
    ]
    assert any(
        i["level"] == "warning" and "translator" in i["message"]
        for i in ctx.issues
    )


# --------------------------------------------------------------------------
# DataFrame-side bulk form (sources/review.py apply_reviewed_names)


def test_apply_reviewed_names_df_semantics(spark):
    """Accepted reviews REPLACE the entity's original rows with the JSON
    payload's categorisation (reviewer as origin); rejected / unposted
    keep the originals — and the payload shape round-trips from the
    driver-side bridge (reviews_to_rows)."""
    from pyspark.sql import functions as F  # noqa: F401

    from opensanctions_spark.sources.review import apply_reviewed_names

    originals = spark.createDataFrame(
        [("e1", "name", "Jim Doe; James Doe"), ("e2", "name", "Keep Me"),
         ("e3", "name", "Also Kept"), ("e1", "alias", "JD")],
        "entity_id STRING, prop STRING, value STRING",
    )
    # e1 accepted with an edited two-prop payload, e2 rejected, e3 unposted
    payload = json.dumps({"name": ["James Doe"], "alias": ["Jim Doe"]})
    review = spark.createDataFrame(
        [("e1", "accepted", payload, "analyst"),
         ("e2", "rejected", None, "analyst")],
        "extraction_id STRING, status STRING, reviewed_value STRING, reviewer STRING",
    )
    got = sorted(map(tuple, apply_reviewed_names(originals, review).collect()))
    assert got == sorted([
        ("e1", "name", "James Doe", "analyst"),
        ("e1", "alias", "Jim Doe", "analyst"),
        ("e2", "name", "Keep Me", None),
        ("e3", "name", "Also Kept", None),
    ])


def test_apply_reviewed_names_df_bridges_driver_payload(spark):
    """The JSON the driver-side store exports is exactly what the bulk
    form consumes: write a review with helpers, apply it DataFrame-side."""
    from opensanctions_spark.sources.review import (
        REVIEW_SCHEMA,
        apply_reviewed_names,
    )

    ctx = _context()
    e = _person(ctx)
    raw = "Jim Doe; James Doe"
    h.apply_reviewed_names(ctx, e, original=h.Names(name=raw))
    (key, _status, payload, reviewer) = h.reviews_to_rows(ctx)[0]
    review = spark.createDataFrame(
        [(key, "accepted", payload, reviewer)], REVIEW_SCHEMA
    )
    originals = spark.createDataFrame(
        [(key, "name", raw)], "entity_id STRING, prop STRING, value STRING"
    )
    got = sorted(map(tuple, apply_reviewed_names(originals, review).collect()))
    assert got == [(key, "name", raw, "analyst")]


def test_apply_reviewed_names_df_never_shuffles_originals(spark):
    """Scale gate: the review table broadcasts (bounded by analyst
    throughput); the fact-proportional originals see no hash exchange."""
    from opensanctions_spark.sources.review import apply_reviewed_names

    originals = spark.createDataFrame(
        [(f"e{i}", "name", f"N {i}") for i in range(500)],
        "entity_id STRING, prop STRING, value STRING",
    ).repartition(8)
    review = spark.createDataFrame(
        [("e7", "accepted", json.dumps({"alias": ["X Y"]}), "analyst")],
        "extraction_id STRING, status STRING, reviewed_value STRING, reviewer STRING",
    )
    df = apply_reviewed_names(originals, review)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# --------------------------------------------------------------------------
# clean_names + deref_wikidata_id (the last two zavod.helpers exports)


def test_clean_names_routes_through_registered_cleaner():
    seen = []

    def cleaner(context, schema, names):
        seen.append((schema, names))
        return h.Names(name="Cleaned")

    h.register_name_cleaner(cleaner)
    try:
        ctx = _context()
        out = h.clean_names(
            ctx, h.SourceNames(entity_schema="Person", original=h.Names(name="Raw"))
        )
        assert out == h.Names(name="Cleaned")
        assert seen[0][0] == "Person"
    finally:
        h.register_name_cleaner(None)
    with pytest.raises(NotImplementedError, match="register_name_cleaner"):
        h.clean_names(
            _context(),
            h.SourceNames(entity_schema="Person", original=h.Names(name="X")),
        )


def test_deref_wikidata_id(tmp_path):
    import json as _json

    from opensanctions_spark.crawler import register_http_fetcher

    ctx = _context()
    assert h.deref_wikidata_id(ctx, None) is None
    assert h.deref_wikidata_id(ctx, "not-a-qid") is None
    # no HTTP boundary → graceful fallback to the original QID + warning
    assert h.deref_wikidata_id(ctx, "Q42") == "Q42"
    assert any("Q42" in i["message"] for i in ctx.issues)

    def fetcher(url, **kwargs):
        assert "ids=Q42" in url
        return _json.dumps(
            {"entities": {"Q42": {"redirects": {"to": "Q1000"}}}}
        )

    register_http_fetcher(fetcher)
    try:
        assert h.deref_wikidata_id(_context(), "Q42") == "Q1000"

        def no_redirect(url, **kwargs):
            return _json.dumps({"entities": {"Q7": {}}})

        register_http_fetcher(no_redirect)
        assert h.deref_wikidata_id(_context(), "Q7") == "Q7"
    finally:
        register_http_fetcher(None)
