"""Unit tests for the F5/F10/F11/F13 function families (SURVEY §2.8),
mirroring the reference's helper tests (zavod/zavod/tests/helpers/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opensanctions_spark.functions.addresses import (
    compose_address,
    extract_po_box,
    normalize_address,
)
from opensanctions_spark.functions.crypto import extract_all_wallets, extract_wallets
from opensanctions_spark.functions.names import (
    clean_name,
    is_name_regular,
    make_name,
    reorder_comma_name,
    strip_titles,
)
from opensanctions_spark.functions.positions import occupancy_status


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).first()["x"]


def test_make_name_skips_empty(spark):
    out = _one(spark, make_name(F.lit(" John "), F.lit(""), F.lit(None), F.lit("Doe")))
    assert out == "John Doe"
    assert _one(spark, make_name(F.lit(""), F.lit(None))) is None


def test_strip_titles_stacked(spark):
    assert _one(spark, strip_titles(F.lit("Mr. Prof. Jane Roe"))) == "Jane Roe"
    assert _one(spark, strip_titles(F.lit("Drummond Lake"))) == "Drummond Lake"


def test_reorder_comma_name(spark):
    assert _one(spark, reorder_comma_name(F.lit("Doe, John"))) == "John Doe"
    assert _one(spark, reorder_comma_name(F.lit("Acme, Inc, Ltd"))) == "Acme, Inc, Ltd"
    assert _one(spark, reorder_comma_name(F.lit("NoComma"))) == "NoComma"


def test_clean_name_and_regular(spark):
    assert _one(spark, clean_name(F.lit("  Dr.  Ada   Lovelace "))) == "Ada Lovelace"
    assert _one(spark, is_name_regular(F.lit("Ada Lovelace"))) is True
    assert _one(spark, is_name_regular(F.lit("###"))) is False
    assert _one(spark, is_name_regular(F.lit("x"))) is False
    assert _one(spark, is_name_regular(F.lit("Müller & Söhne (GmbH)"))) is True


def test_compose_and_normalize_address(spark):
    out = _one(spark, compose_address(F.lit("1 Main St"), F.lit(""), F.lit("Berlin"), F.lit(None)))
    assert out == "1 Main St, Berlin"
    assert _one(spark, normalize_address(F.lit("1 Main St ,,  Berlin"))) == "1 Main St, Berlin"


def test_po_box(spark):
    assert _one(spark, extract_po_box(F.lit("P.O. Box 1234, Lagos"))) == "1234"
    assert _one(spark, extract_po_box(F.lit("po box 99"))) == "99"
    assert _one(spark, extract_po_box(F.lit("1 Main St"))) is None


def test_wallets(spark):
    text = F.lit(
        "BTC 1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2 and "
        "ETH 0x52908400098527886E0F7030069857D2E4169EE7 ok"
    )
    assert _one(spark, extract_wallets(text, "BTC")) == ["1BvBMSEYstWetqTFn5Au4m4GFg7xJaNVN2"]
    all_w = _one(spark, extract_all_wallets(text))
    assert {(w["currency"]) for w in all_w} == {"BTC", "ETH"}


def test_occupancy_status_branches(spark):
    now = "2026-08-13"

    def status(start, end, topic="gov.national"):
        return _one(
            spark,
            occupancy_status(F.lit(start), F.lit(end), F.lit(topic), now),
        )

    assert status("2020-01-01", None) == "current"          # open-ended
    assert status("2020-01-01", "2030-01-01") == "current"  # future end
    assert status("2010-01-01", "2024-05") == "ended"       # within 5y grace
    assert status("2010-01-01", "2015-01-01") is None       # grace expired
    assert status(None, None) == "unknown"
    # municipal grace is 1 year: ended 2024 is already expired
    assert status("2010-01-01", "2024-05", topic="gov.muni") is None


def test_wikidata_deref_with_fetcher(spark):
    """Misses resolve through the injected fetcher exactly once per
    distinct unknown QID (the cache-days discipline)."""
    from opensanctions_spark.functions.wikidata import deref_qids

    df = spark.createDataFrame(
        [("a", "Q1"), ("b", "Q2"), ("c", "Q2"), ("d", "nope"), ("e", None)],
        "id string, qid string",
    )
    redirects = spark.createDataFrame(
        [("Q1", "Q100")], "qid string, target string"
    )
    calls = []

    def fetch(q):
        calls.append(q)
        return "Q200" if q == "Q2" else None

    out = {r["id"]: r["qid"] for r in deref_qids(df, "qid", redirects, fetch).collect()}
    assert out == {"a": "Q100", "b": "Q200", "c": "Q200", "d": None, "e": None}
    assert calls == ["Q2"]  # one call per distinct miss


def test_wikidata_qid_validation(spark):
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.wikidata import is_qid

    df = spark.createDataFrame(
        [("Q1",), ("Q007",), ("q1",), ("Q0",), ("Q12x",), ("",)], "v string"
    )
    got = [r[0] for r in df.select(is_qid(F.col("v"))).collect()]
    assert got == [True, False, False, False, False, False]


def test_imo_entity_id_keys(spark):
    """vessels.py semantics: valid IMO → canonical digits; invalid →
    slug fallback; empty → NULL."""
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.identifiers import (
        make_org_imo_id,
        make_vessel_imo_id,
    )

    df = spark.createDataFrame(
        [("IMO 9074729",), ("9074729",), ("9074728",), ("Not Known",), (None,)],
        "v string",
    )
    got = [r[0] for r in df.select(make_vessel_imo_id(F.col("v"))).collect()]
    # 9074729 passes the IMO checksum; 9074728 fails -> slug fallback
    assert got == [
        "imo-vsl-9074729",
        "imo-vsl-9074729",
        "imo-vsl-9074728",
        "imo-vsl-not-known",
        None,
    ]
    org = df.select(make_org_imo_id(F.col("v"))).collect()[0][0]
    assert org == "imo-org-9074729"


def test_convert_excel_date(spark):
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.dates import convert_excel_date

    df = spark.createDataFrame(
        [("44876",), ("44876.7",), ("3999",), ("100001",), ("xx",), (None,)],
        "v string",
    )
    got = [r[0] for r in df.select(convert_excel_date(F.col("v"))).collect()]
    # 44876 = 2022-11-11 (the reference docstring's own example)
    assert got == ["2022-11-11T00:00:00", "2022-11-11T00:00:00",
                   None, None, None, None]


def test_backdate(spark):
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.dates import backdate

    df = spark.createDataFrame([("2024-03-01",)], "d string")
    assert df.select(backdate(F.col("d"), 30)).collect()[0][0] == "2024-01-31"


def test_article_statements_factory(spark):
    """articles.py parity: one Article per URL (duplicate mentions
    collapse), one Documentation edge per (entity, article) pair."""
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.articles import article_statements

    mentions = spark.createDataFrame(
        [
            ("p1", "https://x.test/a", "Story A", "2024-01-01"),
            ("p2", "https://x.test/a", "Story A", "2024-01-01"),
            ("p1", "https://x.test/b", "Story B", None),
        ],
        "entity_id string, url string, title string, published_at string",
    )
    stmts = article_statements(mentions, dataset="news")
    by_schema = {
        r["schema"]: r["n"]
        for r in stmts.groupBy("schema").agg(F.count("*").alias("n")).collect()
    }
    # article A: url+title+publishedAt (3); article B: url+title (2, null date dropped)
    assert by_schema["Article"] == 5
    # three (entity, article) pairs: A has date rows (entity+document+date),
    # B has entity+document only
    assert by_schema["Documentation"] == 3 * 2 + 2 * 1
    # the two mentions of article A produced ONE article entity
    n_articles = stmts.filter(
        (F.col("schema") == "Article") & (F.col("prop") == "sourceUrl")
    ).count()
    assert n_articles == 2


def test_url_canonicalization(spark):
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.urls import canonicalize_url

    cases = [
        ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
         "http://example.com/a/b?a=1&b=2"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/path?fbclid=abc", "https://example.com/path"),
        ("https://example.com:8080/x", "https://example.com:8080/x"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("u"))).collect()]
    assert got == [c[1] for c in cases]


def test_postcode_pobox_split(spark):
    """addresses.py:284-295: a PO-Box value stuffed into the postcode
    field moves wholesale to the po_box side."""
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.addresses import postcode_pobox

    df = spark.createDataFrame(
        [("PO Box 123",), ("p.o. box 4-5",), ("10117",), (None,)], ["pc"]
    )
    postcode, po_box = postcode_pobox(F.col("pc"))
    rows = df.select(postcode.alias("postcode"), po_box.alias("po_box")).collect()
    assert [(r["postcode"], r["po_box"]) for r in rows] == [
        (None, "PO Box 123"),
        (None, "p.o. box 4-5"),
        ("10117", None),
        (None, None),
    ]


def test_apply_number_render(spark):
    """numbers.py:12-66: parse → unit-normalize → render; integers print
    bare, fractions at two decimals, unparseable input drops."""
    from pyspark.sql import functions as F

    from opensanctions_spark.functions.numbers import apply_number, render_number

    df = spark.createDataFrame(
        [("5 kg",), ("2.5 km",), ("1,250",), ("n/a",), ("0.125 m",)], ["v"]
    )
    rows = [r["out"] for r in df.select(apply_number(F.col("v")).alias("out")).collect()]
    # 5 kg -> 5000 g; 2.5 km -> 2500 m; 1,250 bare; n/a -> NULL; 0.125 m stays
    assert rows == ["5000 g", "2500 m", "1250", None, "0.13 m"]
    r = spark.range(1).select(
        render_number(F.lit(1234.5)).alias("a"),
        render_number(F.lit(7.0)).alias("b"),
    ).collect()[0]
    assert (r["a"], r["b"]) == ("1234.50", "7")  # no thousands separator


def test_earliest_term_start_windows():
    """positions.py:249-273: after-office window for the topics + 2x the
    default slack, off the run date."""
    from opensanctions_spark.functions.positions import earliest_term_start

    # gov.national: 5y window + 10y slack = 15y before 2026-08-13
    assert earliest_term_start(["gov.national"], "2026-08-13T00:00:00") == "2011-08-17"
    # gov.muni: 1y + 10y = 11y
    assert earliest_term_start(["gov.muni"], "2026-08-13T00:00:00") == "2015-08-16"
    # unknown topic falls back to the default window
    assert earliest_term_start(["x"], "2026-08-13T00:00:00") == "2011-08-17"


# -- round 10: BPE encode (apply pass) ---------------------------------------


def test_bpe_encode_hand_computed(spark, tmp_path):
    """The apply pass on a corpus tiny enough to run BPE by hand.

    Corpus words: 'aab' ×3, 'ab' ×2  (vocab = {aab:3, ab:2}).
    Round 1 pairs: 'a a'→3, 'a b'→5  → merge 'a b' → ab.
    Round 2 seqs: 'a ab' (aab), 'ab' (ab); pairs: 'a ab'→3 → merge → aab.
    Round 3: all seqs single-symbol → no pairs → no-op merge.
    Final: aab → 1 token, ab → 1 token.
    doc1 = 'aab ab aab' → 3 words, 3 tokens;
    doc2 = 'aab ab'     → 2 words, 2 tokens.
    """
    from opensanctions_spark.catalog import text as T
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "aab ab aab"), (2, "aab ab")], "doc_id long, text string"
    )
    wc = (
        docs.select(F.explode(T._tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    # round-13: sequences are double-delimiter-guarded (exact greedy
    # boundary-strict merge replay — see bpe_apply_merges); the
    # hand-computation is unchanged, only the symbol-string
    # representation carries \x1f\x1f guards
    sep = "\x1f"
    s = wc.select("w", "c", T._bpe_guarded_seq(F.col("w")).alias("seq"))
    merges = []
    for _ in (1, 2, 3):
        s, top = T._bpe_merge_round(s)
        merges.append([r["pair"] for r in top.collect()])
    assert merges[0] == ["a b"]
    assert merges[1] == ["a ab"]
    assert merges[2] == []  # vocabulary fully merged: no pairs remain
    enc = {r["w"]: r["seq"] for r in s.collect()}
    assert enc == {"aab": f"{sep*2}aab{sep*2}", "ab": f"{sep*2}ab{sep*2}"}
    dw = docs.select("doc_id", F.explode(T._tokens(F.col("text"))).alias("w"))
    nt = s.select(
        "w",
        (
            (
                F.length("seq")
                - F.length(F.replace(F.col("seq"), F.lit(sep), F.lit("")))
            )
            / 2
            - 1
        ).cast("int").alias("nt"),
    )
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in dw.join(nt, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .collect()
    }
    assert out == {1: (3, 3), 2: (2, 2)}


def test_bpe_encode_counts_are_consistent_with_train(spark, sf_dir):
    """text_bpe_encode's corpus token total must sit between the
    single-symbol ceiling (sum of word lengths) and the word floor
    (one token per word), and n_words must equal the raw token count."""
    from opensanctions_spark.catalog import QUERIES
    from pyspark.sql import functions as F

    enc = QUERIES["text_bpe_encode"](spark, sf_dir)
    tot = enc.agg(
        F.sum("n_words").alias("w"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert 0 < tot["w"] <= tot["t"]  # merges never go below 1 token/word


def test_wallets_full_currency_table(spark):
    """Round 10: the column table carries the reference's full shape set
    (crypto.py:9-26) and matches the driver-side twin currency-for-
    currency on one address of each kind."""
    from opensanctions_spark.helpers import extract_cryptos

    samples = {
        "0x8145D05037d1778E232ACE2FaF9731a6E5b19538": "ETH",
        "bc1p0xlxvlhemja6c4dqv22uapctqupfhlxm9h8z3k2e72q4k9hcz7vqzk5jj0": "BTC",
        "35hK24tcLEWcgNA4JxpvbkNkoAcDGqQPsP": "BTC",
        "XyARKoupuArYtToA2S6yMdnoquDCDaBsaT": "DASH",
        "rnXyVQzgxZe7TR1EPzTkGj2jxH4LMJYh66": "XRP",
        "MJRSgZ3UUFcTBTBAaN38XAXvZLwRe8WVw7": "LTC",
        "bitcoincash:qqyuc9s700plhzr6awzru7g5z2d2p906uyrm6ht0r0": "BCH",
        "DNmxLVUn5AuzoDo2CSc7P13wcMSvZ4nsYY": "DOGE",
        "TXEsK1sEsKjZ1xtHitnyAAoqw3WLdYdRNW": "TRON",
    }
    text = " then ".join(samples)
    col_result = {
        w["address"]: w["currency"]
        for w in _one(spark, extract_all_wallets(F.lit(text)))
    }
    assert col_result == samples
    assert extract_cryptos(text) == samples
