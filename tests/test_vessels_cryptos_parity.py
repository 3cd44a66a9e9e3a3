"""Parity ports of the reference vessels and crypto suites
(``zavod/zavod/tests/helpers/test_vessels.py``,
``zavod/zavod/tests/helpers/test_cryptos.py``) over the engine's
driver-side compat helpers (the DataFrame column forms are covered by
the ``f7``/``f11`` catalog oracles)."""

from __future__ import annotations

from opensanctions_spark.helpers import (
    extract_cryptos,
    make_org_imo_id,
    make_vessel_imo_id,
)


# -- vessels (test_vessels.py) -----------------------------------------------


def test_make_vessel_imo_id_valid():
    assert make_vessel_imo_id("9289518") == "imo-vsl-9289518"
    # stray text / prefix around a valid IMO still normalizes to digits
    assert make_vessel_imo_id("IMO 9289518") == "imo-vsl-9289518"
    # leading zeros preserved for the canonical seven digits
    assert make_vessel_imo_id("0090524") == "imo-vsl-0090524"


def test_make_vessel_imo_id_invalid_is_kept():
    # malformed IMO falls back to a slug of the raw value, never None
    assert make_vessel_imo_id("928951") == "imo-vsl-928951"
    assert make_vessel_imo_id("Unknown") == "imo-vsl-unknown"


def test_make_vessel_imo_id_empty():
    assert make_vessel_imo_id(None) is None
    assert make_vessel_imo_id("") is None
    assert make_vessel_imo_id("   ") is None


def test_make_org_imo_id():
    assert make_org_imo_id("0381931") == "imo-org-0381931"
    assert make_org_imo_id("928951") == "imo-org-928951"
    assert make_org_imo_id(None) is None


# -- cryptos (test_cryptos.py) -----------------------------------------------


def test_extract_cryptos_empty_and_noise():
    assert len(extract_cryptos(None)) == 0
    assert len(extract_cryptos("")) == 0
    assert len(extract_cryptos("ETH")) == 0
    assert len(extract_cryptos("random text 123456")) == 0


def test_extract_cryptos_eth():
    result = extract_cryptos("Buy drugs: 0xe090669ee62e02f4437b89058a073dc7874aed8f")
    assert result == {"0xe090669ee62e02f4437b89058a073dc7874aed8f": "ETH"}
    result = extract_cryptos(
        "Here is my 0x8145D05037d1778E232ACE2FaF9731a6E5b19538 Ethereum address."
    )
    assert result["0x8145D05037d1778E232ACE2FaF9731a6E5b19538"] == "ETH"


def test_extract_cryptos_tron():
    result = extract_cryptos("hamas TXEsK1sEsKjZ1xtHitnyAAoqw3WLdYdRNW")
    assert result == {"TXEsK1sEsKjZ1xtHitnyAAoqw3WLdYdRNW": "TRON"}


def test_extract_cryptos_btc_forms():
    # legacy
    result = extract_cryptos("Send to 18yzhmcgHtRVoEX3doCrqhis6fFU1dHFUE")
    assert result["18yzhmcgHtRVoEX3doCrqhis6fFU1dHFUE"] == "BTC"
    # bech32
    result = extract_cryptos("SegWit: bc1qwsqdcas3llkcx53sx4lqrcrdpxmr5s4eke6d8y")
    assert result["bc1qwsqdcas3llkcx53sx4lqrcrdpxmr5s4eke6d8y"] == "BTC"
    # P2SH: "3..." addresses are BTC, not LTC
    result = extract_cryptos("wallet 35hK24tcLEWcgNA4JxpvbkNkoAcDGqQPsP")
    assert result["35hK24tcLEWcgNA4JxpvbkNkoAcDGqQPsP"] == "BTC"
    result = extract_cryptos("3E6ZCKRrsdPc35chA9Eftp1h3DLW18NFNV")
    assert result["3E6ZCKRrsdPc35chA9Eftp1h3DLW18NFNV"] == "BTC"
    # taproot (bech32m, 62 chars)
    result = extract_cryptos(
        "P2TR: bc1p0xlxvlhemja6c4dqv22uapctqupfhlxm9h8z3k2e72q4k9hcz7vqzk5jj0"
    )
    assert result[
        "bc1p0xlxvlhemja6c4dqv22uapctqupfhlxm9h8z3k2e72q4k9hcz7vqzk5jj0"
    ] == "BTC"


def test_extract_cryptos_altcoins():
    assert extract_cryptos("LTC: MJRSgZ3UUFcTBTBAaN38XAXvZLwRe8WVw7")[
        "MJRSgZ3UUFcTBTBAaN38XAXvZLwRe8WVw7"
    ] == "LTC"
    assert extract_cryptos("Dash: XyARKoupuArYtToA2S6yMdnoquDCDaBsaT")[
        "XyARKoupuArYtToA2S6yMdnoquDCDaBsaT"
    ] == "DASH"
    xmr = (
        "49HqitRzdnhYjgTEAhgGpCfsjdTeMbUTU6cyR4JV1R7k2Eej9rGT8JpFiYDa4tZM6RZi"
        "FrHmMzgSrhHEqpDYKBe5B2ufNsL"
    )
    assert xmr in extract_cryptos(f"XMR: {xmr}")
    xmr_sub = (
        "84LooD7i35SFppgf4tQ453Vi3q5WexSUXaVgut69ro8MFnmHwuezAArEZTZyLr9fS6Qo"
        "tjqkSAxSF6d1aDgsPoX849izJ7m"
    )
    assert extract_cryptos(f"sub: {xmr_sub}")[xmr_sub] == "XMR"
    assert extract_cryptos("Send XRP: rnXyVQzgxZe7TR1EPzTkGj2jxH4LMJYh66")[
        "rnXyVQzgxZe7TR1EPzTkGj2jxH4LMJYh66"
    ] == "XRP"
    bch = "bitcoincash:qqyuc9s700plhzr6awzru7g5z2d2p906uyrm6ht0r0"
    assert extract_cryptos(f"BCH: {bch}")[bch] == "BCH"
    assert extract_cryptos("Much wow: DNmxLVUn5AuzoDo2CSc7P13wcMSvZ4nsYY")[
        "DNmxLVUn5AuzoDo2CSc7P13wcMSvZ4nsYY"
    ] == "DOGE"


def test_extract_cryptos_boundaries():
    # prose words starting with "r" must not match as XRP
    assert len(extract_cryptos(
        "see registration rechtsanwaltskanzleien2024x for details"
    )) == 0
    # must not extract a partial LTC address from inside a TRON address
    result = extract_cryptos("TH96tFMn8KGiYSLiwcV3E2UiaJc8jmcbz3")
    assert "Mn8KGiYSLiwcV3E2UiaJc8jmcbz3" not in result
    assert result["TH96tFMn8KGiYSLiwcV3E2UiaJc8jmcbz3"] == "TRON"
    # multiple addresses in one text
    result = extract_cryptos(
        "BTC: 1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa "
        "ETH: 0x8145D05037d1778E232ACE2FaF9731a6E5b19538"
    )
    assert len(result) == 2
    assert result["1A1zP1eP5QGefi2DMPTfTL5SLmv7DivfNa"] == "BTC"
    assert result["0x8145D05037d1778E232ACE2FaF9731a6E5b19538"] == "ETH"
    # trailing punctuation
    result = extract_cryptos(
        "Send to: 0x5512d943ed1f7c8a43f3435c85f7ab68b30121b0, thanks!"
    )
    assert "0x5512d943ed1f7c8a43f3435c85f7ab68b30121b0" in result
    # embedded in a longer alphanumeric string: no match
    assert len(extract_cryptos(
        "prefix0x1234567890123456789012345678901234567890suffix"
    )) == 0


# -- numbers (reference test_numbers.py) -------------------------------------


def test_apply_number_reference_cases():
    from types import SimpleNamespace

    from opensanctions_spark.crawler import CrawlerContext

    ctx = CrawlerContext(
        None, SimpleNamespace(name="t", metadata={}, lookups={})
    )
    e = ctx.make("Vessel")
    e.id = "ship"

    def pop(prop):
        vals = [s[1] for s in e._stmts if s[0] == prop]
        e._stmts = [s for s in e._stmts if s[0] != prop]
        return vals

    from opensanctions_spark import helpers as h

    h.apply_number(e, "tonnage", "1000")
    assert pop("tonnage") == ["1000"]
    h.apply_number(e, "tonnage", 999)
    assert pop("tonnage") == ["999"]
    h.apply_number(e, "tonnage", 999.791)
    assert pop("tonnage") == ["999.79"]
    # unit synonym normalized by name, amount untouched
    h.apply_number(e, "tonnage", "2000tons")
    assert pop("tonnage") == ["2000 t"]
