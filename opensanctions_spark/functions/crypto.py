"""Crypto-wallet extraction (SURVEY F11, ``zavod/zavod/helpers/crypto.py:29``):
per-currency address regexes applied with regexp_extract_all — the
reference scans free text for wallet ids during sanction crawls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WALLET_PATTERNS: dict[str, str] = {
    "BTC": r"\b(bc1[a-zA-HJ-NP-Z0-9]{25,62}|[13][a-km-zA-HJ-NP-Z1-9]{25,34})\b",
    "ETH": r"\b(0x[0-9a-fA-F]{40})\b",
    "XMR": r"\b(4[0-9AB][1-9A-HJ-NP-Za-km-z]{93})\b",
    "TRX": r"\b(T[1-9A-HJ-NP-Za-km-z]{33})\b",
}


def extract_wallets(col: Column, currency: str) -> Column:
    """All wallet addresses of one currency mentioned in the text."""
    pattern = WALLET_PATTERNS[currency]
    return F.regexp_extract_all(col, F.lit(pattern), F.lit(1))


def extract_all_wallets(col: Column) -> Column:
    """array<struct<currency,address>> across every known currency."""
    def tag(cur: str):
        # single-arg lambda: F.transform passes (element, index) to 2-arg ones
        return lambda a: F.struct(F.lit(cur).alias("currency"), a.alias("address"))

    per_currency = [
        F.transform(extract_wallets(col, cur), tag(cur)) for cur in WALLET_PATTERNS
    ]
    return F.flatten(F.array(*per_currency))
