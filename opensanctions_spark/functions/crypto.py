"""Crypto-wallet extraction (SURVEY F11, ``zavod/zavod/helpers/crypto.py:29``):
per-currency address regexes applied with regexp_extract_all — the
reference scans free text for wallet ids during sanction crawls.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: full reference address-shape table (crypto.py:9-26): ordered so a
#: string matching two shapes takes the LATER currency (last-write-wins,
#: mirrored by the driver-side ``helpers.extract_cryptos`` twin). BTC
#: covers bech32/bech32m (taproot) + legacy base58 incl. "3..." P2SH;
#: XMR covers "4..." standard and "8..." subaddress; XRP restricts to
#: the base58 alphabet so prose words starting with "r" don't match.
WALLET_PATTERNS: dict[str, str] = {
    "ETH": r"\b(0x[0-9a-fA-F]{40})\b",
    "BTC": r"\b(bc1[a-zA-HJ-NP-Z0-9]{11,71}|[13][a-km-zA-HJ-NP-Z1-9]{25,39})\b",
    "DASH": r"\b(X[1-9A-HJ-NP-Za-km-z]{33})\b",
    "XMR": r"\b([48][0-9ABC][1-9A-HJ-NP-Za-km-z]{93})\b",
    "XRP": r"\b(r[1-9A-HJ-NP-Za-km-z]{24,34})\b",
    "LTC": r"\b(ltc1[a-zA-HJ-NP-Z0-9]{25,39}|[LM][a-km-zA-HJ-NP-Z1-9]{25,39})\b",
    "BCH": r"\b(bitcoincash:q[a-z0-9]{41})\b",
    "DOGE": r"\b(D[5-9A-HJ-NP-U][1-9A-HJ-NP-Za-km-z]{32})\b",
    "TRON": r"\b(T[1-9A-HJ-NP-Za-km-z]{33})\b",
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
