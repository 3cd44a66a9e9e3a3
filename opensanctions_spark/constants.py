"""Compat ``zavod.constants`` (``zavod/zavod/constants.py``)."""

#: statement origin markers (also exported via helpers)
ORIGIN_METADATA = "metadata"
ORIGIN_INFERRED = "inferred"
ORIGIN_LOOKUP = "patch"

#: datasets that emit derived annotations computed from the graph rather
#: than crawled source data — their statements don't count as substance
ANALYZER_DATASETS = frozenset({"ann_graph_topics", "ann_pep_positions"})

#: the pseudo-property of read-time id-checksum statements
#: (``followthemoney.statement`` BASE_ID — analyzers skip statements whose
#: ``prop`` is this marker when judging published substance)
BASE_ID = "id"
