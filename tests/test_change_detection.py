"""D4 change detection (zavod/zavod/helpers/change.py:14-129): hash
asserts over artifact rows, DOM-subtree text hashing, raise path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opensanctions_spark.operators.change import (
    check_hashes,
    dom_subtree_text_hash,
)


def _artifacts(spark):
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    return spark.createDataFrame(
        [
            ("a", "body-a", md5("body-a")),      # unchanged
            ("b", "body-b2", md5("body-b")),     # changed
            ("c", "body-c", None),               # new artifact
        ],
        "artifact_id string, content string, expected_hash string",
    )


def test_check_hashes_flags(spark):
    out = {r["artifact_id"]: r["changed"] for r in check_hashes(_artifacts(spark)).collect()}
    assert out == {"a": False, "b": True, "c": True}


def test_check_hashes_raises_with_offender_list(spark):
    with pytest.raises(AssertionError, match=r"\['b', 'c'\]"):
        check_hashes(_artifacts(spark), raise_on_change=True)


def test_dom_subtree_text_hash_ignores_markup_churn(spark):
    df = spark.createDataFrame(
        [
            ("<div><table class='x'><tr><td>A</td><td>B</td></tr></table></div>",),
            ("<div><table id='y' style='new'><tr><td>A</td> <td>B</td></tr></table></div>",),
            ("<div><table><tr><td>A</td><td>CHANGED</td></tr></table></div>",),
            ("<div>no table here</div>",),
        ],
        "html string",
    )
    hashes = [r[0] for r in df.select(dom_subtree_text_hash(F.col("html"), "table")).collect()]
    assert hashes[0] == hashes[1]      # attribute/whitespace churn invisible
    assert hashes[0] != hashes[2]      # text change visible
    assert hashes[3] is None           # absent subtree
