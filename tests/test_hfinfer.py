"""F3 harness invariants: micro-batch size never changes results,
truncation accounting is exact, real backends raise loudly."""

from __future__ import annotations

import pytest

from risk_dashboard_database_spark.functions.hfinfer import (
    MAX_TOKENS,
    fake_logits,
    infer_batch,
)


def test_microbatch_size_invariant(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (i + 1))) for i in range(10)]
        + [(99, " ".join(str(j) for j in range(MAX_TOKENS + 5)))],
        "doc_id long, text string",
    )
    a = {
        (r["doc_id"], r["label"], r["score"], r["n_tokens"], r["truncated"])
        for r in infer_batch(docs, "text", batch_size=3).collect()
    }
    b = {
        (r["doc_id"], r["label"], r["score"], r["n_tokens"], r["truncated"])
        for r in infer_batch(docs, "text", batch_size=256).collect()
    }
    assert a == b and len(a) == 11
    long_row = next(r for r in a if r[0] == 99)
    assert long_row[4] is True and long_row[3] == MAX_TOKENS + 5


def test_truncation_changes_nothing_for_short_docs():
    short = "alpha beta gamma"
    assert fake_logits(short) == fake_logits(short)
    lg = fake_logits(short)
    assert all(1 <= v <= 1000 for v in lg) and len(lg) == 3


def test_real_backend_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(NotImplementedError):
        infer_batch(docs, "text", backend="distilbert")
