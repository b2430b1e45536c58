"""Batched LLM classification surface (SURVEY §2.11 F1/F2).

The reference enriches rows with LLM sentiment/risk/control labels
(OpenAI/Gemini, temp 0, JSON parse with brace-salvage —
`src/llm_utils.py:6-93`) and caches 1-sentence feature summaries
(`app.py:236-261,643-685`). Real API calls are out of correctness
scope here (no network, no keys); this module provides the Spark
plumbing — an Arrow-batched mapInPandas classifier with a pluggable
backend — plus the reference's JSON brace-salvage parser, with a
deterministic fake backend for tests and a loud NotImplementedError
for real providers.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LABELS = ["negative", "neutral", "positive"]
RISKS = ["none", "watch", "crisis_risk"]


def salvage_json(raw: str) -> dict | None:
    """Parse a model response that may wrap JSON in prose: try
    verbatim, then the largest {...} brace span
    (`src/llm_utils.py:24-44` behavior)."""
    try:
        out = json.loads(raw)
        return out if isinstance(out, dict) else None
    except (ValueError, TypeError):
        pass
    if not raw:
        return None
    start, end = raw.find("{"), raw.rfind("}")
    if start < 0 or end <= start:
        return None
    try:
        out = json.loads(raw[start : end + 1])
        return out if isinstance(out, dict) else None
    except ValueError:
        return None


def fake_classify(text: str) -> dict:
    """Deterministic stand-in classifier: stable md5-derived labels
    (temp-0 analog — same text always gets the same labels)."""
    h = int(hashlib.md5(text.encode()).hexdigest()[:8], 16)
    return {
        "sentiment_label": LABELS[h % 3],
        "risk_label": RISKS[(h // 3) % 3],
        # division-only (no Python round): keeps the value bit-identical
        # with SQL re-derivations of the same arithmetic
        "confidence": (50 + h % 50) / 100.0,
    }


def classify_batch(df: DataFrame, text_col: str, backend: str = "fake") -> DataFrame:
    """Attach LLM classification columns via Arrow-batched mapInPandas
    — batching, schema, and null handling are the real production
    shape; only the backend is swapped. backend='fake' is
    deterministic; real providers raise until an API integration is
    configured."""
    if backend != "fake":
        raise NotImplementedError(
            f"backend {backend!r}: live LLM classification needs network "
            "access and credentials not present in this environment. "
            "Plug-in point: replace fake_classify in "
            "risk_dashboard_database_spark.functions.llm with a "
            "callable text -> dict hitting your provider (temp 0, JSON "
            "response parsed via salvage_json); classify_batch's "
            "mapInPandas plumbing stays as-is"
        )
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(
        fields + ["sentiment_label string", "risk_label string", "confidence double"]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = [fake_classify(t if t is not None else "") for t in pdf[text_col]]
            pdf = pdf.copy()
            pdf["sentiment_label"] = [f["sentiment_label"] for f in feats]
            pdf["risk_label"] = [f["risk_label"] for f in feats]
            pdf["confidence"] = [f["confidence"] for f in feats]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def summarize_cached(
    df: DataFrame, key_cols: list[str], text_col: str, max_items: int = 12
) -> DataFrame:
    """Feature-summary shape (F2): per key, first max_items texts
    (deterministic order) -> one 'summary' string. The reference calls
    an LLM and caches to `serp_feature_summaries`; the deterministic
    fake joins the top titles, preserving the cache-table contract."""
    pairs = F.sort_array(F.collect_list(F.struct(F.col(text_col).alias("t"))))
    return df.groupBy(*key_cols).agg(
        F.concat(
            F.lit("summary of "),
            F.size(pairs).cast("string"),
            F.lit(" items: "),
            F.array_join(
                F.slice(F.transform(pairs, lambda p: p["t"]), 1, max_items), "; "
            ),
        ).alias("summary")
    )
