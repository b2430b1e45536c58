"""Streaming LM-quality gate (the d43 batch op, on arrival).

CCNet's production shape: the language model is a TRAINED ARTIFACT
that ships to every worker (KenLM binaries on local disk; here, the
stored `d43_doc_lm_score` pipeline's bigram-probability table as a
Spark broadcast), and each arriving document is scored MAP-SIDE — no
shuffle, no state store, no watermark. The only non-per-row inputs
are two bounded artifacts collected once at stream setup:

- the bigram->ppm table (bounded by the LM's vocabulary, not the
  corpus — CCNet's KenLM is a fixed-size file no matter how much data
  it scores; the driver-side collect has the same justification as a
  broadcast dim, and at real vocab sizes it becomes "ship the model
  file", not "grow the state store");
- the per-language head/middle/tail tertile cuts from the batch d43
  run (a handful of rows).

Scoring is an Arrow-batched pandas UDF (never per-row Python): each
batch splits, folds bigram ppm probabilities from the broadcast dict,
and emits the SAME integer mean d43 computes (sum(ppm) div count).
Bigrams the LM has never seen score 0 ppm — maximally surprising, the
conservative choice for novel ingest text.

Parity: `tests/test_stream_lmgate.py` replays availableNow over the
real documents table and asserts score + bucket equal the batch
`d43_doc_lm_score` MV + cut assignment exactly (replay text is
training text, so the OOV branch never fires there; a synthetic OOV
doc pins the 0-ppm branch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..plans.dedup import LM_PPM, _d43_doc_scores


def score_tokens(w: list[str], model: dict[tuple[str, str], int]) -> int:
    """THE per-document bigram scoring convention — one definition,
    shared by this gate and the DSIR gate (streaming/dsirgate.py):
    -1 sentinel for < 2 tokens; bigrams the model has never seen
    contribute 0 ppm (maximally surprising — the conservative choice
    for novel ingest text); integer mean (sum div n), matching the
    batch d43/d60 arithmetic exactly."""
    if len(w) < 2:
        return -1
    total = 0
    n = len(w) - 1
    for i in range(n):
        total += model.get((w[i], w[i + 1]), 0)
    return total // n


def bigram_ppm_table(
    spark: SparkSession, sf_dir: str, source: str | None = None
) -> dict[tuple[str, str], int]:
    """The trained bigram->ppm probability table as a driver-side dict
    (bounded by vocabulary, the ship-the-model-file artifact). With
    ``source`` set, trains on that source's slice only — the target LM
    of the DSIR gate (streaming/dsirgate.py); None is the full-corpus
    LM d43 scores with."""
    from ..tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    if source is not None:
        docs = docs.where(F.col("source") == source)
    docs = docs.select("doc_id", F.split(F.col("text"), " ").alias("__w"))
    stream = (
        docs.where(F.size(F.col("__w")) >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with("
                    "  slice(__w, 1, size(__w) - 1),"
                    "  slice(__w, 2, size(__w) - 1),"
                    "  (a, b) -> struct(a AS w1, b AS w2))"
                )
            ).alias("__g")
        )
        .select(F.col("__g.w1").alias("w1"), F.col("__g.w2").alias("w2"))
    )
    c2 = stream.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    prob_rows = (
        c2.join(c1, "w1")
        .select("w1", "w2", F.expr(f"(c2 * {LM_PPM}) div c1").alias("p_ppm"))
        .collect()
    )
    return {(r.w1, r.w2): r.p_ppm for r in prob_rows}


def lm_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[tuple[str, str], int], dict[str, tuple[int, int]]]:
    """Collect the two bounded artifacts the gate ships to workers:
    the bigram->ppm table and the per-language (t1, t2) tertile cuts
    (derived from the stored per-doc score MV, as in batch d43)."""
    scored = _d43_doc_scores(spark, sf_dir)
    lm = bigram_ppm_table(spark, sf_dir)

    from pyspark.sql import Window

    dom = scored.groupBy("lang", "score").agg(F.count("*").alias("c"))
    wl = Window.partitionBy("lang")
    cdf = dom.select(
        "lang",
        "score",
        F.sum("c").over(wl.orderBy("score")).alias("cum"),
        F.sum("c").over(wl).alias("n"),
    )
    cut_rows = (
        cdf.groupBy("lang")
        .agg(
            F.min(F.when(F.expr("cum >= (n + 2) div 3"), F.col("score"))).alias("t1"),
            F.min(F.when(F.expr("cum >= (2*n + 2) div 3"), F.col("score"))).alias("t2"),
        )
        .collect()
    )
    cuts = {r.lang: (r.t1, r.t2) for r in cut_rows}
    return lm, cuts


def stream_lm_gate(
    spark: SparkSession,
    docs_dir: str,
    lm: dict[tuple[str, str], int] | None = None,
    cuts: dict[str, tuple[int, int]] | None = None,
    schema=None,
) -> DataFrame:
    """readStream over a documents directory -> (doc_id, lang, score,
    bucket) per arriving document: the integer d43 LM score against
    the shipped model, bucketed by the static per-language cuts.

    Stateless append-mode plan: parquet scan -> Arrow-batched scoring
    UDF -> per-row bucket CASE. Unknown languages bucket 'head'/'tail'
    by comparing against (None, None) is ill-defined, so they emit
    'unknown'; docs with < 2 tokens emit score -1, bucket 'short'
    (the batch op's short branch, as a sentinel instead of a UNION —
    streams can't union a second scan of the same source)."""
    if lm is None or cuts is None:
        a_lm, a_cuts = lm_artifacts(spark, docs_dir)
        lm = lm if lm is not None else a_lm
        cuts = cuts if cuts is not None else a_cuts
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    blm = spark.sparkContext.broadcast(lm)

    @F.pandas_udf(LongType())
    def lm_score(texts: pd.Series) -> pd.Series:
        model = blm.value
        return pd.Series(
            [score_tokens((t or "").split(" "), model) for t in texts],
            dtype="int64",
        )

    cut_items = sorted(cuts.items())
    bucket = F.lit("unknown")
    for lang, (t1, t2) in cut_items:
        bucket = F.when(
            F.col("lang") == lang,
            F.when(F.col("score") <= F.lit(t1), "tail")
            .when(F.col("score") <= F.lit(t2), "middle")
            .otherwise("head"),
        ).otherwise(bucket)
    bucket = F.when(F.col("score") < 0, "short").otherwise(bucket)

    docs = spark.readStream.schema(schema).parquet(docs_dir)
    return docs.select(
        "doc_id", "lang", lm_score(F.col("text")).alias("score")
    ).select("doc_id", "lang", "score", bucket.alias("bucket"))
