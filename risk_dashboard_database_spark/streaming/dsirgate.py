"""Streaming DSIR importance gate: batch d60's importance weight
computed for documents on arrival.

A mixture pipeline that grows a target domain (the DSIR recipe, Xie
et al. 2023) wants each arriving document's importance signal — how
much more target-like than corpus-average it reads — the moment it
lands, so upsampling can route it without waiting for the next batch
selection pass. Both language models are TRAINED ARTIFACTS shipped to
the workers (lmgate's stance: bounded by vocabulary, not corpus — the
"ship the model file" class of broadcast):

- the BASE bigram->ppm table (the full-corpus LM d43 scores with);
- the TARGET bigram->ppm table (trained on the DSIR_TARGET slice).

Each arriving document is scored against both in ONE Arrow-batched
pandas UDF pass (no shuffle, no state, no watermark) and emits
weight_ppm = target - base, plus a route:

- 'target'     — the document IS target-source (never a candidate);
- 'candidate'  — scoreable non-target document (the batch selector
                 d60 takes the global top-DSIR_K of exactly these
                 weights; the gate emits the monotone per-doc signal,
                 selection stays a batch decision);
- 'short'      — < 2 tokens, unscoreable under a bigram LM (d60
                 excludes these by definition).

Parity (tested): replaying the corpus availableNow, candidate rows'
(base, target, weight) equal batch d60's weighted relation exactly,
and re-applying d60's (weight desc, md5, doc_id) order to the gate's
weights reproduces d60's top-DSIR_K selection row-for-row. The
base-LM OOV branch never fires on replay (training text); target-LM
misses score 0 ppm — the same COALESCE(pt, 0) convention as batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.dedup import DSIR_TARGET
from .lmgate import bigram_ppm_table, score_tokens


def dsir_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[dict[tuple[str, str], int], dict[tuple[str, str], int]]:
    """(base LM, target LM) — the two shipped model tables."""
    return (
        bigram_ppm_table(spark, sf_dir),
        bigram_ppm_table(spark, sf_dir, source=DSIR_TARGET),
    )


def stream_dsir_weights(
    spark: SparkSession,
    docs_dir: str,
    sf_dir: str | None = None,
    base_lm: dict[tuple[str, str], int] | None = None,
    target_lm: dict[tuple[str, str], int] | None = None,
    schema=None,
) -> DataFrame:
    """readStream over a documents directory -> (doc_id, source, lang,
    base_ppm, target_ppm, weight_ppm, route) per arriving document.

    Pass either precomputed LM dicts or ``sf_dir`` (the CORPUS dataset
    the models train on — NOT the arrivals directory, whose partial
    slice would silently break batch-d60 parity)."""
    if base_lm is None or target_lm is None:
        if sf_dir is None:
            raise ValueError(
                "stream_dsir_weights needs sf_dir (the training corpus) "
                "or explicit base_lm/target_lm model tables — the "
                "arrivals directory is not the corpus"
            )
        # Train only the missing table(s): a caller supplying one dict
        # (e.g. a cached base LM) must not pay a second full corpus
        # pass for the other it already has (ADVICE r10).
        if base_lm is None:
            base_lm = bigram_ppm_table(spark, sf_dir)
        if target_lm is None:
            target_lm = bigram_ppm_table(spark, sf_dir, source=DSIR_TARGET)
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    bb = spark.sparkContext.broadcast(base_lm)
    bt = spark.sparkContext.broadcast(target_lm)

    # ONE Arrow batch pass, ONE tokenize per document, both models
    # folded through the shared lmgate.score_tokens convention
    @F.pandas_udf("base_ppm long, target_ppm long")
    def both_scores(texts: pd.Series) -> pd.DataFrame:
        base, tgt = bb.value, bt.value
        rows = []
        for t in texts:
            w = (t or "").split(" ")
            rows.append((score_tokens(w, base), score_tokens(w, tgt)))
        return pd.DataFrame(rows, columns=["base_ppm", "target_ppm"])

    docs = spark.readStream.schema(schema).parquet(docs_dir)
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        both_scores(F.col("text")).alias("__s"),
    ).select(
        "doc_id",
        "source",
        "lang",
        F.col("__s.base_ppm").alias("base_ppm"),
        F.col("__s.target_ppm").alias("target_ppm"),
    )
    route = (
        F.when(F.col("base_ppm") < 0, "short")
        .when(F.col("source") == DSIR_TARGET, "target")
        .otherwise("candidate")
    )
    weight = F.when(
        F.col("base_ppm") < 0, F.lit(0).cast("long")
    ).otherwise((F.col("target_ppm") - F.col("base_ppm")).cast("long"))
    return scored.select(
        "doc_id",
        "source",
        "lang",
        "base_ppm",
        "target_ppm",
        weight.alias("weight_ppm"),
        route.alias("route"),
    )
