"""Round-14 optimization parity pins: every kernel/restructure that
changes HOW a relation is computed must stay bit-identical to the
declarative form it replaced (the d3-kernel discipline — the driver
hash-compares results, so 'close' is a regression)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_d2_sigs_arrow_kernel_matches_declarative_fold(spark):
    """The mapInArrow minhash build (r14: memoized per-distinct-shingle
    digests, parallel partitions) must reproduce the declarative
    `_minhash_spark` fold row-for-row — md5 hex min over ASCII strings
    is ordering-identical between UTF8String and Python str."""
    from risk_dashboard_database_spark.plans import dedup

    toks = dedup._shingle_toks(spark, SF_DIR)
    decl = toks.where(F.size("sh") > 0).withColumn(
        "mh", dedup._minhash_spark(F.col("sh"))
    )
    kern = dedup._minhash_arrow_sigs(spark, toks)
    a = {r["doc_id"]: (r["sh"], r["mh"]) for r in decl.collect()}
    b = {r["doc_id"]: (r["sh"], r["mh"]) for r in kern.collect()}
    assert a == b
    assert len(a) > 0


def _decl_assign(vecs, codebook, vec_col, cvec_col):
    """The pre-r14 declarative assignment (broadcast n x k fan-out +
    max_by re-fold), kept here as the parity reference."""
    from risk_dashboard_database_spark.plans.dedup import _dot_spark

    cos = _dot_spark(F.col(vec_col), F.col(cvec_col)) / (
        F.sqrt(_dot_spark(F.col(vec_col), F.col(vec_col)))
        * F.sqrt(_dot_spark(F.col(cvec_col), F.col(cvec_col)))
    )
    return (
        vecs.join(F.broadcast(codebook))
        .select("vec_id", "cid", cos.alias("__cos"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cid"),
                F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("nc")),
            ).alias("cell"),
        )
    )


def test_assign_arrow_kernel_matches_declarative_d49(spark):
    """_assign_arrow (r14) must reproduce the broadcast-join + max_by
    assignment bit-for-bit: same left-fold cosine op order, first-max
    argmax == (cos desc, cid asc) tie-break."""
    from risk_dashboard_database_spark.plans import dedup

    vecs = dedup._d49_vecs(spark, SF_DIR).select("vec_id", "v")
    gen1 = dedup._d49_codebook(spark, SF_DIR)
    kern = {
        r["vec_id"]: r["cell"]
        for r in dedup._d49_assign(spark, vecs, gen1).collect()
    }
    decl = {
        r["vec_id"]: r["cell"]
        for r in _decl_assign(vecs, gen1, "v", "c").collect()
    }
    assert kern == decl
    assert len(kern) > 0


def test_assign_arrow_kernel_matches_declarative_trained(spark, tmp_path, monkeypatch):
    """The trained-index build (cell argmax + PQ_M sub-code argmins +
    vnorm) must match the declarative fan-out row-for-row, including
    every float: vnorm is the same left-fold + sqrt, sub-distances the
    same (x-y)^2 fold, ties the same (dist, cid) ordering."""
    from risk_dashboard_database_spark.plans import dedup, relcache
    from risk_dashboard_database_spark.plans.dedup import (
        PQ_M,
        PQ_SUBDIM,
        _dot_spark,
        _sql2_spark,
    )

    monkeypatch.setattr(relcache, "MV_ROOT", str(tmp_path / "mv"))
    relcache.clear()
    try:
        kern = dedup._trained_assigned(spark, SF_DIR).collect()
        vecs = dedup._d49_vecs(spark, SF_DIR)
        cm = dedup._trained_centroids(spark, SF_DIR)
        cos = _dot_spark(F.col("v"), F.col("ce")) / (
            F.sqrt(_dot_spark(F.col("v"), F.col("v")))
            * F.sqrt(_dot_spark(F.col("ce"), F.col("ce")))
        )
        subdists = [
            _sql2_spark(
                F.slice(F.col("v"), (s - 1) * PQ_SUBDIM + 1, PQ_SUBDIM),
                F.slice(F.col("ce"), (s - 1) * PQ_SUBDIM + 1, PQ_SUBDIM),
            ).alias(f"d_{s}")
            for s in range(1, PQ_M + 1)
        ]
        fan = vecs.join(F.broadcast(cm)).select(
            "vec_id", "label", "v", "cid", cos.alias("__cos"), *subdists
        )
        decl = (
            fan.groupBy("vec_id")
            .agg(
                F.any_value("label").alias("label"),
                F.any_value("v").alias("v"),
                F.max_by(
                    F.col("cid"),
                    F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("nc")),
                ).alias("cell"),
                *[
                    F.min_by(F.col("cid"), F.struct(F.col(f"d_{s}"), F.col("cid")))
                    .alias(f"code_{s}")
                    for s in range(1, PQ_M + 1)
                ],
            )
            .withColumn("vnorm", F.sqrt(_dot_spark(F.col("v"), F.col("v"))))
        ).collect()
        key = lambda rows: {
            r["vec_id"]: (
                r["label"],
                tuple(r["v"]),
                r["cell"],
                tuple(r[f"code_{s}"] for s in range(1, PQ_M + 1)),
                r["vnorm"],
            )
            for r in rows
        }
        a, b = key(kern), key(decl)
        assert a == b
        assert len(a) > 0
    finally:
        relcache.clear()


def test_ivf_assigned_kernel_matches_declarative_stub(spark, tmp_path, monkeypatch):
    """_ivf_assigned (stub codebook) through the kernel: cell + norm
    bit-identical to the old broadcast fan-out."""
    from risk_dashboard_database_spark.plans import dedup, relcache
    from risk_dashboard_database_spark.plans.dedup import _dot_spark
    from risk_dashboard_database_spark.tables import load_table

    monkeypatch.setattr(relcache, "MV_ROOT", str(tmp_path / "mv"))
    relcache.clear()
    try:
        kern = dedup._ivf_assigned(spark, SF_DIR).collect()
        emb = load_table(spark, SF_DIR, "embeddings")
        centroids = dedup._ivf_centroids(spark, SF_DIR)
        cos = _dot_spark(F.col("embedding"), F.col("ce")) / (
            F.sqrt(_dot_spark(F.col("embedding"), F.col("embedding")))
            * F.sqrt(_dot_spark(F.col("ce"), F.col("ce")))
        )
        decl = (
            emb.join(centroids)
            .select("vec_id", "label", "embedding", "cid", cos.alias("__cos"))
            .groupBy("vec_id")
            .agg(
                F.any_value("label").alias("label"),
                F.any_value("embedding").alias("embedding"),
                F.max_by(
                    F.col("cid"),
                    F.struct(F.col("__cos").alias("c"), (-F.col("cid")).alias("nc")),
                ).alias("cell"),
            )
            .withColumn(
                "norm", F.sqrt(_dot_spark(F.col("embedding"), F.col("embedding")))
            )
        ).collect()
        key = lambda rows: {
            r["vec_id"]: (r["label"], tuple(r["embedding"]), r["cell"], r["norm"])
            for r in rows
        }
        a, b = key(kern), key(decl)
        assert a == b
        assert len(a) > 0
    finally:
        relcache.clear()


def test_d36_mining_kernel_matches_declarative(spark):
    """d36's local-top-k mining kernel must reproduce the declarative
    probes x corpus join + window exactly — cosines, margins (NULL
    when a probe has no same-label candidate), ranks, tie-breaks."""
    from pyspark.sql import Window

    from risk_dashboard_database_spark.plans import dedup
    from risk_dashboard_database_spark.plans.dedup import (
        D3_PROBES,
        HARDNEG_TOPK,
        _dot_spark,
        _normed_embeddings,
    )

    normed = _normed_embeddings(spark, SF_DIR)
    probes = F.broadcast(
        normed.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(D3_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qnorm"),
        )
    )
    cand = normed.select(
        F.col("vec_id").alias("candidate_id"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    scored = probes.join(cand, F.col("candidate_id") != F.col("query_id")).select(
        "query_id",
        "query_label",
        "candidate_id",
        "cand_label",
        (_dot_spark(F.col("qe"), F.col("ce")) / (F.col("qnorm") * F.col("cnorm"))).alias(
            "cosine"
        ),
    )
    best_pos = (
        scored.where(F.col("cand_label") == F.col("query_label"))
        .groupBy("query_id")
        .agg(F.max("cosine").alias("best_pos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("candidate_id")
    )
    negs = (
        scored.where(F.col("cand_label") != F.col("query_label"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARDNEG_TOPK)
    )
    decl = negs.join(F.broadcast(best_pos), "query_id", "left").select(
        "query_id",
        "candidate_id",
        F.col("cand_label").alias("neg_label"),
        "cosine",
        (F.col("best_pos") - F.col("cosine")).alias("margin"),
        F.col("rank").cast("int").alias("rank"),
    )
    key = lambda rows: {
        (r["query_id"], r["rank"]): (
            r["candidate_id"],
            r["neg_label"],
            r["cosine"],
            r["margin"],
        )
        for r in rows
    }
    a = key(dedup.d36_hard_negatives(spark, SF_DIR).collect())
    b = key(decl.collect())
    assert a == b
    assert len(a) > 0
