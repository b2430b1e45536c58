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
