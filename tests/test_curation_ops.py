"""Round-7 corpus-curation additions: PII redaction (t_pii_redact)
and temperature-weighted domain mixture sampling (d18_temperature_mix).
Value-exactness vs DuckDB is the oracle gate's job (both ship with full
SQL oracles); these tests pin the semantic invariants a hash can't
explain on its own: non-vacuity, complete redaction, and the mixture
actually reshaping the domain distribution."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import d18_temperature_mix
from risk_dashboard_database_spark.plans.textstats import (
    _PII_EMAIL_RE,
    _PII_PHONE_RE,
    t_pii_redact,
)

SF_DIR = "/root/testdata/sf0.001"


def test_pii_redact_is_complete_and_nonvacuous(spark):
    rows = t_pii_redact(spark, SF_DIR).collect()
    assert len(rows) == 500
    email = re.compile(_PII_EMAIL_RE)
    phone = re.compile(_PII_PHONE_RE)
    n_with_pii = 0
    for r in rows:
        # redaction is total: no pattern survives in the output text
        assert not email.search(r["redacted"]), r["doc_id"]
        assert not phone.search(r["redacted"]), r["doc_id"]
        if r["doc_id"] % 7 == 0:
            # the %7 branch plants exactly two addresses (and wins over
            # the %11 branch on doc_id % 77 == 0 — CASE order)
            assert r["n_emails"] == 2 and r["n_phones"] == 0
            assert "[EMAIL]" in r["redacted"]
        elif r["doc_id"] % 11 == 0:
            assert r["n_phones"] == 1 and r["n_emails"] == 0
            assert "[PHONE]" in r["redacted"]
        else:
            assert r["n_emails"] == 0 and r["n_phones"] == 0
            assert r["has_pii"] == 0
        assert r["has_pii"] == int(r["n_emails"] + r["n_phones"] > 0)
        n_with_pii += r["has_pii"]
    assert n_with_pii > 0, "corpus gate must be non-vacuous"


def test_temperature_mix_reshapes_the_distribution(spark):
    out = d18_temperature_mix(spark, SF_DIR)
    rows = out.collect()
    assert rows, "mixture sample must be non-empty"
    by_lang = {}
    for r in rows:
        assert r["rk"] <= r["quota"]
        by_lang.setdefault(r["lang"], []).append(r)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_total = sum(corpus.values())
    target = (n_total + 3) // 4
    picked = sum(len(v) for v in by_lang.values())
    # quotas use per-domain ceil, so the total overshoots the target by
    # at most one doc per domain and never undershoots
    assert target <= picked <= target + len(corpus)
    # temperature flattens: the dominant domain's sampled share sits
    # strictly below its corpus share, rare domains strictly above
    dominant = max(corpus, key=corpus.get)
    rare = min(corpus, key=corpus.get)
    assert len(by_lang[dominant]) / picked < corpus[dominant] / n_total
    assert len(by_lang[rare]) / picked > corpus[rare] / n_total
    # per-domain quota == observed count (every quota row materializes)
    for lang, lrows in by_lang.items():
        assert len(lrows) == lrows[0]["quota"]


def test_temperature_mix_rank_is_deskewed(spark):
    """The r8 two-phase rank contract: the row_number window must be
    partitioned by (lang, bkt) — never by lang alone, which would sort
    a Zipf-dominant domain in one task — and the dead-bucket filter
    (the broadcast join against live buckets) must sit BELOW the
    window in the executed plan, so pruned buckets are never sorted."""
    plan = (
        d18_temperature_mix(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    win = [
        i
        for i, ln in enumerate(lines)
        if "row_number() windowspecdefinition" in ln
    ]
    assert win, "rank window missing from executed plan"
    spec = lines[win[0]]
    assert re.search(r"windowspecdefinition\(lang#\d+, bkt#\d+,", spec), spec
    join = [i for i, ln in enumerate(lines) if "BroadcastHashJoin" in ln]
    assert join and join[0] > win[0], "bucket-prune join must feed the window"


def test_embedding_clusters_agree_with_pairs(spark):
    """d19's clusters must be exactly the transitive closure of d7's
    pairs: both endpoints of every pair share a cluster_id, the
    canonical member is the min vec_id, and cluster_size matches the
    member count."""
    from risk_dashboard_database_spark.plans.dedup import (
        d7_embedding_dedup,
        d19_embedding_clusters,
    )

    clusters = d19_embedding_clusters(spark, SF_DIR).collect()
    assert clusters, "corpus must produce at least one cluster"
    cid = {r["vec_id"]: r["cluster_id"] for r in clusters}
    by_cluster = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        assert len(members) >= 2, "singletons have no near-dup partner"
        assert {m["cluster_size"] for m in members} == {len(members)}
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1
        assert canon[0]["vec_id"] == min(m["vec_id"] for m in members)
        assert canon[0]["vec_id"] == members[0]["cluster_id"]
    for p in d7_embedding_dedup(spark, SF_DIR).collect():
        assert cid[p["vec_a"]] == cid[p["vec_b"]], (p["vec_a"], p["vec_b"])


def test_decontam_spans_agree_with_flags(spark):
    """d20's audit rows must be exactly d15's contaminated set, with
    >= 1 matched gram each and the gram list canonically sorted."""
    from risk_dashboard_database_spark.plans.dedup import (
        d15_decontaminate,
        d20_decontam_spans,
    )

    spans = d20_decontam_spans(spark, SF_DIR).collect()
    flagged = {
        r["doc_id"]
        for r in d15_decontaminate(spark, SF_DIR).collect()
        if r["contaminated"] == 1
    }
    assert {r["doc_id"] for r in spans} == flagged
    assert flagged, "decontamination must be non-vacuous"
    for r in spans:
        grams = r["hits"].split(" | ")
        assert r["n_hits"] == len(grams) >= 1
        assert grams == sorted(grams)
