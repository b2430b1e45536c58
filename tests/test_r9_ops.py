"""Round-9 additions: Zipf rank-frequency profile (t_zipf_profile),
annealing-phase mixture (d54_anneal_mix), cross-video frame dedup
(m5_frame_dedup). Value exactness vs DuckDB is the oracle gate's job
(all three ship full SQL oracles); these tests pin the semantic
invariants a hash can't explain and the plan shapes the 100 TB story
depends on."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_zipf_profile_matches_python_counter(spark):
    from risk_dashboard_database_spark.plans.textstats import t_zipf_profile

    rows = {r["rank"]: r for r in t_zipf_profile(spark, SF_DIR).collect()}
    assert rows, "profile must be non-empty"
    freq = Counter()
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        freq.update(w for w in r["text"].split(" ") if w)
    ordered = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    for rank, row in rows.items():
        assert rank & (rank - 1) == 0, "ranks are powers of two"
        term, f = ordered[rank - 1]
        assert (row["term"], row["freq"]) == (term, f)
        t2, f2 = ordered[2 * rank - 1]
        assert row["decay_ppm"] == (f * 1_000_000) // f2
        assert row["decay_ppm"] >= 1_000_000, "frequency is non-increasing"


def test_zipf_profile_never_sorts_the_vocabulary_globally(spark):
    """The global top-K must be TakeOrderedAndProject (per-partition
    heaps) and the rank window must consume the already-limited rows —
    never a Sort of the vocabulary feeding a single-partition window."""
    from risk_dashboard_database_spark.plans.textstats import t_zipf_profile

    plan = _executed_plan(t_zipf_profile(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    for window_at in (i for i, ln in enumerate(plan.splitlines()) if "Window" in ln):
        below = plan.splitlines()[window_at:]
        assert any("TakeOrderedAndProject" in ln for ln in below), (
            "rank window must sit above the limit"
        )


def test_anneal_mix_is_the_head_tertile_of_d43(spark):
    """The anneal pool must be exactly d43's per-language 'head'
    bucket: same doc counts, and the base rows must equal
    head+middle+tail."""
    from risk_dashboard_database_spark.plans.dedup import (
        d43_lm_quality_buckets,
        d54_anneal_mix,
    )

    d43 = {
        (r["lang"], r["bucket"]): r["n_docs"]
        for r in d43_lm_quality_buckets(spark, SF_DIR).collect()
    }
    mix = {
        (r["lang"], r["phase"]): r
        for r in d54_anneal_mix(spark, SF_DIR).collect()
    }
    langs = {k[0] for k in mix}
    for lang in langs:
        assert mix[(lang, "anneal")]["n_docs"] == d43[(lang, "head")]
        scored_total = sum(
            d43.get((lang, b), 0) for b in ("head", "middle", "tail")
        )
        assert mix[(lang, "base")]["n_docs"] == scored_total
        assert mix[(lang, "anneal")]["n_tokens"] <= mix[(lang, "base")]["n_tokens"]
    # phase shares sum to ~1e6 (integer floor: within |langs| ppm)
    for phase in ("base", "anneal"):
        s = sum(r["tok_share_ppm"] for (l, p), r in mix.items() if p == phase)
        assert 1_000_000 - len(langs) <= s <= 1_000_000


def test_frame_dedup_flags_are_cross_video_only(spark):
    """A frame fingerprint counts as duplicated iff it appears in at
    least TWO videos; within-video repeats alone must not flag
    (recomputed per-fingerprint in Python)."""
    from risk_dashboard_database_spark.plans.multimodal import m5_frame_dedup

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    fps: dict[str, set] = {}
    per_doc: dict[int, list] = {}
    import hashlib

    for doc_id, text in docs.items():
        n = len(text.encode("utf-8"))
        nf = 1 + n % 30
        ns = min(4, nf)
        frames = []
        for i in range(ns):
            sf_ = i * nf // ns
            off = 1 + (sf_ * 17) % max(len(text) - 11, 1)
            frame = text[off - 1 : off - 1 + 12]
            fp = hashlib.md5(frame.encode("utf-8")).hexdigest()
            frames.append(fp)
            fps.setdefault(fp, set()).add(doc_id)
        per_doc[doc_id] = frames
    want = {
        doc_id: (
            len(frames),
            sum(1 for fp in frames if len(fps[fp]) >= 2),
        )
        for doc_id, frames in per_doc.items()
    }
    got = {
        r["doc_id"]: (r["sampled_frames"], r["dup_frames"])
        for r in m5_frame_dedup(spark, SF_DIR).collect()
    }
    assert got == want


def test_packing_efficiency_matches_python_arithmetic(spark):
    from risk_dashboard_database_spark.plans.dedup import (
        D55_SEQ_LENS,
        d55_packing_efficiency,
    )

    toks = [
        len(r["text"].split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    got = {r["seq_len"]: r for r in d55_packing_efficiency(spark, SF_DIR).collect()}
    assert set(got) == set(D55_SEQ_LENS)
    for L, r in got.items():
        seqs = sum(-(-t // L) for t in toks)
        pad = seqs * L - sum(min(t, -(-t // L) * L) for t in toks)
        assert r["n_docs"] == len(toks)
        assert r["total_tokens"] == sum(toks)
        assert r["padded_seqs"] == seqs
        assert r["pad_tokens"] == seqs * L - sum(toks)
        assert r["pad_ppm"] == ((seqs * L - sum(toks)) * 1_000_000) // (seqs * L)
        lost = sum(t - min(t, L) for t in toks)
        assert r["trunc_lost_tokens"] == lost
        assert r["trunc_lost_ppm"] == (lost * 1_000_000) // sum(toks)
        # longer sequences waste more padding, lose less to truncation
    Ls = sorted(got)
    for a, b in zip(Ls, Ls[1:]):
        assert got[a]["trunc_lost_tokens"] >= got[b]["trunc_lost_tokens"]


def test_quality_dup_cross_ties_to_d9_and_t_quality(spark):
    """Row sums must reconcile exactly with d9's cluster census and
    t_quality_score's per-score counts — the cross must be a
    re-bucketing, never a re-derivation."""
    from collections import Counter

    from risk_dashboard_database_spark.plans.dedup import (
        d9_dedup_clusters,
        d56_quality_dup_cross,
    )
    from risk_dashboard_database_spark.plans.textstats import t_quality_score

    rows = d56_quality_dup_cross(spark, SF_DIR).collect()
    by_status = Counter()
    by_score = Counter()
    for r in rows:
        by_status[r["dup_status"]] += r["n_docs"]
        by_score[r["quality_score"]] += r["n_docs"]
    clusters = d9_dedup_clusters(spark, SF_DIR).collect()
    n_canon = sum(1 for c in clusters if c["is_canonical"])
    n_dup = len(clusters) - n_canon
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert by_status["canonical"] == n_canon
    assert by_status["duplicate"] == n_dup
    assert by_status["unique"] == n_docs - len(clusters)
    want_scores = Counter(
        r["quality_score"] for r in t_quality_score(spark, SF_DIR).collect()
    )
    assert by_score == want_scores
    for r in rows:
        assert 0 <= r["share_ppm"] <= 1_000_000


def test_code_detect_routes_exactly_the_planted_docs(spark):
    """Synthetic corpus carries no code, so the planted doc_id % 9
    schedule must be exactly the 'code' route (the detector's hit AND
    miss paths both proven)."""
    from risk_dashboard_database_spark.plans.textstats import t_code_detect

    rows = t_code_detect(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        want = "code" if r["doc_id"] % 9 == 0 else "prose"
        assert r["route"] == want, (r["doc_id"], r["route"])
        if want == "code":
            assert r["n_kw"] >= 2 and r["sym_ppm"] >= 50000


def test_html_strip_matches_python_reference(spark):
    """Hand-recompute the strip chain in Python for every planted doc:
    script blocks vanish with contents, tags become spaces, entities
    decode, whitespace collapses — and the clean text of a non-planted
    doc is byte-identical to the original."""
    import re

    from risk_dashboard_database_spark.plans.textstats import t_html_strip

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    got = {r["doc_id"]: r for r in t_html_strip(spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        if doc_id % 6 == 0:
            raw = (
                f"<html><body><h1>T{doc_id}</h1><p>{text}"
                f" &amp; more &lt;here&gt;</p><script>var x={doc_id};"
                f'</script><a href="/d?id={doc_id}">link</a></body></html>'
            )
        else:
            raw = text
        clean = re.sub(r"<script>[^<]*</script>", "", raw)
        clean = re.sub(r"<[^>]+>", " ", clean)
        clean = clean.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        clean = re.sub(r" +", " ", clean).strip()
        r = got[doc_id]
        assert r["clean"] == clean, doc_id
        assert r["raw_chars"] == len(raw)
        assert r["clean_chars"] == len(clean)
        assert r["markup_ppm"] == ((len(raw) - len(clean)) * 1_000_000) // max(
            len(raw), 1
        )
        if doc_id % 6 != 0:
            assert r["markup_ppm"] == 0 and r["clean"] == text


def test_span_strip_removed_equals_d30_covered(spark):
    """d57 must remove EXACTLY the positions d30 counts as covered:
    removed_tokens == d30.covered_tokens per document, the cleaned
    token count reconciles, and a fully-removed doc is one whose d30
    coverage is total."""
    from risk_dashboard_database_spark.plans.dedup import (
        d30_span_dedup,
        d57_span_strip,
    )

    cov = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in d30_span_dedup(spark, SF_DIR).collect()
    }
    rows = d57_span_strip(spark, SF_DIR).collect()
    assert {r["doc_id"] for r in rows} == set(cov)
    for r in rows:
        n, covered = cov[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["removed_tokens"] == covered
        assert r["kept_tokens"] == n - covered
        n_clean = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
        assert n_clean == r["kept_tokens"]
        assert r["fully_removed"] == (1 if covered == n else 0)


def test_simpson_matches_python_counter(spark):
    from risk_dashboard_database_spark.plans.textstats import t_simpson

    got = {r["doc_id"]: r for r in t_simpson(spark, SF_DIR).collect()}
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        toks = r["text"].split(" ")
        counts = Counter(toks)
        sum_sq = sum(c * c for c in counts.values())
        g = got[r["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["sum_sq"] == sum_sq
        assert g["simpson_ppm"] == (sum_sq * 1_000_000) // (len(toks) ** 2)


def test_quota_rebalance_laws(spark):
    """The quota sheet must satisfy the rebalance contract: shares sum
    to ~1e6, keep_ppm <= 1e6, the binding source keeps ~everything,
    expected tokens realize the target shares at the feasible total,
    and the coin actuals land within the bounded md5 deviation."""
    import math

    from risk_dashboard_database_spark.plans.dedup import (
        d58_source_quota_rebalance,
    )

    rows = d58_source_quota_rebalance(spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    assert 1_000_000 - n <= sum(r["target_share_ppm"] for r in rows) <= 1_000_000
    total = sum(r["n_tokens"] for r in rows)
    assert sum(r["cur_share_ppm"] for r in rows) <= 1_000_000
    for r in rows:
        assert 0 <= r["keep_ppm"] <= 1_000_000
        assert r["expected_tokens"] == (r["n_tokens"] * r["keep_ppm"]) // 1_000_000
        assert r["kept_docs"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["n_tokens"]
    # the feasible total is set by the binding source: at least one
    # source keeps >= 99% of its tokens (integer floors shave a little)
    assert any(r["keep_ppm"] >= 990_000 for r in rows)
    # sqrt temperature flattens: the token-richest source's target
    # share must not exceed its current share, the poorest's must not
    # fall below it
    rich = max(rows, key=lambda r: r["n_tokens"])
    poor = min(rows, key=lambda r: r["n_tokens"])
    assert rich["target_share_ppm"] <= rich["cur_share_ppm"] + 1
    assert poor["target_share_ppm"] >= poor["cur_share_ppm"] - 1


def test_guarded_ppm_raises_instead_of_wrapping(spark):
    """The mixture/packing ppm expressions guard their corpus-total
    multiplicand: above (2^63-1)/1e6 they raise loudly (like DuckDB
    and ANSI Spark) instead of silently wrapping on a legacy session."""
    import pytest

    from risk_dashboard_database_spark.plans.dedup import (
        PPM_SAFE_MAX,
        _guarded_ppm_sql,
    )
    from pyspark.sql import functions as F

    safe = spark.range(1).selectExpr(f"{PPM_SAFE_MAX}L as x", "7L as y")
    assert (
        safe.select(F.expr(_guarded_ppm_sql("x", "y")).alias("p")).first()["p"]
        == (PPM_SAFE_MAX * 1_000_000) // 7
    )
    hot = spark.range(1).selectExpr(f"{PPM_SAFE_MAX + 1}L as x", "7L as y")
    with pytest.raises(Exception, match="ppm overflow"):
        hot.select(F.expr(_guarded_ppm_sql("x", "y")).alias("p")).collect()


def test_cluster_drift_matches_bruteforce_and_ties_to_d9(spark):
    """Recompute the within-cluster exact-Jaccard audit in Python from
    d9's clusters and the raw shingle sets; the rollup must match
    per size, and every audited cluster must come from d9."""
    from risk_dashboard_database_spark.plans.dedup import (
        D59_MAX_CLUSTER,
        _J_THRESH_PPM,
        _shingles_spark,
        d9_dedup_clusters,
        d59_cluster_drift,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", _shingles_spark(F.col("text")).alias("sh")
        ).collect()
    }
    clusters: dict[int, list] = {}
    for r in d9_dedup_clusters(spark, SF_DIR).collect():
        if 2 <= r["cluster_size"] <= D59_MAX_CLUSTER:
            clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    per_size: dict[int, list] = {}
    for cid, members in clusters.items():
        members.sort()
        ppms = []
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                inter = len(sh[a] & sh[b])
                uni = len(sh[a]) + len(sh[b]) - inter
                ppms.append((inter * 1_000_000) // max(uni, 1))
        per_size.setdefault(len(members), []).append(ppms)
    rows = d59_cluster_drift(spark, SF_DIR).collect()
    # audited rows only — over-cap sizes carry the -1 sentinel (none
    # exist at this SF; the disclosure contract is pinned below)
    got = {
        r["cluster_size"]: r for r in rows if r["drifted_clusters"] != -1
    }
    assert len(got) == len(rows)
    assert set(got) == set(per_size)
    for size, cluster_ppms in per_size.items():
        r = got[size]
        assert r["n_clusters"] == len(cluster_ppms)
        assert r["worst_pair_ppm"] == min(min(p) for p in cluster_ppms)
        total = sum(sum(p) for p in cluster_ppms)
        npairs = sum(len(p) for p in cluster_ppms)
        assert r["mean_pair_ppm"] == total // npairs
        assert r["drifted_clusters"] == sum(
            1 for p in cluster_ppms if min(p) < _J_THRESH_PPM
        )


def test_cluster_drift_discloses_over_cap_clusters(spark, tmp_path):
    """VERDICT r9 #5: a cluster bigger than D59_MAX_CLUSTER must NOT
    vanish from the audit — it appears as a row whose audit columns
    are the -1 sentinel and whose n_clusters counts it. Built on a
    synthetic corpus where one 70-member exact-duplicate cluster
    exceeds the cap and a handful of distinct docs ride along."""
    import pandas as pd

    from risk_dashboard_database_spark.plans.dedup import (
        D59_MAX_CLUSTER,
        d59_cluster_drift,
    )

    n_dup = D59_MAX_CLUSTER + 6
    dup_text = " ".join(f"w{i % 17}" for i in range(60))
    rows = [
        {"doc_id": i, "text": dup_text, "lang": "en",
         "source": "synthetic", "n_chars": len(dup_text)}
        for i in range(n_dup)
    ] + [
        {"doc_id": 1000 + i,
         "text": " ".join(f"u{i}x{j}" for j in range(40)),
         "lang": "en", "source": "synthetic", "n_chars": 200}
        for i in range(5)
    ]
    ds = tmp_path / "overcap_ds"
    ds.mkdir()
    pd.DataFrame(rows).to_parquet(ds / "documents.parquet")

    out = d59_cluster_drift(spark, str(ds)).collect()
    over = [r for r in out if r["cluster_size"] == n_dup]
    assert over, f"over-cap cluster missing from the audit output: {out}"
    assert over[0]["n_clusters"] == 1
    assert over[0]["worst_pair_ppm"] == -1
    assert over[0]["mean_pair_ppm"] == -1
    assert over[0]["drifted_clusters"] == -1
    # nothing under the cap is sentinel-marked
    assert all(
        r["drifted_clusters"] != -1
        for r in out
        if r["cluster_size"] <= D59_MAX_CLUSTER
    )


def test_burstiness_matches_python_reference(spark):
    """Per-doc Fano factor of sentence lengths recomputed in plain
    Python (including the planted sentence-break schedule); ppm-exact.
    plant=False on this punctuation-free corpus must read exactly one
    sentence per doc with burst 0 — the miss path."""
    import hashlib
    import re

    from risk_dashboard_database_spark.plans.textstats import t_burstiness

    want = {}
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        toks = r["text"].split(" ")
        planted = " ".join(
            t
            + (
                "."
                if hashlib.md5(f"{r['doc_id']}:{i}".encode()).hexdigest()[0]
                < "4"
                else ""
            )
            for i, t in enumerate(toks, start=1)
        )
        ss = [s.strip() for s in re.split(r"[.!?]+", planted)]
        ls = [len(s.split(" ")) for s in ss if s]
        n, s1, s2 = len(ls), sum(ls), sum(x * x for x in ls)
        mean = (s1 * 1_000_000) // n if n else 0
        burst = (
            ((n * s2 - s1 * s1) * 1_000_000) // (n * s1) if n and s1 else 0
        )
        want[r["doc_id"]] = (n, mean, burst)
    got = {
        r["doc_id"]: (r["n_sentences"], r["mean_len_ppm"], r["burst_ppm"])
        for r in t_burstiness(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(v[2] > 0 for v in got.values())

    raw = t_burstiness(spark, SF_DIR, plant=False).collect()
    assert raw and all(
        r["n_sentences"] == 1 and r["burst_ppm"] == 0 for r in raw
    )


def test_dsir_selection_laws(spark):
    """d60: exactly DSIR_K rows, none from the target source, ranks
    dense 1..K, weight non-increasing in rank order, and every
    weight equals the recomputed target-minus-base score difference
    for that document."""
    from risk_dashboard_database_spark.plans.dedup import (
        DSIR_K,
        DSIR_TARGET,
        _d43_doc_scores,
        d60_dsir_select,
    )

    rows = sorted(d60_dsir_select(spark, SF_DIR).collect(), key=lambda r: r["rank"])
    assert len(rows) == DSIR_K
    assert [r["rank"] for r in rows] == list(range(1, DSIR_K + 1))
    assert all(r["source"] != DSIR_TARGET for r in rows)
    ws = [r["weight_ppm"] for r in rows]
    assert all(a >= b for a, b in zip(ws, ws[1:]))
    assert all(
        r["weight_ppm"] == r["target_ppm"] - r["base_ppm"] for r in rows
    )

    # base scores tie to the stored d43 MV
    base = {
        r["doc_id"]: r["score"] for r in _d43_doc_scores(spark, SF_DIR).collect()
    }
    assert all(r["base_ppm"] == base[r["doc_id"]] for r in rows)

    # target LM recomputed in python for the top row's documents:
    # bigram counts over the target slice, left-join mean over the doc
    docs = {
        r["doc_id"]: (r["source"], r["text"].split(" "))
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    from collections import Counter

    c2, c1 = Counter(), Counter()
    for src, tk in docs.values():
        if src == DSIR_TARGET and len(tk) >= 2:
            for a, b in zip(tk, tk[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
    for r in rows[:5]:
        tk = docs[r["doc_id"]][1]
        grams = list(zip(tk, tk[1:]))
        total = sum(
            (c2[g] * 1_000_000) // c1[g[0]] if g in c2 else 0 for g in grams
        )
        assert r["target_ppm"] == total // len(grams)


def test_centroid_outliers_match_python_bruteforce(spark):
    """d61 recomputed from the trained index + codebook in Python:
    per-cell member/outlier counts and worst cosine, plus the
    outliers-iff-min-below-floor invariant."""
    from risk_dashboard_database_spark.plans.dedup import (
        D61_TAU,
        _trained_assigned,
        _trained_centroids,
        d61_centroid_outliers,
    )

    cm = {
        r["cid"]: r["ce"]
        for r in _trained_centroids(spark, SF_DIR).collect()
    }
    per_cell: dict[int, list] = {}
    for r in _trained_assigned(spark, SF_DIR).collect():
        ce = cm[r["cell"]]
        dot = sum(float(x) * float(y) for x, y in zip(r["v"], ce))
        nv = sum(float(x) * float(x) for x in r["v"]) ** 0.5
        nc = sum(float(y) * float(y) for y in ce) ** 0.5
        per_cell.setdefault(r["cell"], []).append(dot / (nv * nc))
    rows = {r["cell"]: r for r in d61_centroid_outliers(spark, SF_DIR).collect()}
    assert set(rows) == set(per_cell)
    for cell, cs in per_cell.items():
        r = rows[cell]
        outs = sum(1 for c in cs if c < D61_TAU)
        assert r["n_members"] == len(cs)
        assert r["n_outliers"] == outs
        assert r["outlier_ppm"] == (outs * 1_000_000) // len(cs)
        assert abs(r["min_cos"] - min(cs)) < 1e-12
        assert (r["n_outliers"] > 0) == (r["min_cos"] < D61_TAU)
