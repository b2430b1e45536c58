"""Round-11 operators: t_novelty, d62_quantization_error,
m6_modality_mix — python brute-force parity + structural invariants."""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP

SF_DIR = "/root/testdata/sf0.001"


def _tri_grams(text: str) -> set[str]:
    t = text.split(" ")
    return {
        " ".join(t[i : i + 3]) for i in range(len(t) - 2)
    } if len(t) >= 3 else set()


def test_novelty_matches_python_first_occurrence(spark):
    """t_novelty recomputed in plain Python: per doc, distinct
    trigrams whose corpus-wide min doc_id is this doc."""
    from risk_dashboard_database_spark.plans.textstats import t_novelty

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    first: dict[str, int] = {}
    for doc_id in sorted(docs):
        for g in _tri_grams(docs[doc_id]):
            first.setdefault(g, doc_id)
    rows = {r["doc_id"]: r for r in t_novelty(spark, SF_DIR).collect()}
    assert set(rows) == set(docs)
    total_novel = 0
    for doc_id, text in docs.items():
        gs = _tri_grams(text)
        r = rows[doc_id]
        novel = sum(1 for g in gs if first[g] == doc_id)
        total_novel += novel
        assert r["n_grams"] == len(gs)
        assert r["n_novel"] == novel
        if gs:
            assert r["novel_ppm"] == (novel * 1_000_000) // len(gs)
        else:
            assert r["novel_ppm"] == 0
    # every gram is novel in exactly one document
    assert total_novel == len(first)
    # the earliest gram-bearing document is 100% novel by construction
    first_doc = min(d for d in docs if _tri_grams(docs[d]))
    assert rows[first_doc]["novel_ppm"] == 1_000_000


def test_quantization_error_matches_python_bruteforce(spark):
    """d62 recomputed from the trained index + codebook in Python:
    per-cell member counts, fill share, mean/max floored-ppm
    distortion."""
    from risk_dashboard_database_spark.plans.dedup import (
        _trained_assigned,
        _trained_centroids,
        d62_quantization_error,
    )
    import math

    cm = {
        r["cid"]: r["ce"]
        for r in _trained_centroids(spark, SF_DIR).collect()
    }
    per_cell: dict[int, list[int]] = {}
    for r in _trained_assigned(spark, SF_DIR).collect():
        ce = cm[r["cell"]]
        dot = sum(float(x) * float(y) for x, y in zip(r["v"], ce))
        nv = sum(float(x) * float(x) for x in r["v"]) ** 0.5
        nc = sum(float(y) * float(y) for y in ce) ** 0.5
        err = math.floor(max(0.0, 1.0 - dot / (nv * nc)) * 1_000_000.0)
        per_cell.setdefault(r["cell"], []).append(err)
    total = sum(len(v) for v in per_cell.values())
    rows = {
        r["cell"]: r
        for r in d62_quantization_error(spark, SF_DIR).collect()
    }
    assert set(rows) == set(per_cell)
    for cell, errs in per_cell.items():
        r = rows[cell]
        assert r["n_members"] == len(errs)
        assert r["fill_ppm"] == (len(errs) * 1_000_000) // total
        assert r["mean_err_ppm"] == sum(errs) // len(errs)
        assert r["max_err_ppm"] == max(errs)
        # distortion is a [0, 2e6] ppm quantity by construction
        assert 0 <= r["mean_err_ppm"] <= r["max_err_ppm"] <= 2_000_000


def test_modality_mix_matches_python(spark):
    """m6 recomputed in plain Python off m1's classification rule;
    byte shares within a source sum to 1e6 within div truncation."""
    from risk_dashboard_database_spark.plans.multimodal import m6_modality_mix

    agg: dict[tuple[str, str], list[int]] = {}
    for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect():
        b = len(r["text"].encode("utf-8"))
        if r["text"][:4] == "key ":
            mt = "KEY0"
        else:
            mt = {0: "IMG", 1: "AUD"}.get(b % 3, "VID")
        cur = agg.setdefault((r["source"], mt), [0, 0])
        cur[0] += 1
        cur[1] += b
    src_bytes: dict[str, int] = {}
    for (src, _), (_, tb) in agg.items():
        src_bytes[src] = src_bytes.get(src, 0) + tb
    rows = {
        (r["source"], r["media_type"]): r
        for r in m6_modality_mix(spark, SF_DIR).collect()
    }
    assert set(rows) == set(agg)
    shares: dict[str, int] = {}
    for key, (n, tb) in agg.items():
        r = rows[key]
        assert r["n_items"] == n
        assert r["total_bytes"] == tb
        assert r["byte_share_ppm"] == (tb * 1_000_000) // src_bytes[key[0]]
        shares[key[0]] = shares.get(key[0], 0) + r["byte_share_ppm"]
    for src, s in shares.items():
        n_types = sum(1 for k in agg if k[0] == src)
        assert 1_000_000 - n_types < s <= 1_000_000


def test_budget_threshold_matches_python(spark):
    """d63 recomputed in plain Python off the same stored score MV:
    per-lang descending value-grain fill until the token budget."""
    from risk_dashboard_database_spark.plans.dedup import (
        D63_BUDGET_PPM,
        _d43_doc_scores,
        d63_budget_threshold,
    )

    per_lang: dict[str, dict[int, list[int]]] = {}
    for r in _d43_doc_scores(spark, SF_DIR).collect():
        d = per_lang.setdefault(r["lang"], {}).setdefault(r["score"], [0, 0])
        d[0] += 1
        d[1] += r["n_bigrams"] + 1
    rows = {r["lang"]: r for r in d63_budget_threshold(spark, SF_DIR).collect()}
    assert set(rows) == set(per_lang)
    for lang, dom in per_lang.items():
        total = sum(t for _, t in dom.values())
        budget = (total * D63_BUDGET_PPM) // 1_000_000
        cum = 0
        cut = None
        docs_kept = 0
        tokens_kept = 0
        for score in sorted(dom, reverse=True):
            cum += dom[score][1]
            if cum <= budget:
                cut = score
                docs_kept += dom[score][0]
                tokens_kept = cum
            else:
                break
        r = rows[lang]
        assert r["budget_tokens"] == budget
        assert r["cut_score"] == cut
        assert r["docs_kept"] == docs_kept
        assert r["tokens_kept"] == tokens_kept
        assert r["fill_ppm"] == (tokens_kept * 1_000_000) // budget
        # the cut fills the budget tightly but never exceeds it
        assert tokens_kept <= budget
        if cut is not None:
            next_lower = max(
                (s for s in dom if s < cut), default=None
            )
            if next_lower is not None:
                assert tokens_kept + dom[next_lower][1] > budget


def test_keyset_page_equals_offset_page(spark):
    """o8 (seek method) must produce o1's third page exactly — same
    rows, same order — while compiling to a cursor anchor + top-50
    instead of an OFFSET discard."""
    from risk_dashboard_database_spark.plans.toporder import (
        o1_pagination,
        o8_keyset_pagination,
    )

    def rows(df):
        return [tuple(r) for r in df.collect()]

    base = rows(o1_pagination(spark, SF_DIR))
    seek = rows(o8_keyset_pagination(spark, SF_DIR))
    assert seek == base
    assert len(seek) == 50


def test_session_windows_match_python_islands(spark):
    """w12 recomputed via plain-Python gaps-and-islands over the raw
    events: Spark's native session_window merge semantics (fuse under
    the gap; end = last event + gap) from first principles."""
    import datetime as dt

    from risk_dashboard_database_spark.plans.windows import (
        W12_GAP_S,
        w12_session_windows,
    )

    per_user: dict[int, list] = {}
    for r in spark.read.parquet(f"{SF_DIR}/events.parquet").collect():
        per_user.setdefault(r["user_id"], []).append(r["ts"])
    gap = dt.timedelta(seconds=W12_GAP_S)
    want = {}
    for u, tss in per_user.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for ts in tss[1:]:
            if ts - prev >= gap:
                want[(u, str(start))] = (str(prev + gap), n)
                start, n = ts, 0
            n += 1
            prev = ts
        want[(u, str(start))] = (str(prev + gap), n)
    got = {
        (
            r["user_id"],
            r["session_start"].replace(".000000", "")
            if r["session_start"].endswith(".000000")
            else r["session_start"],
        ): (
            r["session_end"].replace(".000000", "")
            if r["session_end"].endswith(".000000")
            else r["session_end"],
            r["n_events"],
        )
        for r in w12_session_windows(spark, SF_DIR).collect()
    }
    assert got == want


def test_doremi_mix_matches_python(spark):
    """d64 recomputed in plain Python off the same stored score MV +
    (doc_id, source) projection: integer means, excess, two
    multiplicative-weights rounds with renormalization."""
    from risk_dashboard_database_spark.plans.dedup import (
        _d43_doc_scores,
        d64_doremi_mix,
    )

    src_of = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    per: dict[str, list[int]] = {}  # source -> [docs, toks, score_sum]
    csum = cdocs = 0
    for r in _d43_doc_scores(spark, SF_DIR).collect():
        s = per.setdefault(src_of[r["doc_id"]], [0, 0, 0])
        s[0] += 1
        s[1] += r["n_bigrams"] + 1
        s[2] += r["score"]
        csum += r["score"]
        cdocs += 1
    cmean = csum // cdocs
    ttot = sum(v[1] for v in per.values())
    exp = {}
    for src, (docs, toks, ssum) in per.items():
        mean = ssum // docs
        excess = max(0, cmean - mean)
        w0 = (toks * 1_000_000) // ttot
        exp[src] = [docs, toks, mean, excess, w0]
    s1 = sum((v[4] * (1_000_000 + v[3])) // 1_000_000 for v in exp.values())
    for v in exp.values():
        v.append(((v[4] * (1_000_000 + v[3])) // 1_000_000) * 1_000_000 // s1)
    s2 = sum((v[5] * (1_000_000 + v[3])) // 1_000_000 for v in exp.values())
    for v in exp.values():
        v.append(((v[5] * (1_000_000 + v[3])) // 1_000_000) * 1_000_000 // s2)

    rows = {r["source"]: r for r in d64_doremi_mix(spark, SF_DIR).collect()}
    assert set(rows) == set(exp)
    for src, (docs, toks, mean, excess, w0, w1, w2) in exp.items():
        r = rows[src]
        assert (r["docs"], r["toks"], r["score_mean"]) == (docs, toks, mean)
        assert r["excess_ppm"] == excess
        assert (r["w0_ppm"], r["w1_ppm"], r["w2_ppm"]) == (w0, w1, w2)
    # weights renormalize: each round's ppm column sums to 1e6 minus
    # at most one truncated unit per source
    n = len(exp)
    for col in ("w0_ppm", "w1_ppm", "w2_ppm"):
        tot = sum(r[col] for r in rows.values())
        assert 1_000_000 - n < tot <= 1_000_000
    # the hardest source (max excess) never loses share to the update
    hardest = max(exp, key=lambda s: (exp[s][3], s))
    if exp[hardest][3] > 0:
        assert rows[hardest]["w2_ppm"] >= rows[hardest]["w0_ppm"] - 1


def test_cluster_purity_matches_python(spark):
    """d65 recomputed from the stored trained index in Python:
    per-cell label census, majority argmax with smaller-label
    tie-break, floored-ppm purity."""
    from collections import Counter

    from risk_dashboard_database_spark.plans.dedup import (
        _trained_assigned,
        d65_cluster_purity,
    )

    cells: dict[int, Counter] = {}
    for r in _trained_assigned(spark, SF_DIR).select("cell", "label").collect():
        cells.setdefault(r["cell"], Counter())[r["label"]] += 1
    rows = {r["cell"]: r for r in d65_cluster_purity(spark, SF_DIR).collect()}
    assert set(rows) == set(cells)
    total = 0
    agree = 0
    for cell, cnt in cells.items():
        members = sum(cnt.values())
        top_n = max(cnt.values())
        top_label = min(l for l, c in cnt.items() if c == top_n)
        r = rows[cell]
        assert r["members"] == members
        assert r["n_labels"] == len(cnt)
        assert r["top_label"] == top_label
        assert r["top_n"] == top_n
        assert r["purity_ppm"] == (top_n * 1_000_000) // members
        total += members
        agree += top_n
    # every vector is assigned to exactly one cell
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert total == n_vecs
    # purity is a share: bounded by construction
    for r in rows.values():
        assert 0 < r["purity_ppm"] <= 1_000_000


def test_nprobe_sweep_matches_python_bruteforce(spark):
    """d66 recomputed in Python from the stored trained index +
    codebook: cell ranking by centroid cosine, exact in-cell search
    over the nprobe nearest cells, global exact top-3 truth."""
    import math

    from risk_dashboard_database_spark.plans.dedup import (
        D66_NPROBES,
        IVF_PROBES,
        _trained_assigned,
        _trained_centroids,
        d66_nprobe_sweep,
    )

    cm = {r["cid"]: r["ce"] for r in _trained_centroids(spark, SF_DIR).collect()}
    vec = {}
    cell_of = {}
    for r in _trained_assigned(spark, SF_DIR).select("vec_id", "v", "cell").collect():
        vec[r["vec_id"]] = r["v"]
        cell_of[r["vec_id"]] = r["cell"]

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    import hashlib

    probe_ids = sorted(
        vec, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:IVF_PROBES]

    truth = {}
    for q in probe_ids:
        scored = sorted(
            ((-cos(vec[q], vec[c]), c) for c in vec if c != q)
        )[:3]
        truth[q] = {c for _, c in scored}
    true_k = sum(len(t) for t in truth.values())

    exp = {}
    for np_ in D66_NPROBES:
        n_queries = k_returned = hits = 0
        for q in probe_ids:
            ranked = sorted(cm, key=lambda cid: (-cos(vec[q], cm[cid]), cid))
            cells = set(ranked[:np_])
            cands = [c for c in vec if c != q and cell_of[c] in cells]
            if not cands:
                continue
            top = sorted(((-cos(vec[q], vec[c]), c) for c in cands))[:3]
            n_queries += 1
            k_returned += len(top)
            hits += sum(1 for _, c in top if c in truth[q])
        exp[np_] = (n_queries, k_returned, hits,
                    (hits * 1_000_000) // true_k)

    rows = {r["nprobe"]: r for r in d66_nprobe_sweep(spark, SF_DIR).collect()}
    assert set(rows) == set(D66_NPROBES)
    prev_hits = -1
    for np_ in D66_NPROBES:
        r = rows[np_]
        assert (r["n_queries"], r["k_returned"], r["hits"]) == exp[np_][:3]
        assert r["true_k"] == true_k
        assert r["recall_ppm"] == exp[np_][3]
        # more cells probed can never lose recall
        assert r["hits"] >= prev_hits
        prev_hits = r["hits"]


def test_surge_shipments_matches_python(spark):
    """w13 recomputed in plain Python: day-grain order counts,
    integer 1.2x-mean surge threshold, maximal islands, BETWEEN
    attribution of day-grain lineitem sums."""
    from collections import Counter
    from datetime import timedelta
    from decimal import Decimal

    from risk_dashboard_database_spark.plans.windows import (
        w13_surge_shipments,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    dayo = Counter()
    for r in orders:
        dayo[r["o_orderdate"].date()] += 1
    n_days = len(dayo)
    total = sum(dayo.values())
    hot = sorted(d for d, n in dayo.items() if n * n_days * 10 >= total * 12)
    wins = []
    for d in hot:
        if wins and wins[-1][1] + timedelta(days=1) == d:
            wins[-1][1] = d
        else:
            wins.append([d, d])
    ship = {}
    for r in li:
        d = r["l_shipdate"].date()
        cur = ship.setdefault(d, [0, Decimal(0), Decimal(0)])
        cur[0] += 1
        cur[1] += Decimal(str(r["l_quantity"])).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        cur[2] += Decimal(str(r["l_extendedprice"])).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    exp = {}
    for ws, we in wins:
        items, qty, rev = 0, Decimal(0), Decimal(0)
        d = ws
        while d <= we:
            if d in ship:
                items += ship[d][0]
                qty += ship[d][1]
                rev += ship[d][2]
            d += timedelta(days=1)
        exp[(str(ws), str(we))] = (
            (we - ws).days + 1,
            sum(dayo[x] for x in hot if ws <= x <= we),
            items,
            float(qty),
            float(rev),
        )

    rows = {
        (r["win_start"], r["win_end"]): (
            r["win_days"],
            r["win_orders"],
            r["ship_items"],
            r["ship_qty"],
            r["ship_revenue"],
        )
        for r in w13_surge_shipments(spark, SF_DIR).collect()
    }
    assert rows == exp
    # windows are maximal islands of hot days
    hotset = set(hot)
    for ws, we in wins:
        d = ws
        while d <= we:
            assert d in hotset
            d += timedelta(days=1)
        assert ws - timedelta(days=1) not in hotset
        assert we + timedelta(days=1) not in hotset


def test_shard_pack_matches_python(spark):
    """m7 recomputed in plain Python: per-(source, stream) byte axis
    ordered by doc_id, first-byte-lands shard assignment, overflow
    disclosure; every byte lands in exactly one shard."""
    from risk_dashboard_database_spark.plans.multimodal import (
        M7_SHARD_BYTES,
        M7_STREAMS,
        m7_shard_pack,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    axis: dict[tuple, list] = {}
    for r in sorted(docs, key=lambda r: r["doc_id"]):
        axis.setdefault(
            (r["source"], r["doc_id"] % M7_STREAMS), []
        ).append(len((r["text"] or "").encode("utf-8")))
    exp: dict[tuple, list] = {}
    for (src, stream), sizes in axis.items():
        cum = 0
        for b in sizes:
            shard = cum // M7_SHARD_BYTES
            cur = exp.setdefault((src, stream, shard), [0, 0])
            cur[0] += 1
            cur[1] += b
            cum += b
    rows = {
        (r["source"], r["stream"], r["shard"]): r
        for r in m7_shard_pack(spark, SF_DIR).collect()
    }
    assert set(rows) == set(exp)
    total_bytes = 0
    for key, (items, byts) in exp.items():
        r = rows[key]
        assert r["n_items"] == items
        assert r["payload_bytes"] == byts
        assert r["fill_ppm"] == (byts * 1_000_000) // M7_SHARD_BYTES
        assert r["over_budget"] == (1 if byts > M7_SHARD_BYTES else 0)
        total_bytes += byts
    # conservation: every payload byte is in exactly one shard
    assert total_bytes == sum(sum(s) for s in axis.values())
    # shards are dense per stream: ids 0..max with no gaps only where
    # a single item spans multiple budgets — then intermediate ids are
    # legitimately absent; check at least shard 0 exists per stream
    for src, stream in axis:
        assert (src, stream, 0) in exp


def test_k_anonymity_matches_python(spark):
    """t_k_anonymity recomputed in plain Python: equivalence classes
    over (lang, source, n_chars bucket), at-risk accounting."""
    from collections import Counter

    from risk_dashboard_database_spark.plans.textstats import (
        K_ANON,
        K_ANON_LEN_BUCKET,
        t_k_anonymity,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    cls = Counter(
        (r["lang"], r["source"], r["n_chars"] // K_ANON_LEN_BUCKET)
        for r in docs
    )
    exp: dict[tuple, list] = {}
    for (lang, src, _), c in cls.items():
        cur = exp.setdefault((lang, src), [0, 0, None, 0])
        cur[0] += c
        cur[1] += 1
        cur[2] = c if cur[2] is None else min(cur[2], c)
        if c < K_ANON:
            cur[3] += c
    rows = {
        (r["lang"], r["source"]): r for r in t_k_anonymity(spark, SF_DIR).collect()
    }
    assert set(rows) == set(exp)
    for key, (n, ncls, mn, risk) in exp.items():
        r = rows[key]
        assert r["n_rows"] == n
        assert r["n_classes"] == ncls
        assert r["min_class_size"] == mn
        assert r["at_risk_rows"] == risk
        assert r["at_risk_ppm"] == (risk * 1_000_000) // n
    # conservation: slice rows sum to the corpus
    assert sum(v[0] for v in exp.values()) == len(docs)


def test_filter_agreement_matches_python(spark):
    """d67 recomputed in plain Python off the two parent relations:
    per-lang top-half LM cut, 2x2 census, ppm agreement columns."""
    from risk_dashboard_database_spark.plans.dedup import (
        _d43_doc_scores,
        d67_filter_agreement,
    )
    from risk_dashboard_database_spark.plans.textstats import t_quality_score

    hpass = {
        r["doc_id"]: 1 if r["quality_score"] >= 2 else 0
        for r in t_quality_score(spark, SF_DIR).collect()
    }
    scored = [
        (r["doc_id"], r["lang"], r["score"])
        for r in _d43_doc_scores(spark, SF_DIR).collect()
    ]
    dom: dict[str, dict[int, int]] = {}
    for _, lang, score in scored:
        dom.setdefault(lang, {})[score] = dom.get(lang, {}).get(score, 0) + 1
    cut = {}
    for lang, d in dom.items():
        total = sum(d.values())
        cum = 0
        for score in sorted(d, reverse=True):
            cum += d[score]
            if cum * 2 >= total:
                cut[lang] = score
                break
    exp: dict[str, list[int]] = {}
    for doc_id, lang, score in scored:
        h = hpass[doc_id]
        l = 1 if score >= cut[lang] else 0
        c = exp.setdefault(lang, [0, 0, 0, 0, 0])
        c[0] += 1
        c[1 + (1 - h) * 2 + (1 - l)] += 1  # [n, both, heur_only, lm_only, neither]
    rows = {r["lang"]: r for r in d67_filter_agreement(spark, SF_DIR).collect()}
    assert set(rows) == set(exp)
    for lang, (n, both, honly, lonly, neither) in exp.items():
        r = rows[lang]
        assert r["cut_score"] == cut[lang]
        assert (r["n_docs"], r["both_pass"], r["heur_only"]) == (n, both, honly)
        assert (r["lm_only"], r["neither"]) == (lonly, neither)
        assert r["agree_ppm"] == ((both + neither) * 1_000_000) // n
        pe = (
            (((both + honly) * 1_000_000) // n)
            * (((both + lonly) * 1_000_000) // n)
        ) // 1_000_000 + (
            (((lonly + neither) * 1_000_000) // n)
            * (((honly + neither) * 1_000_000) // n)
        ) // 1_000_000
        assert r["expected_agree_ppm"] == pe
        # the LM cut is the top-half boundary: at least half the
        # scored docs sit at or above it
        at_or_above = both + lonly
        assert at_or_above * 2 >= n
    # conservation: every scored doc lands in exactly one cell
    assert sum(v[0] for v in exp.values()) == len(scored)


def test_d67_oracle_stopwords_track_textstats(spark):
    """d67's oracle inlines the en stopword fragment (its f-string
    can't call the helper); this pins the inlined text to the
    canonical _stop_count_sql('en') so the two can never drift."""
    from risk_dashboard_database_spark.plans.registry import ORACLES
    from risk_dashboard_database_spark.plans.textstats import _stop_count_sql

    assert _stop_count_sql("en") in ORACLES["d67_filter_agreement"]


def test_table_profile_matches_python(spark):
    """s_table_profile recomputed in plain Python over the parquet
    rows: nulls + exact distinct per column."""
    from risk_dashboard_database_spark.plans.sources_q import (
        _PROFILE_COLS,
        s_table_profile,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    rows = {r["column_name"]: r for r in s_table_profile(spark, SF_DIR).collect()}
    assert set(rows) == set(_PROFILE_COLS)
    for c in _PROFILE_COLS:
        vals = [r[c] for r in li]
        r = rows[c]
        assert r["n_rows"] == len(li)
        assert r["n_nulls"] == sum(1 for v in vals if v is None)
        assert r["ndv"] == len({v for v in vals if v is not None})


def test_ohlc_resample_matches_python(spark):
    """w14 recomputed in plain Python: per (user, day) time-ordered
    open/close with event_id tiebreak, exact high/low, decimal sum."""
    from collections import defaultdict
    from decimal import Decimal

    from risk_dashboard_database_spark.plans.windows import (
        w14_ohlc_resample,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    buckets = defaultdict(list)
    for r in ev:
        buckets[(r["user_id"], str(r["ts"].date()))].append(
            (r["ts"], r["event_id"], r["value"])
        )
    rows = {
        (r["user_id"], r["date"]): r
        for r in w14_ohlc_resample(spark, SF_DIR).collect()
    }
    assert set(rows) == set(buckets)
    for key, obs in buckets.items():
        obs.sort()
        vals = [v for _, _, v in obs]
        r = rows[key]
        assert r["open"] == obs[0][2]
        assert r["close"] == obs[-1][2]
        assert r["high"] == max(vals)
        assert r["low"] == min(vals)
        assert r["volume"] == len(obs)
        want_sum = sum(
            (Decimal(str(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP) for v in vals),
            Decimal(0),
        )
        assert r["value_sum"] == float(want_sum)
        # candlestick invariants
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]


def test_lsh_design_matches_python(spark):
    """d68 recomputed in plain Python with the same left-fold
    multiplication chains; S-curve monotonicity invariants."""
    from risk_dashboard_database_spark.plans.dedup import (
        D68_BANDS,
        D68_ROWS,
        D68_S_PPM,
        N_BANDS,
        ROWS_PER_BAND,
        d68_lsh_design,
    )

    def chain(x, n):
        acc = x
        for _ in range(n - 1):
            acc = acc * x
        return acc

    rows = {
        (r["bands"], r["rows_per_band"], r["s_ppm"]): r
        for r in d68_lsh_design(spark, SF_DIR).collect()
    }
    assert len(rows) == len(D68_BANDS) * len(D68_ROWS) * len(D68_S_PPM)
    for b in D68_BANDS:
        for rr in D68_ROWS:
            for s in D68_S_PPM:
                row = rows[(b, rr, s)]
                p = float(s) / 1_000_000.0
                want = 1.0 - chain(1.0 - chain(p, rr), b)
                assert row["detect_prob"] == want
                assert row["n_hashes"] == b * rr
                assert row["deployed"] == (
                    1 if (b, rr) == (N_BANDS, ROWS_PER_BAND) else 0
                )
    # S-curve laws: P rises with s (fixed b,r) and with b (fixed r,s)
    for b in D68_BANDS:
        for rr in D68_ROWS:
            ps = [rows[(b, rr, s)]["detect_prob"] for s in D68_S_PPM]
            assert ps == sorted(ps)
    for rr in D68_ROWS:
        for s in D68_S_PPM:
            pb = [rows[(b, rr, s)]["detect_prob"] for b in D68_BANDS]
            assert pb == sorted(pb)


def test_rollup_totals_matches_python(spark):
    """a17 recomputed in plain Python at all three grains; grand
    total reconciles with the raw row count."""
    from collections import defaultdict
    from decimal import Decimal

    from risk_dashboard_database_spark.plans.aggregates import (
        a17_rollup_totals,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cells = defaultdict(lambda: [0, Decimal(0)])
    for r in ev:
        v = Decimal(str(r["value"])).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        for key in (
            (r["event_type"], r["user_id"] % 4, 0),
            (r["event_type"], None, 1),
            (None, None, 3),
        ):
            cells[key][0] += 1
            cells[key][1] += v
    rows = {
        (r["event_type"], r["cohort"], r["lvl"]): r
        for r in a17_rollup_totals(spark, SF_DIR).collect()
    }
    assert set(rows) == set(cells)
    for key, (n, s) in cells.items():
        assert rows[key]["n_events"] == n
        assert rows[key]["value_sum"] == float(s)
    assert rows[(None, None, 3)]["n_events"] == len(ev)


def test_segment_set_ops_matches_python(spark):
    """u5 recomputed with Python sets; segments are disjoint and
    cover exactly the purchase/error key universe."""
    from risk_dashboard_database_spark.plans.unions import (
        u5_segment_set_ops,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    purch = {r["user_id"] for r in ev if r["event_type"] == "purchase"}
    err = {r["user_id"] for r in ev if r["event_type"] == "error"}
    want = {
        ("purchase_only", u) for u in purch - err
    } | {("both", u) for u in purch & err} | {
        ("error_only", u) for u in err - purch
    }
    got = {
        (r["segment"], r["user_id"])
        for r in u5_segment_set_ops(spark, SF_DIR).collect()
    }
    assert got == want
    # disjoint cover of the active key universe
    by_user = defaultdict(list)
    for seg, u in got:
        by_user[u].append(seg)
    assert all(len(v) == 1 for v in by_user.values())
    assert set(by_user) == purch | err



def test_pivot_matrix_matches_python(spark):
    """a18 recomputed in plain Python: per-user per-type counts +
    decimal sums, absent cells zero."""
    from decimal import Decimal

    from risk_dashboard_database_spark.plans.aggregates import (
        A18_TYPES,
        a18_pivot_matrix,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    exp: dict[int, dict[str, list]] = {}
    for r in ev:
        cell = exp.setdefault(r["user_id"], {}).setdefault(
            r["event_type"], [0, Decimal(0)]
        )
        cell[0] += 1
        cell[1] += Decimal(str(r["value"])).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    rows = {r["user_id"]: r for r in a18_pivot_matrix(spark, SF_DIR).collect()}
    assert set(rows) == set(exp)
    total = 0
    for uid, by_type in exp.items():
        r = rows[uid]
        for t in A18_TYPES:
            n, s = by_type.get(t, (0, Decimal(0)))
            assert r[f"{t}_n"] == n
            assert r[f"{t}_value"] == float(s)
            total += n
    assert total == len(ev)  # the wide matrix loses no events


def test_purchase_attribution_matches_python(spark):
    """j12 recomputed with a python double loop (the oracle's naive
    form); window-bound and same-user invariants."""
    from datetime import timedelta

    from risk_dashboard_database_spark.plans.joins import (
        J12_ATTRIB_DAYS,
        j12_purchase_attribution,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    by_id = {r["event_id"]: r for r in ev}
    want = set()
    for p in ev:
        if p["event_type"] != "purchase":
            continue
        for s in ev:
            if s["event_type"] != "signup" or s["user_id"] != p["user_id"]:
                continue
            if s["ts"] <= p["ts"] <= s["ts"] + timedelta(days=J12_ATTRIB_DAYS):
                want.add((p["event_id"], s["event_id"]))
    rows = j12_purchase_attribution(spark, SF_DIR).collect()
    got = {(r["purchase_id"], r["signup_id"]) for r in rows}
    assert got == want
    for r in rows:
        p, s = by_id[r["purchase_id"]], by_id[r["signup_id"]]
        assert p["user_id"] == s["user_id"] == r["user_id"]
        assert r["purchase_value"] == p["value"]
        delta = p["ts"] - s["ts"]
        assert timedelta(0) <= delta <= timedelta(days=J12_ATTRIB_DAYS)
