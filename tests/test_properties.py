"""Property-based tests (hypothesis): URL normalization laws,
chain_active equivalence with the reference recurrence on random
fixtures, and MinHash containment behavior."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from risk_dashboard_database_spark.functions.urls import normalize_url
from risk_dashboard_database_spark.operators.sessionize import chain_active

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_host = st.from_regex(r"[a-z]{1,8}\.(com|org|io)", fullmatch=True)
_path = st.from_regex(r"(/[a-z0-9]{0,6}){0,3}", fullmatch=True)
_qkey = st.from_regex(r"[a-z]{1,5}", fullmatch=True)
_qval = st.from_regex(r"[a-z0-9]{0,4}", fullmatch=True)


@st.composite
def _urls(draw):
    host = draw(_host)
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    path = draw(_path)
    pairs = draw(st.lists(st.tuples(_qkey, _qval), max_size=4))
    tracking = draw(st.sampled_from(["", "utm_source=x", "gclid=1", "gaa_ts=9"]))
    q = "&".join(
        [f"{k}={v}" for k, v in pairs] + ([tracking] if tracking else [])
    )
    frag = draw(st.sampled_from(["", "#frag"]))
    return f"https://{www}{host}{path}" + (f"?{q}" if q else "") + frag


@_slow
@given(st.lists(_urls(), min_size=1, max_size=8))
def test_normalize_idempotent_and_clean(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [r["n"] for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [r["n"] for r in df2.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert once == twice
    for n in once:
        assert "#" not in n
        assert "utm_" not in n and "gclid" not in n and "gaa_" not in n
        assert "//" not in n.split("://", 1)[1]
        assert not n.split("://", 1)[1].startswith("www.")


@st.composite
def _user_days(draw):
    rows = []
    for u in range(draw(st.integers(1, 3))):
        day = dt.date(2024, 1, 1)
        for _ in range(draw(st.integers(1, 12))):
            day += dt.timedelta(days=draw(st.integers(1, 3)))  # gaps of 1-3
            errors = draw(st.integers(0, 4))
            total = draw(st.integers(1, 6))
            rows.append((u, day, errors, total))
    return rows


def _reference(rows):
    out = {}
    by_user: dict = {}
    for r in sorted(rows, key=lambda r: (r[0], r[1])):
        by_user.setdefault(r[0], []).append(r)
    for urows in by_user.values():
        prev_date, prev_active = None, False
        for (u, date, errors, total) in urows:
            gate, trig = total >= 2, errors >= 3
            cont = errors >= 1 and errors / total >= 0.2
            carried = prev_active and prev_date and (date - prev_date).days == 1
            active = gate and (trig or (cont and carried))
            out[(u, date)] = active
            prev_date, prev_active = date, active
    return out


@st.composite
def _asof_fixture(draw):
    builds = draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 99)),
            min_size=0, max_size=12, unique=True,
        )
    )
    probes = draw(
        st.lists(
            st.tuples(st.integers(0, 2), st.integers(0, 50)),
            min_size=1, max_size=8,
        )
    )
    return builds, probes


@_slow
@given(_asof_fixture())
def test_asof_join_matches_bruteforce(spark, fixture):
    from risk_dashboard_database_spark.operators.joins import asof_join

    builds, probes = fixture
    base = dt.datetime(2024, 1, 1)
    bdf = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=t), i) for k, t, i in builds],
        "k int, bts timestamp, bid int",
    )
    pdf = spark.createDataFrame(
        [(k, base + dt.timedelta(minutes=t), j) for j, (k, t) in enumerate(probes)],
        "k int, ts timestamp, pid int",
    )
    out = {
        r["pid"]: r["bid"]
        for r in asof_join(
            pdf, bdf, on="k", probe_time="ts", build_time="bts",
            build_cols=["bid"], tiebreak="bid",
        ).collect()
    }
    # brute-force reference: max (t, bid) at-or-before the probe
    for j, (k, t) in enumerate(probes):
        eligible = [(bt, bid) for bk, bt, bid in builds if bk == k and bt <= t]
        expected = max(eligible)[1] if eligible else None
        assert out[j] == expected, (j, k, t, eligible)


@_slow
@given(_user_days())
def test_chain_active_matches_reference_recurrence(spark, rows):
    df = spark.createDataFrame(rows, "user_id int, date date, errors int, total int")
    got = {
        (r["user_id"], r["date"]): r["active"]
        for r in chain_active(
            df,
            ["user_id"],
            "date",
            trig=F.col("errors") >= 3,
            cont=(F.col("errors") >= 1)
            & (F.col("errors") / F.col("total") >= 0.2),
            gate=F.col("total") >= 2,
        ).collect()
    }
    assert got == _reference(rows)


# ---------------------------------------------------------------- f4
# Cross-engine sentiment parity: the Python scorer and the generated
# DuckDB SQL must agree on the exact integer score for ARBITRARY token
# streams (the invariant the f4 oracle depends on).
_sent_word = st.sampled_from(
    ["good", "bad", "very", "not", "the", "crash", "fast", "slow", "Good",
     "BAD!", '"great"', "zzz", "layoffs", "hardly", "really", ""]
)


@given(st.lists(_sent_word, min_size=0, max_size=12))
@settings(max_examples=40, deadline=None)
def test_sentiment_python_matches_duckdb(words):
    import duckdb

    from risk_dashboard_database_spark.functions import sentiment as S

    text = " ".join(words)
    con = duckdb.connect()
    expr = S.oracle_sql_expr("?::VARCHAR")
    # bind the text as a parameter inside the generated expression
    got_sql = con.execute(f"SELECT {expr}", [text]).fetchone()[0]
    assert int(got_sql) == S.score_1e5(text)


# --------------------------------------------------------------- d12
# Packing conservation: every document's tokens land in a contiguous
# [start, end] sequence range; per shard, cumulative offsets never
# overlap and total packed tokens equal the sum of document tokens.
@given(st.lists(st.integers(min_value=1, max_value=900), min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_token_pack_conservation(token_counts):
    BUDGET = 512
    cum = 0
    prev_end_pos = -1
    for n in token_counts:  # one shard, doc_id order
        start_seq, start_off = divmod(cum, BUDGET)
        end_pos = cum + n - 1
        end_seq = end_pos // BUDGET
        assert end_seq >= start_seq
        assert cum > prev_end_pos  # contiguous, never overlapping
        prev_end_pos = end_pos
        cum += n
    assert cum == sum(token_counts)


# ---------------------------------------------------------------- o7
def _fuzzy_spec(probes, candidates):
    """Independent pure-Python spec of fuzzy_resolve (the reference
    semantics, `app.py:1097-1161,1204-1217`): >=0.72 suggestion cutoff,
    (-score, candidate) order, top 5, resolve iff best >= 0.84 and
    margin >= 0.01."""
    from difflib import SequenceMatcher

    out = []
    for pid, pname in probes:
        scored = sorted(
            (
                (c, SequenceMatcher(None, pname.lower(), c.lower()).ratio())
                for c in candidates
            ),
            key=lambda t: (-t[1], t[0]),
        )
        top = [(c, s) for c, s in scored if s >= 0.72][:5]
        if not top:
            continue
        best = top[0][1]
        runner = top[1][1] if len(top) > 1 else None
        for rank, (c, s) in enumerate(top, 1):
            resolved = int(
                rank == 1 and best >= 0.84 and (runner is None or best - runner >= 0.01)
            )
            out.append((pid, c, round(s, 6), rank, resolved))
    return sorted(out)


_word = st.from_regex(r"[a-z]{2,7}", fullmatch=True)
_name = st.builds(" ".join, st.lists(_word, min_size=1, max_size=4))


@_slow
@given(
    cands=st.lists(_name, min_size=1, max_size=8, unique=True),
    probes=st.lists(_name, min_size=1, max_size=4, unique=True),
)
def test_fuzzy_resolve_matches_python_spec(spark, cands, probes):
    from risk_dashboard_database_spark.plans.toporder import fuzzy_resolve

    p = spark.createDataFrame(
        list(enumerate(probes)), "probe_id int, probe_name string"
    )
    c = spark.createDataFrame([(x,) for x in cands], "candidate string")
    got = sorted(
        (r.probe_id, r.candidate, r.score, r.rank, r.resolved)
        for r in fuzzy_resolve(p, c).collect()
    )
    assert got == _fuzzy_spec(list(enumerate(probes)), cands)


# ---------------------------------------------------------------- r6
# Repetition-stats parity: the O(len) sorted-run fold used by
# t_repetition must equal a brute-force Python mode count for
# arbitrary token streams (including empty / single-token docs).
_rep_word = st.sampled_from(["a", "b", "c", "spam", "the", ""])


@given(st.lists(_rep_word, min_size=0, max_size=14))
@settings(max_examples=25, deadline=None)
def test_repetition_fold_matches_bruteforce(spark, words):
    from collections import Counter

    text = " ".join(words)
    toks = text.split(" ")
    bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    expect = (
        len(bigrams),
        len(set(bigrams)),
        max(Counter(bigrams).values()) if bigrams else 0,
    )

    row = (
        spark.createDataFrame([(text,)], "text string")
        .selectExpr(
            "split(text, ' ') AS __w"
        )
        .selectExpr(
            "zip_with(slice(__w, 1, greatest(size(__w) - 1, 0)),"
            "         slice(__w, 2, greatest(size(__w) - 1, 0)),"
            "         (a, b) -> concat(a, ' ', b)) AS bigrams"
        )
        .selectExpr(
            "size(bigrams) AS n",
            "size(array_distinct(bigrams)) AS nd",
            "aggregate(array_sort(bigrams),"
            " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
            " (acc, x) -> named_struct("
            "   'prev', x,"
            "   'run', IF(x <=> acc.prev, acc.run + 1, 1),"
            "   'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1, 1))),"
            " acc -> acc.best) AS top",
        )
        .first()
    )
    assert (row.n, row.nd, row.top) == expect


# ---------------------------------------------------------------- r7
# PII regex cross-dialect parity: t_pii_redact's patterns must mean
# the same thing to Java regex (Spark) and Python re — counts AND the
# globally-redacted string. Texts mix plausible PII shapes with
# near-misses (no TLD, 3-digit phones, doubled @) so boundary
# semantics (\b, {2,}) are actually exercised.
_pii_frag = st.sampled_from(
    [
        "hello world",
        "a.b@c.io",
        "x@y",                      # near-miss: TLD too short for {2,}
        "user_1%x@mail.test.org",
        "call 555-0199 now",
        "x555-0199",                # \b boundary: digit-adjacent prefix
        "555-019",                  # near-miss: 3-digit suffix
        "555-01999",                # 5 digits: \b after 4th digit fails
        "a@@b.com",
        "end.",
        "",
    ]
)


@given(st.lists(_pii_frag, min_size=0, max_size=6))
@settings(max_examples=25, deadline=None)
def test_pii_regexes_match_python_re(spark, frags):
    import re

    from pyspark.sql import functions as F

    from risk_dashboard_database_spark.plans.textstats import (
        _PII_EMAIL_RE,
        _PII_PHONE_RE,
    )

    text = " ".join(frags)
    expect_emails = len(re.findall(_PII_EMAIL_RE, text))
    expect_phones = len(re.findall(_PII_PHONE_RE, text))
    expect_red = re.sub(
        _PII_PHONE_RE, "[PHONE]", re.sub(_PII_EMAIL_RE, "[EMAIL]", text)
    )
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            F.regexp_count("text", F.lit(_PII_EMAIL_RE)).alias("e"),
            F.regexp_count("text", F.lit(_PII_PHONE_RE)).alias("p"),
            F.regexp_replace(
                F.regexp_replace("text", _PII_EMAIL_RE, "[EMAIL]"),
                _PII_PHONE_RE,
                "[PHONE]",
            ).alias("red"),
        )
        .collect()[0]
    )
    assert (row["e"], row["p"], row["red"]) == (
        expect_emails,
        expect_phones,
        expect_red,
    ), text


# ----------------------------------------------------- span dedup laws
# The d30 coverage fold (interval union over sorted duplicated starts,
# JVM-side) and d57's position-filter rebuild are the subtlest
# expressions in the span family; pin them against a brute-force
# position-set recomputation on RANDOM corpora. A tiny vocabulary
# forces heavy cross-document 8-gram sharing, so the interval-merge
# paths (overlap, adjacency, containment, full coverage) all exercise.

_span_doc = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=1, max_size=24
).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.lists(_span_doc, min_size=2, max_size=8))
def test_span_dedup_and_strip_match_bruteforce(spark, tmp_path_factory, texts):
    import hashlib
    import uuid

    from risk_dashboard_database_spark.plans.dedup import (
        SPAN_L,
        d30_span_dedup,
        d57_span_strip,
    )

    sf_dir = str(tmp_path_factory.mktemp("spanprop") / uuid.uuid4().hex)
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(sf_dir, exist_ok=True)
    # single parquet FILE (the testdata layout the loaders expect)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["synth"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        f"{sf_dir}/documents.parquet",
    )

    # brute force: gram -> set(docs); covered positions per doc
    grams: dict[str, set] = {}
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    for i, tk in toks.items():
        for s in range(0, max(len(tk) - SPAN_L + 1, 0)):
            g = hashlib.md5(" ".join(tk[s : s + SPAN_L]).encode()).hexdigest()
            grams.setdefault(g, set()).add(i)
    covered = {}
    for i, tk in toks.items():
        pos = set()
        for s in range(0, max(len(tk) - SPAN_L + 1, 0)):
            g = hashlib.md5(" ".join(tk[s : s + SPAN_L]).encode()).hexdigest()
            if len(grams[g]) >= 2:
                pos.update(range(s, s + SPAN_L))
        covered[i] = pos

    got30 = {r["doc_id"]: r for r in d30_span_dedup(spark, sf_dir).collect()}
    got57 = {r["doc_id"]: r for r in d57_span_strip(spark, sf_dir).collect()}
    assert set(got30) == set(got57) == set(toks)
    for i, tk in toks.items():
        assert got30[i]["covered_tokens"] == len(covered[i]), (i, texts)
        assert got57[i]["removed_tokens"] == len(covered[i])
        want_clean = " ".join(
            w for p, w in enumerate(tk) if p not in covered[i]
        )
        assert got57[i]["clean_text"] == want_clean


# ---------------------------------------------------------------------------
# r10 conventions on RANDOM corpora: the span-strip removal and the
# burstiness fold are pinned end-to-end against plain-Python references
# over hypothesis-generated documents (tiny vocab => spans genuinely
# repeat across docs), not just the fixed synthetic corpus.

_tok = st.sampled_from([f"w{i}" for i in range(6)])


@st.composite
def _span_corpus(draw):
    docs = []
    n_docs = draw(st.integers(3, 7))
    for d in range(n_docs):
        toks = draw(st.lists(_tok, min_size=0, max_size=24))
        docs.append((d, " ".join(toks)))
    return docs


def _write_docs(tmpdir, docs):
    import pandas as pd

    pd.DataFrame(
        [
            {
                "doc_id": d,
                "text": t,
                "lang": "en",
                "source": f"src{d % 3}",
                "n_chars": len(t),
            }
            for d, t in docs
        ]
    ).to_parquet(f"{tmpdir}/documents.parquet")


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_span_corpus())
def test_span_strip_matches_python_on_random_corpora(spark, tmp_path_factory, docs):
    """Batch d57 vs a from-scratch Python implementation of the
    convention (SPAN_L-gram shared across >= 2 docs => every covered
    position of every instance stripped) on random small-vocab docs."""
    from risk_dashboard_database_spark.plans.dedup import (
        SPAN_L,
        d57_span_strip,
    )

    tmpdir = tmp_path_factory.mktemp("spanprop")
    _write_docs(tmpdir, docs)

    grams: dict[str, set] = {}
    toks = {d: (t.split(" ") if t else [""]) for d, t in docs}
    for d, tk in toks.items():
        for s in range(max(len(tk) - SPAN_L + 1, 0)):
            g = " ".join(tk[s : s + SPAN_L])
            grams.setdefault(g, set()).add(d)
    shared = {g for g, ds in grams.items() if len(ds) >= 2}
    want = {}
    for d, tk in toks.items():
        starts = [
            s
            for s in range(max(len(tk) - SPAN_L + 1, 0))
            if " ".join(tk[s : s + SPAN_L]) in shared
        ]
        keep = [
            t
            for p, t in enumerate(tk)
            if not any(s <= p < s + SPAN_L for s in starts)
        ]
        want[d] = (len(tk), len(keep), " ".join(keep))
    got = {
        r["doc_id"]: (r["n_tokens"], r["kept_tokens"], r["clean_text"])
        for r in d57_span_strip(spark, str(tmpdir)).collect()
    }
    assert got == want


@st.composite
def _punct_corpus(draw):
    docs = []
    for d in range(draw(st.integers(2, 5))):
        pieces = draw(
            st.lists(
                st.one_of(_tok, st.sampled_from([".", "!", "?", "..", "!?"])),
                min_size=0,
                max_size=20,
            )
        )
        docs.append((d, " ".join(pieces)))
    return docs


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_punct_corpus())
def test_burstiness_matches_python_on_random_punctuated_docs(
    spark, tmp_path_factory, docs
):
    """t_burstiness(plant=False) vs the Python Fano-factor reference on
    random docs that DO carry punctuation (incl. standalone marks,
    empty fragments, multi-punct runs)."""
    import re

    from risk_dashboard_database_spark.plans.textstats import t_burstiness

    tmpdir = tmp_path_factory.mktemp("burstprop")
    _write_docs(tmpdir, docs)

    want = {}
    for d, text in docs:
        ss = [s.strip() for s in re.split(r"[.!?]+", text)]
        ls = [len(s.split(" ")) for s in ss if s]
        n, s1, s2 = len(ls), sum(ls), sum(x * x for x in ls)
        mean = (s1 * 1_000_000) // n if n else 0
        burst = (
            ((n * s2 - s1 * s1) * 1_000_000) // (n * s1) if n and s1 else 0
        )
        want[d] = (n, mean, burst)
    got = {
        r["doc_id"]: (r["n_sentences"], r["mean_len_ppm"], r["burst_ppm"])
        for r in t_burstiness(spark, str(tmpdir), plant=False).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_span_corpus())
def test_novelty_matches_python_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """Batch t_novelty vs a from-scratch Python implementation of the
    first-occurrence convention on random small-vocab docs (tiny vocab
    => trigrams genuinely recur across docs, exercising both the novel
    and the seen path; short/empty docs exercise the union branch)."""
    from risk_dashboard_database_spark.plans.textstats import t_novelty

    tmpdir = tmp_path_factory.mktemp("novprop")
    _write_docs(tmpdir, docs)

    def tri(text):
        tk = text.split(" ")
        return {
            " ".join(tk[i : i + 3]) for i in range(len(tk) - 2)
        } if len(tk) >= 3 else set()

    first: dict[str, int] = {}
    for d, t in sorted(docs):
        for g in tri(t):
            first.setdefault(g, d)
    want = {}
    for d, t in docs:
        gs = tri(t)
        novel = sum(1 for g in gs if first[g] == d)
        want[d] = (
            len(gs),
            novel,
            (novel * 1_000_000) // len(gs) if gs else 0,
        )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novel_ppm"])
        for r in t_novelty(spark, str(tmpdir)).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_span_corpus())
def test_budget_threshold_matches_python_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """d63 vs a from-scratch Python bigram-LM + value-grain budget
    fill on random small-vocab docs — re-derives the scores (not the
    stored MV) so the whole chain is pinned, including langs whose top
    bucket exceeds the budget (NULL-cut sentinel)."""
    from risk_dashboard_database_spark.plans.dedup import (
        D63_BUDGET_PPM,
        LM_PPM,
        d63_budget_threshold,
    )

    tmpdir = tmp_path_factory.mktemp("budgetprop")
    _write_docs(tmpdir, docs)

    c2: dict[tuple[str, str], int] = {}
    per_doc = {}
    for d, t in docs:
        tk = t.split(" ") if t else [""]
        if len(tk) < 2:
            continue
        bgs = list(zip(tk, tk[1:]))
        per_doc[d] = bgs
        for bg in bgs:
            c2[bg] = c2.get(bg, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
    dom: dict[int, list[int]] = {}
    for d, bgs in per_doc.items():
        score = sum((c2[bg] * LM_PPM) // c1[bg[0]] for bg in bgs) // len(bgs)
        cur = dom.setdefault(score, [0, 0])
        cur[0] += 1
        cur[1] += len(bgs) + 1
    got = {r["lang"]: r for r in d63_budget_threshold(spark, str(tmpdir)).collect()}
    if not dom:
        assert got == {}
        return
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
    r = got["en"]
    assert r["cut_score"] == cut
    assert r["docs_kept"] == docs_kept
    assert r["tokens_kept"] == tokens_kept
    assert r["budget_tokens"] == budget
    assert r["fill_ppm"] == (
        (tokens_kept * 1_000_000) // budget if budget else 0
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_span_corpus())
def test_doremi_mix_matches_python_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """d64 vs a from-scratch Python bigram-LM + multiplicative-weights
    chain on random small-vocab docs (sources src0/src1/src2 by
    doc_id mod 3) — re-derives the scores rather than trusting the
    stored MV, so the whole reweighting law is pinned end-to-end."""
    from risk_dashboard_database_spark.plans.dedup import (
        LM_PPM,
        d64_doremi_mix,
    )

    tmpdir = tmp_path_factory.mktemp("doremiprop")
    _write_docs(tmpdir, docs)

    c2: dict[tuple[str, str], int] = {}
    per_doc = {}
    for d, t in docs:
        tk = t.split(" ") if t else [""]
        if len(tk) < 2:
            continue
        bgs = list(zip(tk, tk[1:]))
        per_doc[d] = bgs
        for bg in bgs:
            c2[bg] = c2.get(bg, 0) + 1
    c1: dict[str, int] = {}
    for (w1, _), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c

    per: dict[str, list[int]] = {}
    csum = cdocs = 0
    for d, bgs in per_doc.items():
        score = sum((c2[bg] * LM_PPM) // c1[bg[0]] for bg in bgs) // len(bgs)
        s = per.setdefault(f"src{d % 3}", [0, 0, 0])
        s[0] += 1
        s[1] += len(bgs) + 1
        s[2] += score
        csum += score
        cdocs += 1

    got = {r["source"]: r for r in d64_doremi_mix(spark, str(tmpdir)).collect()}
    if not per:
        assert got == {}
        return
    cmean = csum // cdocs
    ttot = sum(v[1] for v in per.values())
    exp = {
        src: [
            docs_n,
            toks,
            ssum // docs_n,
            max(0, cmean - ssum // docs_n),
            (toks * 1_000_000) // ttot,
        ]
        for src, (docs_n, toks, ssum) in per.items()
    }
    s1 = sum((v[4] * (1_000_000 + v[3])) // 1_000_000 for v in exp.values())
    for v in exp.values():
        v.append(((v[4] * (1_000_000 + v[3])) // 1_000_000) * 1_000_000 // s1)
    s2 = sum((v[5] * (1_000_000 + v[3])) // 1_000_000 for v in exp.values())
    for v in exp.values():
        v.append(((v[5] * (1_000_000 + v[3])) // 1_000_000) * 1_000_000 // s2)
    assert set(got) == set(exp)
    for src, (docs_n, toks, mean, ex, w0, w1, w2) in exp.items():
        r = got[src]
        assert (r["docs"], r["toks"], r["score_mean"]) == (docs_n, toks, mean)
        assert (r["excess_ppm"], r["w0_ppm"], r["w1_ppm"], r["w2_ppm"]) == (
            ex,
            w0,
            w1,
            w2,
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(_span_corpus())
def test_shard_pack_matches_python_on_random_corpora(
    spark, tmp_path_factory, docs
):
    """m7 vs a from-scratch Python packer on random docs (including
    empty texts and, via tiny budgets at this corpus size, shards a
    single item overflows): first-byte-lands assignment, byte
    conservation, overflow disclosure."""
    from risk_dashboard_database_spark.plans.multimodal import (
        M7_SHARD_BYTES,
        M7_STREAMS,
        m7_shard_pack,
    )

    tmpdir = tmp_path_factory.mktemp("shardprop")
    _write_docs(tmpdir, docs)

    axis: dict[tuple, list] = {}
    for d, t in sorted(docs):
        axis.setdefault((f"src{d % 3}", d % M7_STREAMS), []).append(
            len(t.encode("utf-8"))
        )
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
        for r in m7_shard_pack(spark, str(tmpdir)).collect()
    }
    assert set(rows) == set(exp)
    for key, (items, byts) in exp.items():
        r = rows[key]
        assert (r["n_items"], r["payload_bytes"]) == (items, byts)
        assert r["over_budget"] == (1 if byts > M7_SHARD_BYTES else 0)
    assert sum(r["payload_bytes"] for r in rows.values()) == sum(
        sum(s) for s in axis.values()
    )
