"""Round-12 operators: j12 skew guard + j12b disclosure card —
python brute-force parity and a zipf feed that must trip the guard."""

from __future__ import annotations

import datetime as dt
from collections import Counter

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _sides_counts(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    np = Counter(r["user_id"] for r in ev if r["event_type"] == "purchase")
    ns = Counter(r["user_id"] for r in ev if r["event_type"] == "signup")
    return np, ns


def test_j12b_skew_card_matches_python_bruteforce(spark):
    """The disclosure card recomputed in plain Python: per-user
    purchase/signup counts, their product, top-10 by (bound desc,
    user asc)."""
    from risk_dashboard_database_spark.plans.joins import (
        j12b_attribution_skew,
    )

    np, ns = _sides_counts(spark)
    want = sorted(
        (
            (u, np[u], ns[u], np[u] * ns[u])
            for u in np
            if u in ns
        ),
        key=lambda t: (-t[3], t[0]),
    )[:10]
    got = [
        (r["user_id"], r["n_purchases"], r["n_signups"], r["pair_bound"])
        for r in j12b_attribution_skew(spark, SF_DIR)
        .orderBy(["pair_bound", "user_id"], ascending=[False, True])
        .collect()
    ]
    assert got == want


def _hot_events(spark, n_purch: int, n_sign: int):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # purchases a day after every signup: all pairs in-window
        (i, base + dt.timedelta(days=1, minutes=i), 7, "purchase", 1.0, "{}")
        for i in range(n_purch)
    ] + [
        (
            10_000 + i,
            base + dt.timedelta(minutes=i),
            7,
            "signup",
            0.0,
            "{}",
        )
        for i in range(n_sign)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


def test_j12_skew_guard_trips_on_zipf_hot_user(spark):
    """One zipf-hot user (60 purchases x 60 signups = 3600 pairs over
    a cap of 1000) must be refused LOUDLY, with the user named —
    the d4/d42 `_audit_bound` discipline applied to the interval
    join's output law."""
    from risk_dashboard_database_spark.plans.joins import (
        _j12_sides,
        _j12_skew_guard,
    )

    ev = _hot_events(spark, 60, 60)
    purchases, signups = _j12_sides(ev)
    with pytest.raises(ValueError, match=r"user 7: 60x60=3600"):
        _j12_skew_guard(purchases, signups, cap=1000)


def test_j12_skew_guard_passes_under_cap(spark):
    """The same feed under the cap passes silently and the join runs:
    the guard changes nothing for in-bounds workloads (the driver
    parity rows all go through it)."""
    from risk_dashboard_database_spark.plans.joins import (
        _j12_join,
        _j12_sides,
        _j12_skew_guard,
    )

    ev = _hot_events(spark, 10, 10)
    purchases, signups = _j12_sides(ev)
    _j12_skew_guard(purchases, signups, cap=1000)
    # 10 purchases x 10 signups, all within 7 days => full 100 pairs
    assert _j12_join(purchases, signups).count() == 100


def test_j12_default_cap_clears_testdata(spark):
    """The default cap (10M pairs/user) clears the real events table
    by >4 orders of magnitude — the guard exists for production zipf
    feeds, not to make the test corpus fragile."""
    from risk_dashboard_database_spark.plans.joins import (
        J12_MAX_PAIRS_PER_KEY,
    )

    np, ns = _sides_counts(spark)
    worst = max((np[u] * ns[u] for u in np if u in ns), default=0)
    assert 0 < worst < J12_MAX_PAIRS_PER_KEY / 1000


def test_profile_approx_vs_exact_parity(spark):
    """s_table_profile_approx vs the exact card at sf0.001: n_rows and
    n_nulls are identical; NDV is EXACT (as a double) for every column
    with fewer than K distinct values (the sketch IS the value set),
    and within 4 standard errors (~25% at K=256) for the rest."""
    from risk_dashboard_database_spark.plans.sources_q import (
        PROFILE_KMV_K,
        s_table_profile,
        s_table_profile_approx,
    )

    exact = {
        r["column_name"]: r for r in s_table_profile(spark, SF_DIR).collect()
    }
    approx = {
        r["column_name"]: r
        for r in s_table_profile_approx(spark, SF_DIR).collect()
    }
    assert set(exact) == set(approx)
    bound = 4.0 / (PROFILE_KMV_K - 2) ** 0.5
    saw_sketch_leg = False
    for c, e in exact.items():
        a = approx[c]
        assert (a["n_rows"], a["n_nulls"]) == (e["n_rows"], e["n_nulls"])
        if e["ndv"] < PROFILE_KMV_K:
            assert a["ndv_est"] == float(e["ndv"]), c
        else:
            saw_sketch_leg = True
            rel = abs(a["ndv_est"] - e["ndv"]) / e["ndv"]
            assert rel <= bound, (c, a["ndv_est"], e["ndv"], rel)
    # the dataset must actually exercise the estimator branch
    assert saw_sketch_leg


def test_profile_approx_plan_rank_is_group_limit_pushed(spark):
    """The scale property the A/B selected this plan FOR: the per-
    column KMV rank must be WindowGroupLimit-pushed (per-partition
    top-K computed BEFORE the exchange, so the merge moves
    ~K x partitions rows per column, d26's shape) — a plan regression
    back to a full-window sort would silently re-shuffle the whole
    distinct volume a second time."""
    from risk_dashboard_database_spark.plans.sources_q import (
        s_table_profile_approx,
    )

    plan = (
        s_table_profile_approx(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "mapInPandas" not in plan.lower()


def test_d49_cells_formula_identical_in_python_duckdb_spark(spark):
    """The corpus-scaled IVF cell-count law: the python twin
    `d49_cells` and the shared SQL text `_ivf_cells_sql` must agree
    on every engine across the whole ladder, including the clamp
    edges — the same pinned-equality discipline as sign-LSH nbits."""
    import duckdb

    from risk_dashboard_database_spark.plans.dedup import (
        _ivf_cells_sql,
        d49_cells,
    )

    ns = [
        1, 2, 3, 15, 16, 17, 500, 2000, 2047, 2048, 4096, 4097,
        200_000, 10**6, 10**10, 10**12, 10**14,
    ]
    want = [d49_cells(n) for n in ns]
    sql = (
        "SELECT CAST(" + _ivf_cells_sql("n") + " AS BIGINT) FROM "
        "(VALUES " + ", ".join(f"(CAST({n} AS BIGINT))" for n in ns)
        + ") AS t(n)"
    )
    duck = [r[0] for r in duckdb.sql(sql).fetchall()]
    spk = [r[0] for r in spark.sql(sql).collect()]
    assert duck == want
    assert spk == want
    # clamp sanity: floor at the historical 16, cap at 65536
    assert d49_cells(1) == 16 and d49_cells(2000) == 16
    assert d49_cells(200_000) == 256
    assert d49_cells(10**14) == 65536


def test_d49_deployed_cells_at_test_sfs(spark):
    """Every driver test SF trains the historical 16-cell codebook,
    so all stored-MV outputs are byte-stable across the r12 formula
    change."""
    from risk_dashboard_database_spark.plans.dedup import _ivf_cells

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        assert _ivf_cells(spark, f"/root/testdata/{sf}") == 16


def test_a19_grouping_sets_matches_python_bruteforce(spark):
    """a19 recomputed in plain Python over the raw events: the three
    grains (cell / cohort marginal / grand total), counts, and
    2dp-decimal value sums."""
    from decimal import ROUND_HALF_UP, Decimal

    from risk_dashboard_database_spark.plans.aggregates import (
        a19_grouping_sets,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    cells: dict[tuple, list] = {}
    for r in ev:
        # Spark's double->decimal(18,2) cast rounds HALF_UP (the
        # 5bbf8af convention) — never Decimal's default HALF_EVEN
        q = Decimal(str(r["value"])).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
        for key in [
            (r["event_type"], r["user_id"] % 4, 0),
            (None, r["user_id"] % 4, 2),
            (None, None, 3),
        ]:
            c = cells.setdefault(key, [0, Decimal(0)])
            c[0] += 1
            c[1] += q
    got = {
        (r["event_type"], r["cohort"], r["lvl"]): (
            r["n_events"],
            r["value_sum"],
        )
        for r in a19_grouping_sets(spark, SF_DIR).collect()
    }
    assert set(got) == set(cells)
    for k, (n, s) in cells.items():
        assert got[k] == (n, float(s)), k


def test_o9_diversified_topk_matches_python_bruteforce(spark):
    """o9 recomputed in plain Python: per-segment rank by (price desc,
    orderkey), cap 3 per segment, global top-20 by the same order."""
    from risk_dashboard_database_spark.plans.toporder import (
        O9_PER_SEGMENT,
        O9_TOPK,
        o9_diversified_topk,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").collect()
    seg = {
        r["c_custkey"]: r["c_mktsegment"]
        for r in spark.read.parquet(f"{SF_DIR}/customer.parquet").collect()
    }
    by_seg: dict[str, list] = {}
    for o in orders:
        by_seg.setdefault(seg[o["o_custkey"]], []).append(o)
    kept = []
    for s, rows in by_seg.items():
        rows.sort(key=lambda o: (-o["o_totalprice"], o["o_orderkey"]))
        for rk, o in enumerate(rows[:O9_PER_SEGMENT], 1):
            kept.append((s, o["o_orderkey"], o["o_totalprice"], rk))
    kept.sort(key=lambda t: (-t[2], t[1]))
    want = kept[:O9_TOPK]
    got = [
        (r["segment"], r["o_orderkey"], r["total_price"], r["seg_rank"])
        for r in o9_diversified_topk(spark, SF_DIR).collect()
    ]
    assert got == want
    # the diversity cap must actually bind somewhere at this SF
    assert len({s for s, *_ in want}) > 1


def test_w15_funnel_matches_python_state_machine(spark):
    """w15 recomputed as a literal per-user state machine over the
    (ts, event_id)-sorted event stream."""
    from risk_dashboard_database_spark.plans.windows import (
        w15_funnel_steps,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    per_user: dict[int, list] = {}
    for r in ev:
        if r["event_type"] in ("view", "click", "purchase"):
            per_user.setdefault(r["user_id"], []).append(r)
    want_code = {"view": 1, "click": 2, "purchase": 3}
    stages = {}
    for u, rows in per_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        stage = 0
        for r in rows:
            if want_code[r["event_type"]] == stage + 1:
                stage += 1
        stages[u] = stage
    u1 = sum(1 for s in stages.values() if s >= 1)
    u2 = sum(1 for s in stages.values() if s >= 2)
    u3 = sum(1 for s in stages.values() if s >= 3)
    want = [
        (1, "view", u1, (u1 * 1_000_000) // u1 if u1 else None),
        (2, "click", u2, (u2 * 1_000_000) // u1 if u1 else None),
        (3, "purchase", u3, (u3 * 1_000_000) // u1 if u1 else None),
    ]
    got = [
        (r["step"], r["step_name"], r["users"], r["conversion_ppm"])
        for r in w15_funnel_steps(spark, SF_DIR).orderBy("step").collect()
    ]
    assert got == want
    # monotone funnel (at sf0.001 every active user happens to
    # complete it — the drop-off property is exercised by the
    # order-sensitivity test below instead)
    assert u1 >= u2 >= u3 > 0


def test_w15_funnel_is_order_sensitive(spark):
    """The property that separates a funnel from a18's per-type
    counts: a user who purchases BEFORE viewing must not convert.
    Two synthetic users with identical event multisets, opposite
    orders."""
    import datetime as dt2

    from risk_dashboard_database_spark.plans.windows import (
        w15_funnel_steps,
    )

    # reuse the production plan on a temp dir so the whole path runs
    base = dt2.datetime(2024, 1, 1)
    rows = [
        # user 1: view -> click -> purchase (converts)
        (1, base, 1, "view", 0.0, "{}"),
        (2, base + dt2.timedelta(hours=1), 1, "click", 0.0, "{}"),
        (3, base + dt2.timedelta(hours=2), 1, "purchase", 1.0, "{}"),
        # user 2: purchase -> click -> view (reaches stage 1 only)
        (4, base, 2, "purchase", 1.0, "{}"),
        (5, base + dt2.timedelta(hours=1), 2, "click", 0.0, "{}"),
        (6, base + dt2.timedelta(hours=2), 2, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        # loaders expect one parquet FILE per table (testdata layout)
        pq.write_table(
            pa.Table.from_pandas(df.toPandas()), f"{d}/events.parquet"
        )
        got = {
            r["step_name"]: (r["users"], r["conversion_ppm"])
            for r in w15_funnel_steps(spark, d).collect()
        }
    assert got == {
        "view": (2, 1_000_000),
        "click": (1, 500_000),
        "purchase": (1, 500_000),
    }


def test_w16_retention_matches_python_bruteforce(spark):
    """w16 recomputed in plain Python: per-user signup cohort week
    (epoch-day // 7), distinct active weeks, the (cohort, offset)
    matrix with distinct-user counts and integer-ppm retention."""
    import datetime as dt3

    from risk_dashboard_database_spark.plans.windows import (
        w16_retention_cohorts,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    epoch = dt3.date(1970, 1, 1)

    def wk(ts):
        return (ts.date() - epoch).days // 7

    cohort = {}
    act = set()
    for r in ev:
        w = wk(r["ts"])
        act.add((r["user_id"], w))
        if r["event_type"] == "signup":
            cohort[r["user_id"]] = min(cohort.get(r["user_id"], w), w)
    sizes = Counter(cohort.values())
    hits = {}
    for u, w in act:
        if u in cohort and w >= cohort[u]:
            hits.setdefault((cohort[u], w - cohort[u]), set()).add(u)
    want = {
        k: (
            len(us),
            sizes[k[0]],
            (len(us) * 1_000_000) // sizes[k[0]],
        )
        for k, us in hits.items()
    }
    got = {
        (r["cohort_week"], r["week_offset"]): (
            r["active_users"],
            r["cohort_size"],
            r["retention_ppm"],
        )
        for r in w16_retention_cohorts(spark, SF_DIR).collect()
    }
    assert got == want
    # offset-0 rows exist for EVERY cohort (a strict ">" regression in
    # the week filter would drop them) and retention never exceeds 1
    for cw in sizes:
        assert (cw, 0) in got
    for (cw, off), (a, s, ppm) in want.items():
        assert 0 < a <= s and ppm <= 1_000_000


def test_s3_props_json_matches_python_bruteforce(spark):
    """s3 recomputed in plain Python with the stdlib json parser."""
    import json as pyjson

    from risk_dashboard_database_spark.plans.sources_q import s3_props_json

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    agg: dict[str, list] = {}
    for r in ev:
        try:
            k = pyjson.loads(r["props"]).get("k")
        except (ValueError, TypeError, AttributeError):
            k = None
        a = agg.setdefault(r["event_type"], [0, 0, 0, None, None])
        a[0] += 1
        if k is None:
            a[1] += 1
        else:
            a[2] += k
            a[3] = k if a[3] is None else min(a[3], k)
            a[4] = k if a[4] is None else max(a[4], k)
    got = {
        r["event_type"]: (
            r["n_events"], r["n_unparsed"], r["k_sum"], r["k_min"], r["k_max"]
        )
        for r in s3_props_json(spark, SF_DIR).collect()
    }
    want = {t: tuple(a) for t, a in agg.items()}
    assert got == want


S3_EDGE_PROPS = [
    '{"k": 7}', '{"k": -3}', '{"k": 1.5}', '{"k": "7"}', '{"k": "abc"}',
    "not json", '{"other": 1}', None, '{"k": 99999999999999999999}',
    '{"k": true}', '{"k": null}', '{"k": 2.0}',
    '{"k": 10000000000000000000}',
]


def test_s3_props_json_edge_corpus_pins_both_engines(spark):
    """The null-safety contract pinned on BOTH sides (code-review r12
    #1): over a 13-case edge corpus (malformed JSON, missing key,
    float, string-typed number, bool, json-null, int64 overflow),
    Spark's from_json('k BIGINT') and the oracle's guarded DuckDB
    expression must parse IDENTICALLY — only {"k": 7} and {"k": -3}
    yield values. Without the json_valid/json_type/TRY_CAST guard the
    oracle raises on 'not json' and rounds '1.5' to 2."""
    import duckdb

    from pyspark.sql import functions as F

    want = {0: 7, 1: -3}  # index -> k; everything else null
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(S3_EDGE_PROPS)], "i long, props string"
    )
    got_spark = {
        r["i"]: r["k"]
        for r in df.select(
            "i", F.from_json("props", "k BIGINT").getField("k").alias("k")
        ).collect()
    }
    from risk_dashboard_database_spark.plans.sources_q import (
        _S3_K_DUCK_SQL,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i BIGINT, props VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(S3_EDGE_PROPS))
    )
    # the REGISTERED oracle fragment, so this pin can't drift from it
    got_duck = dict(
        con.execute(f"SELECT i, {_S3_K_DUCK_SQL} FROM t").fetchall()
    )
    full_want = {i: want.get(i) for i in range(len(S3_EDGE_PROPS))}
    assert got_spark == full_want
    assert got_duck == full_want
