"""Round-14: ADVICE r13 regression fixtures.

Three dialect/semantics bugs the r13 advice caught, each pinned here on
BOTH engines (the Spark plan AND its DuckDB oracle over the same
planted corpus), so the driver's hash compare and the streaming twins
can never silently diverge on these cases again:

- d72: a benchmark gram occurring TWICE in one document summed 2k
  probe hits != k and was classified NOT-contaminated — a false
  negative the Bloom design declares impossible (fixed with a
  per-(doc, gram) DISTINCT on both sides);
- d70: the tail bucket's bare CAST(DOUBLE AS BIGINT) rounded in DuckDB
  but truncated in Spark (toks=7000 -> 12288 vs 8192; fixed with an
  explicit FLOOR in the ONE shared CASE text);
- d73: the oracle's `n * 1000000 / total` was DuckDB FLOAT division +
  round-to-nearest while the plan uses DIV (floor) — 2/3 gave 666667
  vs 666666 (fixed with `//`, the _d74_dim_tvd_sql pattern).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def _plant_docs(tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
            }
        ),
        f"{tmp_path}/documents.parquet",
    )


def _oracle_df(name: str, tmp_path, table: str = "documents"):
    from risk_dashboard_database_spark.plans.registry import ORACLES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{tmp_path}/{table}.parquet'"
    )
    return con.execute(ORACLES[name]).fetchdf()


def test_d72_repeated_contaminated_gram_flagged_on_both_engines(spark, tmp_path):
    """ADVICE r13 #1 repro: doc 1 contains the benchmark 4-gram
    'a b c d' twice; pre-fix both engines read hits=2k != k and
    emitted bloom_contaminated=0 / false_positive=-1."""
    from risk_dashboard_database_spark.plans.dedup import d72_bloom_decontam

    _plant_docs(
        tmp_path,
        [
            (0, "a b c d", "en"),  # benchmark doc (0 % 97 == 0)
            (1, "a b c d a b c d", "en"),  # the bench gram occurs TWICE
            (2, "p q r s t u", "en"),  # clean grams
            (3, "q", "en"),  # too short for any 4-gram
        ],
    )
    got = {
        r["doc_id"]: (
            r["bloom_contaminated"],
            r["contaminated"],
            r["false_positive"],
        )
        for r in d72_bloom_decontam(spark, str(tmp_path)).collect()
    }
    assert got[1] == (1, 1, 0)  # pre-fix: (0, 1, -1)
    assert got[2] == (0, 0, 0)
    assert got[3] == (0, 0, 0)
    # No false negatives anywhere — the property the card's design
    # statement promises.
    assert all(fp >= 0 for (_, _, fp) in got.values())
    o = {
        int(r.doc_id): (
            int(r.bloom_contaminated),
            int(r.contaminated),
            int(r.false_positive),
        )
        for r in _oracle_df("d72_bloom_decontam", tmp_path).itertuples()
    }
    assert o == got


def test_d70_tail_bucket_ceil_identical_on_both_engines(spark, tmp_path):
    """ADVICE r13 #3 repro: toks=7000 must land in bucket 8192 on BOTH
    engines (pre-fix DuckDB's CAST rounded (7000+4095)/4096 = 2.709 up
    to 3 -> bucket 12288 while Spark truncated to 2 -> 8192)."""
    from risk_dashboard_database_spark.plans.dedup import (
        d70_length_bucket_batches,
    )

    _plant_docs(
        tmp_path,
        [
            (1, "a " * 6999 + "a", "en"),  # 7000 single-letter tokens
            (2, "b b b", "en"),  # 3 tokens -> ladder bucket 32
        ],
    )
    rows = d70_length_bucket_batches(spark, str(tmp_path)).collect()
    got = {
        r["bucket_len"]: (
            r["n_docs"],
            r["n_batches"],
            r["real_tokens"],
            r["padded_tokens"],
            r["waste_ppm"],
        )
        for r in rows
    }
    assert set(got) == {32, 8192}
    assert got[8192][0] == 1 and got[8192][2] == 7000
    assert got[8192][3] == 8192  # 1 doc padded to ONE 8192 bucket
    o = {
        int(r.bucket_len): (
            int(r.n_docs),
            int(r.n_batches),
            int(r.real_tokens),
            int(r.padded_tokens),
            int(r.waste_ppm),
        )
        for r in _oracle_df(
            "d70_length_bucket_batches", tmp_path
        ).itertuples()
    }
    assert o == got


def test_d73_share_ppm_floors_on_both_engines(spark, tmp_path):
    """ADVICE r13 #2 repro: a key owning 2 of 3 rows must read
    share_ppm 666666 (floor) on BOTH engines — the oracle's pre-fix
    `/` + CAST rounded to 666667 while the plan's DIV floored."""
    from risk_dashboard_database_spark.plans.dedup import d73_hot_key_audit

    base = datetime.datetime(2024, 1, 1)
    rows = [(1, 7), (2, 7), (3, 8)]  # user 7 owns 2/3 of the rows
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([e for e, _ in rows], pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(hours=e) for e, _ in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for _, u in rows], pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": ["{}"] * len(rows),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    got = [
        (r["rk"], r["user_id"], r["n"], r["share_ppm"], r["cum_share_ppm"])
        for r in d73_hot_key_audit(spark, str(tmp_path))
        .orderBy("rk")
        .collect()
    ]
    # cum_share_ppm floors the cumulative COUNT (3*1e6 // 3 at rk 2),
    # not the sum of the per-key floors — hence 1000000, not 999999.
    assert got == [(1, 7, 2, 666666, 666666), (2, 8, 1, 333333, 1000000)]
    o = [
        (int(r.rk), int(r.user_id), int(r.n), int(r.share_ppm), int(r.cum_share_ppm))
        for r in _oracle_df("d73_hot_key_audit", tmp_path, table="events")
        .sort_values("rk")
        .itertuples()
    ]
    assert o == got


SF_DIR = "/root/testdata/sf0.001"


def test_d44b_capped_prune_matches_python_bruteforce(spark):
    """d44b recomputed in plain Python: same stub assignment (read from
    the shared MV), same vec_id rank band, same left-fold cosine —
    plus the lower-bound-vs-d44 and pairs arithmetic invariants."""
    import math
    from collections import defaultdict

    from risk_dashboard_database_spark.plans.dedup import (
        D44B_CAP,
        SEM_TAU,
        _ivf_assigned,
        d44_semantic_prune,
        d44b_semantic_prune_capped,
    )

    cells = defaultdict(list)
    for r in _ivf_assigned(spark, SF_DIR).select(
        "vec_id", "embedding", "cell"
    ).collect():
        cells[r["cell"]].append((r["vec_id"], r["embedding"]))
    want = {}
    for cell, members in cells.items():
        members.sort()
        pruned = 0
        for i, (_, ea) in enumerate(members):
            na = math.sqrt(sum(x * x for x in ea))
            for j in range(max(0, i - D44B_CAP), i):
                eb = members[j][1]
                dot = sum(x * y for x, y in zip(ea, eb))
                nb = math.sqrt(sum(x * x for x in eb))
                if dot / (na * nb) >= SEM_TAU:
                    pruned += 1
                    break
        want[cell] = (len(members), pruned)
    got = {r["cell"]: r for r in d44b_semantic_prune_capped(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    full = {
        r["cell"]: r["n_pruned"] for r in d44_semantic_prune(spark, SF_DIR).collect()
    }
    for cell, (n, np_) in want.items():
        r = got[cell]
        assert (r["n_vecs"], r["n_pruned_cap"]) == (n, np_)
        # the cap only ever MISSES dominations -> lower bound on d44
        assert r["n_pruned_cap"] <= full[cell]
        assert r["n_kept_cap"] == n - np_
        expect_scan = (
            n * (n - 1) // 2
            if n <= D44B_CAP
            else D44B_CAP * (D44B_CAP - 1) // 2 + (n - D44B_CAP) * D44B_CAP
        )
        assert r["pairs_scanned"] == expect_scan
        assert r["pairs_scanned"] <= r["pairs_full"] == n * (n - 1) // 2


def test_e16_stock_series_payload_shape(spark, tmp_path):
    """Endpoint-shape fixture (VERDICT r13 #6): planted feed with a
    hand-computed payload — snapshot-date fallback, scope semi-join,
    pipe-history alignment, and the reference's pct-change guards
    (`app.py:6811-6825`): daily needs >=2 points, 7-day needs >=8
    points and a nonzero prices[-8]; entities without a point on the
    resolved date emit NO row."""
    import datetime

    from risk_dashboard_database_spark.plans.endpoints import (
        e16_stock_series,
    )

    base = datetime.datetime(1998, 1, 1)
    rows = []  # (orderkey, custkey, price, day-offset)
    # c1: BUILDING, 9 daily points 100,200,...,900 ending at the
    # corpus max date -> snapshot row with both pct-changes
    for i in range(9):
        rows.append((100 + i, 1, float(100 * (i + 1)), i))
    # c2: BUILDING but its last point is BEFORE the resolved snapshot
    # date -> excluded (the reference emits snapshot holders only)
    rows.append((200, 2, 500.0, 3))
    # c3: out-of-scope segment, has a point at the max date
    rows.append((300, 3, 700.0, 8))
    # c4: BUILDING, a point ONLY at the max date -> n=1, both pcts NULL
    rows.append((400, 4, 300.0, 8))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
                "o_orderstatus": ["O"] * len(rows),
                "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
                "o_orderdate": pa.array(
                    [base + datetime.timedelta(days=r[3]) for r in rows],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": ["1-URGENT"] * len(rows),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                "c_name": ["c1", "c2", "c3", "c4"],
                "c_nationkey": pa.array([0] * 4, pa.int32()),
                "c_acctbal": pa.array([0.0] * 4, pa.float64()),
                "c_mktsegment": ["BUILDING", "BUILDING", "OTHER", "BUILDING"],
            }
        ),
        f"{tmp_path}/customer.parquet",
    )
    got = {r["cust"]: r for r in e16_stock_series(spark, str(tmp_path)).collect()}
    # resolved snapshot date = 1998-01-09 (max scoped date <= target);
    # c2 (stale) and c3 (out of scope) emit no row
    assert set(got) == {1, 4}
    r1 = got[1]
    cents = [i * 10000 for i in range(1, 10)]  # 100.00 .. 900.00 in cents
    assert r1["price_history"] == "|".join(str(c) for c in cents)
    assert r1["date_history"] == "|".join(
        f"1998-01-{d:02d}" for d in range(1, 10)
    )
    assert r1["n_points"] == 9 and r1["price_cents"] == 90000
    # ((last - prev)/prev)*100 and ((last - prev7)/prev7)*100
    assert r1["daily_change_pct"] == ((90000.0 - 80000.0) / 80000.0) * 100
    assert r1["seven_day_change_pct"] == ((90000.0 - 20000.0) / 20000.0) * 100
    r4 = got[4]
    assert r4["n_points"] == 1
    assert r4["daily_change_pct"] is None
    assert r4["seven_day_change_pct"] is None
    # oracle agreement on the planted feed (both tables registered)
    from risk_dashboard_database_spark.plans.registry import ORACLES

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
        )
    odf = con.execute(ORACLES["e16_stock_series"]).fetchdf()
    o = {int(r.cust): r for r in odf.itertuples()}
    assert set(o) == {1, 4}
    assert o[1].price_history == r1["price_history"]
    assert o[1].daily_change_pct == r1["daily_change_pct"]
    assert o[1].seven_day_change_pct == r1["seven_day_change_pct"]


def test_w18_anomaly_days_matches_python_bruteforce(spark):
    """w18 recomputed in plain Python over the raw parquet: same
    trailing-30-row baseline excluding today, same cross-multiplied
    integer two-sigma test — and the arithmetic identity vs the float
    formulation is asserted on every row."""
    from collections import defaultdict

    import duckdb as _dd

    from risk_dashboard_database_spark.plans.windows import (
        W18_LOOKBACK,
        W18_MIN_BASE,
        w18_anomaly_days,
    )

    rows = _dd.sql(
        "SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS n "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    série = defaultdict(list)
    for uid, d, n in rows:
        série[uid].append((str(d), int(n)))
    want = {}
    for uid, days in série.items():
        for i, (d, x) in enumerate(days):
            base = [v for _, v in days[max(0, i - W18_LOOKBACK) : i]]
            n = len(base)
            s = sum(base)
            ss = sum(v * v for v in base)
            dev = n * x - s
            spike = int(
                n >= W18_MIN_BASE and dev > 0 and dev * dev > 4 * (n * ss - s * s)
            )
            # SUM over an empty frame is NULL on both engines (COUNT is 0)
            want[(d, uid)] = (x, n, s if n else None, spike)
            if n:  # integer form == float two-sigma form, every row
                mean = s / n
                var = ss / n - mean * mean
                float_spike = x > mean + 2 * (var ** 0.5) if var >= 0 else False
                if n >= W18_MIN_BASE:
                    assert bool(spike) == bool(float_spike)
    got = {
        (r["date"], r["user_id"]): (
            r["total"],
            r["base_n"],
            r["base_sum"],
            r["is_spike"],
        )
        for r in w18_anomaly_days(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(v[3] == 1 for v in want.values())  # non-degenerate


def test_e17_trends_series_payload_shape(spark, tmp_path):
    """e17's endpoint-shape fixture: snapshot fallback on the events
    feed, pipe-history alignment, and the window-average —
    hand-computed on a planted feed, both engines."""
    import datetime

    from risk_dashboard_database_spark.plans.endpoints import (
        e17_trends_series,
    )

    base = datetime.datetime(2024, 3, 1)
    rows = []  # (event_id, user_id, day-offset, events-that-day)
    plan = [(1, 0, 2), (1, 1, 3), (1, 4, 1), (2, 4, 5), (3, 2, 4)]
    eid = 0
    for uid, off, cnt in plan:
        for _ in range(cnt):
            eid += 1
            rows.append((eid, uid, off))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(days=r[2], hours=1) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": ["view"] * len(rows),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": ["{}"] * len(rows),
            }
        ),
        f"{tmp_path}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3], pa.int64()),
                "c_name": ["c1", "c2", "c3"],
                "c_nationkey": pa.array([0] * 3, pa.int32()),
                "c_acctbal": pa.array([0.0] * 3, pa.float64()),
                "c_mktsegment": ["BUILDING", "BUILDING", "OTHER"],
            }
        ),
        f"{tmp_path}/customer.parquet",
    )
    got = {r["cust"]: r for r in e17_trends_series(spark, str(tmp_path)).collect()}
    # resolved snapshot date = 2024-03-05 (max scoped day); c1 and c2
    # both have a point there; c3 is out of scope entirely
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["trends_history"] == "2|3|1"
    assert r1["date_history"] == "2024-03-01|2024-03-02|2024-03-05"
    assert r1["last_updated"] == "2024-03-05"
    assert r1["avg_interest"] == (2 + 3 + 1) / 3.0
    assert r1["n_points"] == 3
    r2 = got[2]
    assert r2["trends_history"] == "5" and r2["avg_interest"] == 5.0
    # oracle agreement on the planted feed
    from risk_dashboard_database_spark.plans.registry import ORACLES

    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
        )
    odf = con.execute(ORACLES["e17_trends_series"]).fetchdf()
    o = {int(r.cust): r for r in odf.itertuples()}
    assert set(o) == {1, 2}
    assert o[1].trends_history == r1["trends_history"]
    assert o[1].avg_interest == r1["avg_interest"]
    assert o[2].last_updated == r2["last_updated"]
