"""Round-trip tests for sources (alias CSV, pipe-series) and sinks
(merge upsert incl. conditional semantics, window rebuild, CSV/JSON,
TTL cache)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from risk_dashboard_database_spark.sources.csv import coerce_bool, read_aliased_csv
from risk_dashboard_database_spark.sources.series import explode_pipe_series
from risk_dashboard_database_spark.sources.sinks import (
    TTLCache,
    csv_sink,
    json_rows,
    merge_upsert,
    merge_upsert_partitioned,
    replace_window,
    write_date_partitioned,
)


def test_read_aliased_csv(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("Company Name,URL,Is Controlled\nAcme,https://a.com,Yes\nBeta,,no\n")
    df = read_aliased_csv(
        spark,
        str(p),
        aliases={
            "company": ["company", "Company Name", "brand"],
            "url": ["url", "URL", "link"],
            "controlled": ["controlled", "Is Controlled"],
        },
        bool_cols=["controlled"],
    )
    rows = {r["company"]: (r["url"], r["controlled"]) for r in df.collect()}
    assert rows == {"Acme": ("https://a.com", True), "Beta": (None, False)}


def test_read_aliased_csv_missing_alias_errors(spark, tmp_path):
    p = tmp_path / "in2.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="none of the aliases"):
        read_aliased_csv(spark, str(p), aliases={"x": ["x", "X"]})


def test_coerce_bool_tristate(spark):
    df = spark.createDataFrame(
        [("TRUE",), ("y",), ("0",), ("No",), ("maybe",), (None,)], "v string"
    )
    got = [r["b"] for r in df.select(coerce_bool(F.col("v")).alias("b")).collect()]
    assert got == [True, True, False, False, None, None]


def test_explode_pipe_series_alignment(spark):
    df = spark.createDataFrame(
        [("A", "2024-01-01|2024-01-02", "1.5|2.5"),
         ("B", "2024-01-01|2024-01-02|2024-01-03", "9.0|8.0")],  # ragged: extra date
        "name string, date_history string, value_history string",
    )
    out = explode_pipe_series(df, "date_history", "value_history")
    got = sorted((r["name"], r["date"], r["value"]) for r in out.collect())
    assert got == [
        ("A", "2024-01-01", "1.5"),
        ("A", "2024-01-02", "2.5"),
        ("B", "2024-01-01", "9.0"),
        ("B", "2024-01-02", "8.0"),
    ]


def test_merge_upsert_new_wins_and_conditionals(spark, tmp_path):
    target = str(tmp_path / "tgt")
    base = spark.createDataFrame(
        [(1, "old", 5, 10), (2, "keep", 3, 30)],
        "id int, label string, first_seen int, last_seen int",
    )
    merge_upsert(spark, target, base, keys=["id"])
    updates = spark.createDataFrame(
        [(1, None, 7, 8), (3, "new", 1, 1)],
        "id int, label string, first_seen int, last_seen int",
    )
    merged = merge_upsert(
        spark,
        target,
        updates,
        keys=["id"],
        conditional={"label": "coalesce", "first_seen": "least", "last_seen": "greatest"},
    )
    rows = {r["id"]: (r["label"], r["first_seen"], r["last_seen"]) for r in merged.collect()}
    assert rows[1] == ("old", 5, 10)   # coalesce kept old label; least/greatest merged
    assert rows[2] == ("keep", 3, 30)  # untouched row survives
    assert rows[3] == ("new", 1, 1)    # inserted row
    # idempotent: re-applying the same updates changes nothing
    # (materialize before the re-merge swaps the underlying files)
    before = {tuple(r) for r in merged.collect()}
    again = merge_upsert(
        spark, target, updates, keys=["id"],
        conditional={"label": "coalesce", "first_seen": "least", "last_seen": "greatest"},
    )
    assert {tuple(r) for r in again.collect()} == before


def test_merge_upsert_concurrent_writers_no_lost_update(spark, tmp_path):
    """Two interleaved upserts to the same key window: the advisory
    lock serializes read-merge-swap, so BOTH writers' inserts survive
    and the conflicting key holds the last writer's value — the
    reference's advisory-lock guarantee (`src/ingest_v2.py:77-103`).
    Without the lock, both writers read the same base and the second
    swap would drop the first writer's rows."""
    import threading

    target = str(tmp_path / "tgt_conc")
    base = spark.createDataFrame([(1, "base")], "id int, label string")
    merge_upsert(spark, target, base, keys=["id"])

    start = threading.Barrier(2)
    errors: list[Exception] = []
    order: list[str] = []

    def writer(rows, tag):
        try:
            upd = spark.createDataFrame(rows, "id int, label string")
            start.wait()
            merge_upsert(spark, target, upd, keys=["id"])
            order.append(tag)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    ta = threading.Thread(target=writer, args=([(1, "A"), (2, "onlyA")], "A"))
    tb = threading.Thread(target=writer, args=([(1, "B"), (3, "onlyB")], "B"))
    ta.start(); tb.start(); ta.join(); tb.join()
    assert not errors
    got = {r["id"]: r["label"] for r in spark.read.parquet(target).collect()}
    # no lost update: both writers' non-conflicting inserts survive
    assert got[2] == "onlyA" and got[3] == "onlyB"
    # conflicting key: last writer to commit wins
    assert got[1] == order[-1]
    assert not os.path.exists(target + ".lock")


def _partition_files(path: str) -> dict[str, tuple[int, int]]:
    """Every data file under a partitioned table ->
    (size, mtime_ns), keyed by path relative to the table root."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.startswith(("_", ".")):
                continue
            fp = os.path.join(root, fn)
            st = os.stat(fp)
            out[os.path.relpath(fp, path)] = (st.st_size, st.st_mtime_ns)
    return out


def test_merge_upsert_partitioned_leaves_untouched_partitions_alone(
    spark, tmp_path
):
    """VERDICT r12 #3 'done' condition: after a partition-scoped
    upsert touching ONE date of a 30-date table, every other
    partition's files are unmodified — same paths, sizes, AND
    mtimes — and the touched date carries the merged values."""
    target = str(tmp_path / "tgt_part")
    base = spark.createDataFrame(
        [(f"2024-01-{d:02d}", u, 10 * u) for d in range(1, 31) for u in (1, 2)],
        "date string, user_id int, total int",
    )
    merge_upsert_partitioned(
        spark, target, base, keys=["date", "user_id"], partition_col="date"
    )
    before = _partition_files(target)
    assert len([p for p in before if p.startswith("date=")]) >= 30

    updates = spark.createDataFrame(
        [("2024-01-05", 1, 999), ("2024-01-05", 3, 33)],
        "date string, user_id int, total int",
    )
    merged = merge_upsert_partitioned(
        spark, target, updates, keys=["date", "user_id"], partition_col="date"
    )
    after = _partition_files(target)
    untouched_before = {
        p: v for p, v in before.items() if not p.startswith("date=2024-01-05")
    }
    untouched_after = {
        p: v for p, v in after.items() if not p.startswith("date=2024-01-05")
    }
    assert untouched_before == untouched_after  # byte-identical, not rewritten

    got = {
        (str(r["date"]), r["user_id"]): r["total"]
        for r in merged.where(F.col("date") == "2024-01-05").collect()
    }
    assert got == {
        ("2024-01-05", 1): 999,   # updated in place
        ("2024-01-05", 2): 20,    # existing row in the touched date survives
        ("2024-01-05", 3): 33,    # inserted
    }
    assert merged.count() == 61

    # Idempotence: re-applying the batch changes values nowhere.
    # (materialize first — the re-merge's dynamic overwrite replaces
    # the touched partition's files under the old DataFrame)
    before_rows = {tuple(r) for r in merged.collect()}
    again = merge_upsert_partitioned(
        spark, target, updates, keys=["date", "user_id"], partition_col="date"
    )
    assert {tuple(r) for r in again.collect()} == before_rows


def test_merge_upsert_partitioned_reads_only_touched_partitions(spark, tmp_path):
    """The mechanism the bounded rewrite rests on: an isin filter on
    the partition column prunes the existing-side scan to the touched
    directories (inputFiles), so the merge's read cost is proportional
    to the batch's dates, not the table."""
    target = str(tmp_path / "tgt_prune")
    base = spark.createDataFrame(
        [(f"2024-02-{d:02d}", 1, d) for d in range(1, 21)],
        "date string, user_id int, total int",
    )
    merge_upsert_partitioned(
        spark, target, base, keys=["date", "user_id"], partition_col="date"
    )
    pruned = spark.read.parquet(target).where(
        F.col("date").isin(["2024-02-03", "2024-02-07"])
    )
    # Runtime truth (inputFiles() reports the pre-pruning relation):
    # every file actually opened belongs to a touched directory, and
    # the plan carries the isin as a PartitionFilter.
    files = [
        r["f"]
        for r in pruned.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    ]
    assert files and all(
        "date=2024-02-03" in f or "date=2024-02-07" in f for f in files
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "2024-02-03" in plan


def test_merge_upsert_partitioned_conditionals_and_contract(spark, tmp_path):
    """S7 conditional semantics survive the partition-scoped path, and
    a partition column outside the natural key is refused loudly (a
    partition-crossing update cannot be merged partition-locally)."""
    target = str(tmp_path / "tgt_cond")
    base = spark.createDataFrame(
        [("2024-03-01", 1, "old", 5, 10)],
        "date string, id int, label string, first_seen int, last_seen int",
    )
    merge_upsert_partitioned(
        spark, target, base, keys=["date", "id"], partition_col="date"
    )
    updates = spark.createDataFrame(
        [("2024-03-01", 1, None, 7, 8)],
        "date string, id int, label string, first_seen int, last_seen int",
    )
    merged = merge_upsert_partitioned(
        spark,
        target,
        updates,
        keys=["date", "id"],
        partition_col="date",
        conditional={
            "label": "coalesce",
            "first_seen": "least",
            "last_seen": "greatest",
        },
    )
    r = merged.collect()[0]
    assert (r["label"], r["first_seen"], r["last_seen"]) == ("old", 5, 10)

    with pytest.raises(ValueError, match="must be part of the natural key"):
        merge_upsert_partitioned(
            spark, target, updates, keys=["id"], partition_col="date"
        )


def test_merge_upsert_partitioned_refuses_null_partition_values(spark, tmp_path):
    """NULL partition keys land in the default partition where isin()
    can never match them — refused loudly instead of silently dropped."""
    target = str(tmp_path / "tgt_null")
    base = spark.createDataFrame(
        [("2024-04-01", 1, 1)], "date string, id int, total int"
    )
    merge_upsert_partitioned(
        spark, target, base, keys=["date", "id"], partition_col="date"
    )
    bad = spark.createDataFrame(
        [(None, 2, 2)], "date string, id int, total int"
    )
    with pytest.raises(ValueError, match="NULL 'date' values"):
        merge_upsert_partitioned(
            spark, target, bad, keys=["date", "id"], partition_col="date"
        )


def test_json_rows_clamps_to_limit(spark):
    df = spark.range(5000).select(F.col("id").cast("int").alias("id"))
    assert len(json_rows(df)) == 1000          # default endpoint clamp
    assert len(json_rows(df, limit=7)) == 7
    assert len(json_rows(df, limit=None)) == 5000


def test_replace_window_rebuilds_only_target_dates(spark, tmp_path):
    path = str(tmp_path / "daily")
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-02", 1, 20), ("2024-01-03", 1, 30)],
        "date string, user_id int, total int",
    )
    write_date_partitioned(base, path)
    rebuilt = spark.createDataFrame(
        [("2024-01-02", 1, 99)], "date string, user_id int, total int"
    )
    replace_window(spark, path, rebuilt)
    got = {str(r["date"]): r["total"] for r in spark.read.parquet(path).collect()}
    assert got == {"2024-01-01": 10, "2024-01-02": 99, "2024-01-03": 30}


def test_csv_and_json_sinks(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    out = str(tmp_path / "csv_out")
    csv_sink(df, out)
    back = spark.read.csv(out, header=True)
    assert sorted((r["id"], r["name"]) for r in back.collect()) == [("1", "a"), ("2", "b")]
    rows = sorted(json_rows(df), key=lambda r: r["id"])
    assert rows == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


def test_gzip_response_threshold():
    import gzip

    from risk_dashboard_database_spark.sources.sinks import gzip_response

    small, compressed = gzip_response(b"x" * 100)
    assert (small, compressed) == (b"x" * 100, False)
    body, compressed = gzip_response(b"y" * 5000)
    assert compressed and gzip.decompress(body) == b"y" * 5000
    # deterministic output (mtime pinned)
    assert body == gzip_response(b"y" * 5000)[0]


def test_object_store_routing_with_file_uri(spark, tmp_path):
    from risk_dashboard_database_spark.sources.object_store import (
        object_exists,
        read_objects,
    )

    df = spark.createDataFrame([(1, "a")], "id int, v string")
    path = tmp_path / "obj"
    df.write.parquet(str(path))
    uri = f"file://{path}"
    assert object_exists(spark, uri)
    assert not object_exists(spark, f"file://{tmp_path}/missing")
    back = read_objects(spark, uri, "parquet")
    assert back.collect() == df.collect()
    with pytest.raises(ValueError, match="unsupported format"):
        read_objects(spark, uri, "avro")


def test_ttl_cache_expiry_and_prefix_invalidation():
    now = [0.0]
    cache = TTLCache(ttl_seconds=10, clock=lambda: now[0])
    cache.set("trend:acme", 1)
    cache.set("trend:beta", 2)
    cache.set("screen:all", 3)
    assert cache.get("trend:acme") == 1
    now[0] = 11.0
    assert cache.get("trend:acme") is None          # expired
    cache.set("trend:acme", 4)
    # beta is past TTL but still stored; prefix invalidation sweeps both
    assert cache.invalidate_prefix("trend:") == 2
    assert cache.get("trend:acme") is None
    assert cache.get("screen:all") is None          # also past TTL


def test_apply_item_override_rpc(spark, tmp_path):
    """rpcs.sql:apply_item_override parity: validation rules verbatim,
    append semantics (a second override for the same url accumulates),
    deterministic content-hash id."""
    import pytest as _pt

    from risk_dashboard_database_spark.sources.sinks import (
        apply_item_override,
    )

    path = str(tmp_path / "item_overrides")
    with _pt.raises(ValueError, match="url_hash is required"):
        apply_item_override(
            spark, path, url_hash="  ", risk_override="negative",
            created_at="2024-01-01T00:00:00",
        )
    with _pt.raises(ValueError, match="Provide risk_override or controlled_override"):
        apply_item_override(
            spark, path, url_hash="h1", created_at="2024-01-01T00:00:00"
        )

    r1 = apply_item_override(
        spark, path, url_hash=" h1 ", risk_override="negative",
        reason="manual", user_id="ana", created_at="2024-01-01T00:00:00",
    ).collect()[0]
    assert r1["url_hash"] == "h1"  # trimmed like the RPC
    r2 = apply_item_override(
        spark, path, url_hash="h1", controlled_override=True,
        user_id="bob", created_at="2024-01-02T00:00:00",
    ).collect()[0]
    rows = spark.read.parquet(path).orderBy("created_at").collect()
    assert len(rows) == 2  # plain INSERT: overrides accumulate
    assert rows[0]["risk_override"] == "negative" and rows[0]["controlled_override"] is None
    assert rows[1]["controlled_override"] is True and rows[1]["risk_override"] is None
    assert r1["id"] != r2["id"] and len(r1["id"]) == 64
    # deterministic: re-deriving the same logical row gives the same id
    r1b = apply_item_override(
        spark, str(tmp_path / "other"), url_hash="h1",
        risk_override="negative", reason="manual", user_id="ana",
        created_at="2024-01-01T00:00:00",
    ).collect()[0]
    assert r1b["id"] == r1["id"]
