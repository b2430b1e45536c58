"""Custom Python DataSource (jsonl_rows): round-trip the real
documents table through line-delimited JSON and read it back through
the partition-planned reader — contents equal, file->partition
mapping real, malformed lines null-not-error."""

from __future__ import annotations

import json

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _register(spark):
    from risk_dashboard_database_spark.sources.pydatasource import register

    register(spark)


def test_jsonl_roundtrip_matches_documents(spark, tmp_path):
    """Encode documents as 3 JSONL files, read back via the custom
    source: exact row-set equality with the parquet original."""
    rows = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    d = tmp_path / "docs_jsonl"
    d.mkdir()
    for i in range(3):
        with open(d / f"part-{i}.jsonl", "w", encoding="utf-8") as fh:
            for r in rows[i::3]:
                fh.write(json.dumps(r.asDict()) + "\n")
    _register(spark)
    got = (
        spark.read.format("jsonl_rows")
        .schema(SCHEMA)
        .option("path", str(d))
        .load()
    )
    assert got.rdd.getNumPartitions() == 3  # one partition per file
    want = sorted(tuple(r) for r in rows)
    assert sorted(tuple(r) for r in got.collect()) == want


def test_jsonl_is_a_real_relation_for_catalyst(spark, tmp_path):
    """The source composes with ordinary DataFrame ops — filter,
    projection, aggregate — proving it is a first-class relation, not
    a collect-and-parallelize shim."""
    d = tmp_path / "docs_jsonl2"
    d.mkdir()
    with open(d / "a.jsonl", "w") as fh:
        for i in range(10):
            fh.write(json.dumps({"doc_id": i, "text": "t" * i,
                                 "lang": "en" if i % 2 else "de",
                                 "source": "s", "n_chars": i}) + "\n")
    _register(spark)
    df = (
        spark.read.format("jsonl_rows")
        .schema(SCHEMA)
        .option("path", str(d))
        .load()
    )
    agg = (
        df.where(df.lang == "en")
        .groupBy("lang")
        .count()
        .collect()
    )
    assert [(r["lang"], r["count"]) for r in agg] == [("en", 5)]


def test_jsonl_malformed_lines_null_not_error(spark, tmp_path):
    """The null-safety contract (shared with s3_props_json's
    from_json stance): malformed JSON, non-object lines, missing
    fields, and wrong-typed fields (incl. JSON true into a long)
    yield nulls, never errors; blank lines are skipped."""
    d = tmp_path / "docs_jsonl3"
    d.mkdir()
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
        "not json",
        "[1, 2]",
        "",
        '{"doc_id": "7", "text": 5, "lang": true, "source": null, "n_chars": 1.5}',
        '{"doc_id": true, "n_chars": 99999999999999999999}',
    ]
    with open(d / "a.jsonl", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    _register(spark)
    got = sorted(
        (
            tuple(r)
            for r in spark.read.format("jsonl_rows")
            .schema(SCHEMA)
            .option("path", str(d))
            .load()
            .collect()
        ),
        key=lambda t: (t[0] is None, t[0] if t[0] is not None else 0, str(t)),
    )
    assert (1, "ok", "en", "s", 2) in got
    assert len(got) == 5  # blank line skipped, everything else a row
    for row in got:
        if row[0] != 1:
            assert all(v is None for v in row)
