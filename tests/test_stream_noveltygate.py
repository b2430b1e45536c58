"""Streaming novelty gate: availableNow replay over the base corpus
(whose first-occurrence dictionary IS batch t_novelty's) must equal
t_novelty row-for-row, including under 1-file micro-batches; a
genuinely new document scores its unseen grams as novel."""

from __future__ import annotations

import shutil

from risk_dashboard_database_spark.plans.textstats import t_novelty
from risk_dashboard_database_spark.streaming.daily import run_available_now
from risk_dashboard_database_spark.streaming.noveltygate import (
    first_occurrence_dictionary,
    stream_novelty,
    with_novelty,
)

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novel_ppm"])
        for r in df.collect()
    }


def test_stream_novelty_matches_batch(spark, tmp_path):
    docs_dir = tmp_path / "docs_novelty"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_novelty(spark, str(docs_dir), SF_DIR),
        "t_stream_novelty",
        output_mode="append",
    )
    got = _rows(streamed)
    want = _rows(t_novelty(spark, SF_DIR))
    assert got == want
    # non-degenerate: the corpus has both novel and repeated grams
    assert any(v[1] > 0 for v in want.values())
    assert any(v[0] > v[1] for v in want.values())


def test_stream_novelty_single_file_batches(spark, tmp_path):
    import pyarrow.parquet as pq

    full = pq.read_table(f"{SF_DIR}/documents.parquet")
    docs_dir = tmp_path / "docs_novelty_files"
    docs_dir.mkdir()
    third = max(1, full.num_rows // 3)
    for i in range(3):
        lo = i * third
        hi = full.num_rows if i == 2 else (i + 1) * third
        pq.write_table(full.slice(lo, hi - lo), docs_dir / f"part-{i}.parquet")

    schema = spark.read.parquet(f"{SF_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(docs_dir))
    )
    streamed = run_available_now(
        with_novelty(stream, first_occurrence_dictionary(spark, SF_DIR)),
        "t_stream_novelty_files",
        output_mode="append",
    )
    assert _rows(streamed) == _rows(t_novelty(spark, SF_DIR))


def test_stream_novelty_new_document_scores_unseen_grams(spark, tmp_path):
    """A post-build arrival: grams absent from the base dictionary are
    novel; grams the base corpus already holds are not."""
    import pandas as pd

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seen_text = base.orderBy("doc_id").first()["text"]
    seen_grams = seen_text.split(" ")[:5]  # >= one base trigram
    new_doc = " ".join(seen_grams) + " zz1q zz2q zz3q zz4q"
    docs_dir = tmp_path / "docs_novelty_new"
    docs_dir.mkdir()
    pd.DataFrame(
        {
            "doc_id": [9_999_999],
            "text": [new_doc],
            "lang": ["en"],
            "source": ["wiki"],
            "n_chars": [len(new_doc)],
        }
    ).to_parquet(docs_dir / "part-0.parquet")

    streamed = run_available_now(
        stream_novelty(spark, str(docs_dir), SF_DIR),
        "t_stream_novelty_new",
        output_mode="append",
    )
    got = _rows(streamed)[9_999_999]
    tk = new_doc.split(" ")
    n_grams = len({" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)})
    assert got[0] == n_grams
    # the zz-suffixed grams are unseen => novel; the base prefix's
    # grams are in the dictionary with an older first_doc => not novel
    assert 0 < got[1] < n_grams
    assert got[2] == (got[1] * 1_000_000) // n_grams


def test_stream_novelty_state_store_stays_empty(spark, tmp_path):
    """ADVICE r10 regression, pinned behaviorally: the per-document
    fold removes its state entry after emitting, so a completed replay
    reports ZERO rows in the state store (with update()-style
    tombstones it would report one row per document for the stream's
    life)."""
    import shutil

    from risk_dashboard_database_spark.streaming.noveltygate import (
        stream_novelty,
    )

    docs_dir = tmp_path / "docs_novelty_state"
    docs_dir.mkdir()
    shutil.copy(f"{SF_DIR}/documents.parquet", docs_dir / "part-0.parquet")

    q = (
        stream_novelty(spark, str(docs_dir), SF_DIR)
        .writeStream.format("memory")
        .queryName("t_stream_novelty_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in (p.get("stateOperators") or [])
    ]
    assert state_rows, "expected a stateful operator in the progress log"
    assert state_rows[-1] == 0, state_rows
    # and the emission itself is complete (every document emitted)
    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    assert spark.table("t_stream_novelty_state").count() == n_docs
