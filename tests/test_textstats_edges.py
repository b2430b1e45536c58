"""Edge-document parity for the round-6 corpus-curation queries.

The driver testdata has no documents shorter than a bigram/trigram, so
the short-doc branches (t_repetition's zero-bigram rows, t_ngram_
docfreq's scan-only UNION branch) are never exercised by the oracle
gate. This builds a tiny corpus containing exactly those shapes and
asserts Spark == DuckDB-oracle EXACTLY on it, including the branches.
"""

from __future__ import annotations

import duckdb
import pytest

from risk_dashboard_database_spark import plans

DOCS = [
    # (doc_id, text, lang, source): empty string, one word, two words,
    # fully-repetitive, normal, and a doc sharing trigrams with others
    (1, "", "en", "t"),
    (2, "word", "en", "t"),
    (3, "two words", "en", "t"),
    (4, "spam spam spam spam spam spam", "en", "t"),
    (5, "the quick brown fox jumps over the lazy dog", "en", "t"),
    (6, "the quick brown fox sat still", "en", "t"),
    (7, "the quick brown fox ran far", "en", "t"),
    (8, "the quick brown fox saw more", "en", "t"),
    (9, "the quick brown fox ate food", "en", "t"),
]


@pytest.fixture()
def docs_dir(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "edgecorpus"
    d.mkdir()
    # single-file parquet, like the driver testdata layout
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, *_ in DOCS], pa.int64()),
                "text": [t for _, t, *_ in DOCS],
                "lang": [lg for _, _, lg, _ in DOCS],
                "source": [s for *_, s in DOCS],
                "n_chars": pa.array([len(t) for _, t, *_ in DOCS], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _oracle(sql: str, docs_dir: str):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{docs_dir}/documents.parquet'"
    )
    return con.sql(sql).df()


@pytest.mark.parametrize(
    "name", ["t_repetition", "t_ngram_docfreq", "t_readability"]
)
def test_edge_corpus_matches_oracle(spark, docs_dir, name):
    got = plans.QUERIES[name](spark, docs_dir).toPandas()
    want = _oracle(plans.ORACLES[name], docs_dir)
    assert sorted(got.columns) == sorted(want.columns)
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    assert len(got) == len(want) == len(DOCS)
    for c in got.columns:
        assert got[c].astype(object).tolist() == want[c].astype(object).tolist(), c


def test_edge_values_pinned(spark, docs_dir):
    """Hand-computed expectations so the test is not just two engines
    agreeing on the same mistake."""
    rep = {
        r["doc_id"]: r
        for r in plans.QUERIES["t_repetition"](spark, docs_dir)
        .toPandas()
        .to_dict("records")
    }
    assert rep[1]["n_bigrams"] == 0 and rep[1]["is_repetitive"] == 0
    assert rep[2]["n_bigrams"] == 0
    assert rep[3]["n_bigrams"] == 1 and rep[3]["top_bigram_frac"] == 1.0
    assert rep[3]["is_repetitive"] == 1  # single bigram occupies all
    # 'spam spam' x5 of 5 bigrams -> top frac 1.0, dup frac 4/5
    assert rep[4]["n_bigrams"] == 5 and rep[4]["n_distinct_bigrams"] == 1
    assert rep[4]["top_bigram_frac"] == 1.0 and rep[4]["is_repetitive"] == 1
    # 9-word sentence, all bigrams unique -> not repetitive
    assert rep[5]["n_bigrams"] == 8 and rep[5]["is_repetitive"] == 0

    df = {
        r["doc_id"]: r
        for r in plans.QUERIES["t_ngram_docfreq"](spark, docs_dir)
        .toPandas()
        .to_dict("records")
    }
    # docs 1-3 are too short for a trigram: the union branch
    assert all(df[i]["n_grams"] == 0 and df[i]["common_share"] == 0.0
               for i in (1, 2, 3))
    # 'the quick brown' and 'quick brown fox' appear in docs 5-9 (5 >= 5
    # docs -> common); every other trigram is rarer
    assert df[5]["n_grams"] == 7 and df[5]["n_common"] == 2
    assert df[6]["n_grams"] == 4 and df[6]["n_common"] == 2
    assert df[6]["common_share"] == 0.5
    # doc 4: 'spam spam spam' x4 dedupes to ONE distinct gram, df=1
    assert df[4]["n_grams"] == 1 and df[4]["n_common"] == 0


def test_readability_edge_values_pinned(spark, docs_dir):
    """Hand-computed Flesch milli-scores on the edge corpus."""
    rd = {
        r["doc_id"]: r
        for r in plans.QUERIES["t_readability"](spark, docs_dir)
        .toPandas()
        .to_dict("records")
    }
    # empty text: split -> [''] = 1 word, 0 sentences -> floor 1,
    # 0 vowel groups: 206835 - 1015//1 - 0 = 205820
    assert rd[1]["words"] == 1 and rd[1]["sentences"] == 1
    assert rd[1]["syllables"] == 0 and rd[1]["score_milli"] == 205820
    assert rd[1]["band"] == "easy"
    # 'word': 1 word, 1 vowel group -> 206835 - 1015 - 84600 = 121220
    assert rd[2]["syllables"] == 1 and rd[2]["score_milli"] == 121220
    # doc 5: 9 words, no [.!?] -> 1 sentence; vowel groups:
    # the(1) quick(2: u,i) brown(1: o... 'brown' -> o w n: [o] one) ...
    assert rd[5]["words"] == 9 and rd[5]["sentences"] == 1
    # band thresholds are exclusive integer comparisons
    for r in rd.values():
        assert (
            (r["band"] == "easy") == (r["score_milli"] >= 60000)
            or (r["band"] == "standard")
            == (30000 <= r["score_milli"] < 60000)
            or (r["band"] == "hard") == (r["score_milli"] < 30000)
        )


def test_d43_edge_short_bucket(spark, docs_dir):
    """Docs 1-2 (< 2 tokens) land in the scan-only 'short' branch; the
    oracle and Spark agree on the whole bucket table for the edge
    corpus (exercises the branch the driver testdata never hits)."""
    got = plans.QUERIES["d43_lm_quality_buckets"](spark, docs_dir).toPandas()
    want = _oracle(plans.ORACLES["d43_lm_quality_buckets"], docs_dir)
    key = ["lang", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
    assert len(got) == len(want)
    for c in got.columns:
        assert (
            got[c].fillna(-1).astype(object).tolist()
            == want[c].fillna(-1).astype(object).tolist()
        ), c
    short = got[got.bucket == "short"]
    assert len(short) == 1 and int(short.iloc[0]["n_docs"]) == 2
