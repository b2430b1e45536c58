"""Unit tests for the training-data pipeline pieces: shingle/minhash
determinism, LSH banding recall on known near-dupes, and the
multimodal decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from risk_dashboard_database_spark.plans.dedup import (
    _minhash_spark,
    _shingles_spark,
)
from risk_dashboard_database_spark.plans.multimodal import decode_media


def test_shingles_word_trigrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(_shingles_spark(F.col("text")).alias("sh")).collect()
    assert rows[0]["sh"] == ["a b c", "b c d"]
    assert rows[1]["sh"] == []


def test_minhash_deterministic_and_banding_catches_near_dupes(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "quick brown fox jumps over the lazy dog again and again today"  # drop 1 word
    far = "completely different words with no overlap at all in this text"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], "doc_id int, text string")
    sigs = df.select(
        "doc_id", _minhash_spark(_shingles_spark(F.col("text"))).alias("mh")
    ).collect()
    mh = {r["doc_id"]: r["mh"] for r in sigs}
    # determinism: recompute equals first compute
    sigs2 = df.select(
        "doc_id", _minhash_spark(_shingles_spark(F.col("text"))).alias("mh")
    ).collect()
    assert mh == {r["doc_id"]: r["mh"] for r in sigs2}
    # near-dup shares most minhashes with base; far shares none
    shared_near = sum(a == b for a, b in zip(mh[1], mh[2]))
    shared_far = sum(a == b for a, b in zip(mh[1], mh[3]))
    assert shared_near >= 6
    assert shared_far == 0


def test_minhash_lsh_agrees_with_bruteforce_on_corpus(spark):
    """d2's banded candidates must contain every brute-force pair at
    the threshold on the real corpus (recall check — banding may
    legitimately miss borderline pairs, but this corpus is bimodal
    with all true pairs near Jaccard 0.99, where 4x3 banding recall
    is ~1)."""
    from risk_dashboard_database_spark.plans.dedup import (
        d2_minhash_pairs,
        d4_ngram_jaccard,
    )

    sf = "/root/testdata/sf0.001"
    lsh = {
        (r["doc_a"], r["doc_b"]) for r in d2_minhash_pairs(spark, sf).collect()
    }
    brute_same_lang = {
        (r["doc_a"], r["doc_b"]) for r in d4_ngram_jaccard(spark, sf).collect()
    }
    # d4 is language-blocked, so it sees a subset of true pairs; every
    # pair it finds must also be found by the unblocked LSH path
    assert brute_same_lang <= lsh


def test_decode_media_fake_deterministic():
    out = decode_media(b"x" * 100, "fake/deterministic")
    assert out == {"width": 16 + 100 % 624, "height": 16 + 700 % 464, "n_frames": 1 + 100 % 30}
    # same payload -> same features
    assert out == decode_media(b"x" * 100, "fake/deterministic")


def test_decode_media_real_codecs_raise():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG", "image/png")
