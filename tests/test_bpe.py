"""BPE trainer: the Spark-fed merge loop must agree with an
independent plain-Python implementation over the raw parquet, and its
first merge must agree with the d34 query's top-ranked pair."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from risk_dashboard_database_spark.functions.bpe import (
    encode_word,
    learn_bpe,
    word_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from risk_dashboard_database_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def _reference_merges(n_merges: int) -> list[tuple[str, str]]:
    """Plain-Python BPE over the raw parquet — no Spark anywhere."""
    con = duckdb.connect()
    texts = con.execute(
        f"SELECT text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    vocab: dict[tuple[str, ...], int] = {}
    for (text,) in texts:
        for w in text.split(" "):
            key = tuple(w)
            vocab[key] = vocab.get(key, 0) + 1
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        out: dict[tuple[str, ...], int] = {}
        a, b = best
        for symbols, n in vocab.items():
            new, i = [], 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == a
                    and symbols[i + 1] == b
                ):
                    new.append(a + b)
                    i += 2
                else:
                    new.append(symbols[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + n
        vocab = out
    return merges


def test_learn_bpe_matches_plain_python(spark):
    from risk_dashboard_database_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    got = learn_bpe(word_counts(docs), 10)
    assert got == _reference_merges(10)


def test_first_merge_is_d34_top_pair(spark):
    from risk_dashboard_database_spark.plans.dedup import d34_bpe_merges
    from risk_dashboard_database_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    (first,) = learn_bpe(word_counts(docs), 1)
    top = d34_bpe_merges(spark, SF_DIR).where("merge_rank = 1").collect()[0]
    assert first[0] + first[1] == top["pair"]


def test_encode_word_applies_merges_in_priority_order():
    merges = [("a", "b"), ("ab", "c"), ("d", "e")]
    assert encode_word("abcde", merges) == ["abc", "de"]
    assert encode_word("xyz", merges) == ["x", "y", "z"]
    assert encode_word("", merges) == []


# ---------------------------------------------------------------- props
# Hypothesis properties over random mini-corpora: the trainer must be
# pure plain-Python-equivalent and the encoder must be lossless.

from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcd", min_size=1, max_size=6)
_corpus = st.lists(_word, min_size=1, max_size=30)


def _learn_plain(words: list[str], n_merges: int) -> list[tuple[str, str]]:
    vocab: dict[tuple[str, ...], int] = {}
    for w in words:
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + 1
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        out: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            new, i = [], 0
            while i < len(symbols):
                if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(symbols[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + n
        vocab = out
    return merges


@settings(max_examples=40, deadline=None)
@given(_corpus, st.integers(min_value=0, max_value=8))
def test_learn_bpe_property_matches_plain_python(words, n_merges):
    """learn_bpe over a word-count table == the same loop over raw
    words, for arbitrary corpora (module-level purity: the Spark
    word_counts step only changes WHERE counting happens)."""
    import pandas as pd

    class _FakeCounts:
        def __init__(self, words):
            c = Counter(words)
            self._rows = [{"word": w, "n": n} for w, n in c.items()]

        def select(self, *cols):
            return self

        def collect(self):
            return self._rows

    got = learn_bpe(_FakeCounts(words), n_merges)
    assert got == _learn_plain(words, n_merges)


@settings(max_examples=60, deadline=None)
@given(_word, st.lists(st.tuples(_word, _word), max_size=6))
def test_encode_word_is_lossless(word, merges):
    """Applying any merge list never changes the concatenation."""
    segs = encode_word(word, merges)
    assert "".join(segs) == word
    assert all(segs)
