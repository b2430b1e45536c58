"""BPE trainer: the Spark-fed merge loop must agree with an
independent plain-Python implementation over the raw parquet, and its
first merge must agree with the d34 query's top-ranked pair."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

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

    got = learn_bpe(_FakeCounts(words), n_merges, max_vocab=None)
    assert got == _learn_plain(words, n_merges)


@settings(max_examples=60, deadline=None)
@given(_word, st.lists(st.tuples(_word, _word), max_size=6))
def test_encode_word_is_lossless(word, merges):
    """Applying any merge list never changes the concatenation."""
    segs = encode_word(word, merges)
    assert "".join(segs) == word
    assert all(segs)


def test_learn_bpe_max_vocab_bounds_the_collect(spark):
    """VERDICT r13 #4: the trainer must cut the frequency tail BEFORE
    collecting. A synthetic heavy-tail vocabulary (3 head words + 50
    singletons) capped at 5 words must (a) collect only the top-5 by
    (n DESC, word) and (b) learn the same head merges as the uncapped
    trainer when the head dominates every pair count."""
    import pandas as pd

    head = [("lowlow", 40), ("lowly", 30), ("slowly", 20)]
    tail = [(f"w{i:02d}x", 1) for i in range(50)]
    counts = spark.createDataFrame(
        pd.DataFrame(head + tail, columns=["word", "n"])
    )
    capped = learn_bpe(counts, 4, max_vocab=5)
    uncapped = learn_bpe(counts, 4, max_vocab=None)
    # the head's 'lo' / 'ow' / 'low' merges dominate regardless of the
    # 50-singleton tail, so the capped trainer reproduces them
    assert capped == uncapped
    # and the cap is a real bound: 5 distinct words reach the driver
    top5 = {
        r["word"]
        for r in counts.orderBy(F.col("n").desc(), "word").limit(5).collect()
    }
    assert {"lowlow", "lowly", "slowly"} <= top5 and len(top5) == 5


def test_learn_bpe_cap_changes_only_tail_driven_merges(spark):
    """When a merge IS tail-driven, the cap must (by design) drop it —
    pin the direction of the divergence so the bound's semantics stay
    documented."""
    import pandas as pd

    # head pair 'ab' (n=3); the 4 'zq*' singletons give pair ('z','q')
    # count 4, which OUTVOTES the head only when the tail survives
    counts = spark.createDataFrame(
        pd.DataFrame(
            [("ab", 3)] + [(f"zq{c}", 1) for c in "wxyu"],
            columns=["word", "n"],
        )
    )
    assert learn_bpe(counts, 1, max_vocab=None) == [("z", "q")]
    assert learn_bpe(counts, 1, max_vocab=1) == [("a", "b")]
