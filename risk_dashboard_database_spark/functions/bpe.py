"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016) on a
Spark corpus.

Division of labor — the part that scales with the corpus runs
distributed exactly once, the part that iterates runs on a
vocabulary-sized table:

- ``word_counts(docs)`` is the corpus-sized work: one hash-agg from
  token grain to vocabulary grain (map-side combined — the same
  exchange d34_bpe_merges pays).
- ``learn_bpe(word_counts_df, n_merges)`` collects the VOCABULARY
  (bounded — a dictionary, the same class of driver-side collect as a
  broadcast dim) and runs the merge loop in plain Python, which is how
  production tokenizer trainers work too: they train on word counts,
  never re-scanning the raw corpus per merge.
- ``encode_word(word, merges)`` applies a learned merge list to one
  word (greedy, merge-priority order) — usable inside a pandas_udf
  for distributed tokenization with a broadcast merge table.

Determinism: ties in pair frequency break on the lexicographically
smallest (left, right) pair, so a merge list is a pure function of
the corpus.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Vocabulary with corpus frequencies: the one corpus-sized agg."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    counts: Counter = Counter()
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] += n
    return counts


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    a, b = pair
    merged = a + b
    out: dict[tuple[str, ...], int] = {}
    for symbols, n in vocab.items():
        new: list[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                new.append(merged)
                i += 2
            else:
                new.append(symbols[i])
                i += 1
        out[tuple(new)] = out.get(tuple(new), 0) + n
    return out


# Driver-collect ceiling for learn_bpe (VERDICT r13 #4): a web-scale
# corpus vocabulary is 10^7-10^8 rows — dictionary grain, but not
# driver-sized. Production trainers cut the frequency tail before the
# merge loop for the same reason (rare words contribute ~nothing to
# pair counts); the cut is deterministic ((n DESC, word) — same
# tie-break family as the merge loop) and compiles to
# TakeOrderedAndProject, never a global sort.
DEFAULT_MAX_VOCAB = 1_000_000


def learn_bpe(
    counts: DataFrame,
    n_merges: int,
    max_vocab: int | None = DEFAULT_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a word-count relation.

    The collect here is vocabulary-sized by construction (the input is
    the output of ``word_counts`` — already aggregated to dictionary
    grain), not corpus-sized — and additionally CAPPED at ``max_vocab``
    words by (frequency DESC, word), so a web-scale vocabulary cannot
    grow the driver transfer without bound. ``max_vocab=None`` disables
    the cap (exact-parity mode for small corpora and the property
    tests); the default leaves any corpus whose vocabulary fits under
    the cap bit-identical.
    """
    src = counts.select("word", "n")
    if max_vocab is not None:
        src = src.orderBy(F.col("n").desc(), "word").limit(max_vocab)
    vocab: dict[tuple[str, ...], int] = {}
    for row in src.collect():
        vocab[tuple(row["word"])] = vocab.get(tuple(row["word"]), 0) + row["n"]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc = _pair_counts(vocab)
        if not pc:
            break
        # max count, ties to the lexicographically smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one word with a learned merge list (priority = learn
    order, the standard BPE apply rule)."""
    rank = {pair: i for i, pair in enumerate(merges)}
    symbols = list(word)
    while len(symbols) > 1:
        ranked = [
            (rank[(a, b)], i)
            for i, (a, b) in enumerate(zip(symbols, symbols[1:]))
            if (a, b) in rank
        ]
        if not ranked:
            break
        _, i = min(ranked)
        symbols[i : i + 2] = [symbols[i] + symbols[i + 1]]
    return symbols
