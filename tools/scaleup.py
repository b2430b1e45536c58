"""Build a key-shifted K-times replica of an SF dir for scale-curve
checks (VERDICT r4 #7).

Fact tables (lineitem, orders, events, documents) are replicated K
times with copy-disjoint primary keys, so join/dedup-group semantics
on those keys are preserved while data volume grows K-fold. Note the
deliberate cap: `user_id` and `ts` are NOT shifted across copies, so
dim-keyed grains (user_id x day — sessionization, w2/t2 baselines)
keep FIXED cardinality under replication and see K-fold duplicated
timestamps per key. Their flat scale curves therefore measure the
MV-grain cap (output rows don't grow), not per-event cost — read them
as "grain design holds", not "events are free" (ADVICE r5). Dimension tables (region, nation, customer, supplier, part)
and the ANN corpus (embeddings) are copied 1:1:

- dims: at 100 TB the fact:dim ratio grows, not shrinks — scaling the
  facts against fixed dims is exactly the production growth law, and
  it keeps broadcast-ability assumptions honest;
- embeddings: kept 1:1 in the default modes; use --mode=vec for honest
  vector-volume growth. (Historical note: before r10 the ANN probe
  sets were `vec_id % 50` corpus fractions, so K x vectors implied
  K^2 probe work by WORKLOAD definition; the family now uses the
  bounded md5-rank+LIMIT probe set, so --mode=vec rows measure the
  PLANS — and the r10 table shows the trained family near-flat at
  100x vectors.)

Document text gets a per-copy suffix (and n_chars is kept consistent)
so the near-dup family sees mostly-distinct shingles rather than a
degenerate K-way exact-duplicate corpus whose candidate-pair count
would grow quadratically for data reasons, not plan reasons.

Usage: python tools/scaleup.py [K] [src_dir] [dst_dir]
Defaults: K=10, src=/root/testdata/sf0.1, dst=/tmp/sfscale{K}
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 1_000_000_000  # copy i shifts bigint keys by i * SHIFT

FACT_SQL = {
    "lineitem": """
        SELECT l_orderkey + {off} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src
    """,
    "orders": """
        SELECT o_orderkey + {off} AS o_orderkey, o_custkey, o_orderstatus,
               o_totalprice, o_orderdate, o_orderpriority
        FROM src
    """,
    "events": """
        SELECT event_id + {off} AS event_id, ts, user_id, event_type,
               value, props
        FROM src
    """,
    "documents": """
        SELECT doc_id + {off} AS doc_id,
               CASE WHEN {i} = 0 THEN text
                    ELSE text || ' c{i}' END AS text,
               lang, source,
               CASE WHEN {i} = 0 THEN n_chars
                    ELSE n_chars + {suffix_len} END AS n_chars
        FROM src
    """,
}

# --mode=salt documents variant: every word of copy i>0 gets a '~i'
# suffix, so NO shingle/n-gram is shared across copies — the replica is
# a genuinely grown corpus (near-dup pair count grows ~linearly) rather
# than a K-way near-duplicate family (pairs grow quadratically). Use it
# to measure the near-dup family's scale curve on distinct data.
DOCS_SALTED_SQL = """
    SELECT doc_id + {off} AS doc_id,
           CASE WHEN {i} = 0 THEN text
                ELSE array_to_string(
                       list_transform(string_split(text, ' '),
                                      w -> w || '~{i}'), ' ') END AS text,
           lang, source,
           CASE WHEN {i} = 0 THEN n_chars
                ELSE len(array_to_string(
                       list_transform(string_split(text, ' '),
                                      w -> w || '~{i}'), ' ')) END AS n_chars
    FROM src
"""
# --mode=zipf (VERDICT r7 #3): the honest stress for a pretraining
# corpus — the suffix/salt replicas keep the lang mixture uniform-ish,
# but real corpora are Zipf-skewed. Three deliberate hot spots:
# - documents: salted text (distinct shingles, as --mode=salt) PLUS
#   90% of docs remapped to the corpus-dominant lang — stresses d13's
#   per-lang quota rank, d18's per-domain rank, t_ngram_docfreq's gram
#   shuffle, and the d2 band join's per-lang band population;
# - events: 90% of rows remapped to one hot user_id — stresses the
#   per-user windows (w2/t2/sessionize) and j4's grain;
# - lineitem: 90% of rows remapped to one hot (copy-0, 1996-dated)
#   l_orderkey — gives j1's lineitem<->orders shuffle a genuinely hot
#   partition so AQE's skew-join split can be demonstrated (r7 #5).
DOCS_ZIPF_SQL = DOCS_SALTED_SQL.replace(
    "lang, source,",
    "CASE WHEN doc_id % 10 < 9 THEN '{dom}' ELSE lang END AS lang, source,",
)
EVENTS_ZIPF_SQL = """
    SELECT event_id + {off} AS event_id, ts,
           CASE WHEN event_id % 10 < 9 THEN {hot_user} ELSE user_id END
             AS user_id,
           event_type, value, props
    FROM src
"""
LINEITEM_ZIPF_SQL = """
    SELECT CASE WHEN l_orderkey % 10 < 9 THEN {hot_order}
                ELSE l_orderkey + {off} END AS l_orderkey,
           l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag,
           l_linestatus, l_shipdate
    FROM src
"""
# --mode=vec (VERDICT r8 #2): grow the EMBEDDINGS corpus K-fold — the
# dimension every ANN/semantic operator consumes, which the default
# modes deliberately keep 1:1 (see the header note). Each copy i > 0
# applies one fixed ORTHOGONAL transform to all of its vectors: a
# cyclic coordinate shift by i plus deterministic per-(copy, dim) sign
# flips. Orthogonal => norms are preserved EXACTLY and every pairwise
# cosine WITHIN a copy equals its copy-0 counterpart — so the true
# neighbor structure replicates linearly (K x vectors, K x true
# neighbor pairs), while CROSS-copy cosines scramble into noise (no
# degenerate exact-duplicate family whose pair count would grow
# quadratically for data reasons, the same design point as the salted
# documents). Facts get the standard suffix replication so doc-side
# operators stay honest if touched.
EMB_VEC_SQL = """
    SELECT vec_id + {off} AS vec_id, label,
           CASE WHEN {i} = 0 THEN embedding ELSE
             list_transform(range(1, len(embedding) + 1),
               j -> CAST(embedding[1 + ((j - 1 + {i}) % len(embedding))]
                    * (CASE WHEN hash({i} * 1024 + j) % 2 = 0
                            THEN 1 ELSE -1 END) AS REAL))
           END AS embedding
    FROM src
"""

COPY_TABLES = ["region", "nation", "customer", "supplier", "part", "embeddings"]


def build(k: int, src: str, dst: str, mode: str = "suffix") -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    copy_tables = list(COPY_TABLES)
    fact_sql = dict(FACT_SQL)
    if mode == "vec":
        copy_tables.remove("embeddings")
        fact_sql["documents"] = DOCS_SALTED_SQL
        fact_sql["embeddings"] = EMB_VEC_SQL
    for t in copy_tables:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied 1x")
    fmt = {}
    if mode == "salt":
        fact_sql["documents"] = DOCS_SALTED_SQL
    elif mode == "zipf":
        fact_sql["documents"] = DOCS_ZIPF_SQL
        fact_sql["events"] = EVENTS_ZIPF_SQL
        fact_sql["lineitem"] = LINEITEM_ZIPF_SQL
        fmt["dom"] = con.sql(
            f"SELECT lang FROM '{src}/documents.parquet' "
            "GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1"
        ).fetchone()[0]
        fmt["hot_user"] = con.sql(
            f"SELECT min(user_id) FROM '{src}/events.parquet'"
        ).fetchone()[0]
        fmt["hot_order"] = con.sql(
            f"SELECT min(o_orderkey) FROM '{src}/orders.parquet' "
            "WHERE o_orderdate >= DATE '1996-01-01' "
            "AND o_orderdate < DATE '1997-01-01'"
        ).fetchone()[0]
        print(f"zipf hot spots: {fmt}")
    for t, tmpl in fact_sql.items():
        con.sql(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{src}/{t}.parquet'")
        parts = []
        for i in range(k):
            suffix_len = len(f" c{i}")
            parts.append(
                tmpl.format(off=i * SHIFT, i=i, suffix_len=suffix_len, **fmt)
            )
        union = " UNION ALL ".join(f"({p})" for p in parts)
        con.sql(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({k}x)")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mode = "suffix"
    for m in ("salt", "zipf", "vec"):
        if f"--mode={m}" in sys.argv:
            mode = m
    k = int(args[0]) if args else 10
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    suffix = {"salt": "-salt", "zipf": "-zipf", "vec": "-vec"}.get(mode, "")
    dst = args[2] if len(args) > 2 else f"/tmp/sfscale{k}{suffix}"
    build(k, src, dst, mode=mode)
