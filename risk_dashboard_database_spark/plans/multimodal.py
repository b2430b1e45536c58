"""Multimodal column handling (brief §extras): opaque binary payloads
with typed metadata, decode / feature-extraction plumbing as
Arrow-batched mapInPandas.

The container has no image/audio libraries and the testdata carries no
real media, so:

- the binary payloads are deterministic (utf-8 bytes of document
  text), making every metadata query oracle-checkable;
- the DECODE step is stubbed: `decode_media` raises
  NotImplementedError for real codecs and provides a deterministic
  fake for 'fake/deterministic' payloads. The Spark-side plumbing —
  binary column schema, mapInPandas batch shape, partition behavior —
  is real and tested.

Scale notes: m1 is a narrow per-row projection over binary columns
(no shuffle); m2's mapInPandas is the one Python stage in the whole
engine beside o7 — Arrow-batched, stateless, linear, exactly how a
real decoder would run across 100 TB of media shards.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from .registry import query


@query(
    "m1_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           sha256(text) AS content_sha256,
           hex(encode(substr(text, 1, 4))) AS magic_hex,
           CASE WHEN substr(text, 1, 4) = 'key ' THEN 'KEY0'
                WHEN octet_length(encode(text)) % 3 = 0 THEN 'IMG'
                WHEN octet_length(encode(text)) % 3 = 1 THEN 'AUD'
                ELSE 'VID' END AS media_type
    FROM documents
    """,
)
def m1_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column + typed metadata (m1): payload = utf-8 bytes,
    metadata = byte length, sha256 content hash, magic-prefix hex, and
    a deterministic media-type classification from the magic bytes —
    the schema shape a real media lake uses (binary + typed metadata
    columns, media-type-partitioned at scale)."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    byte_len = F.octet_length(payload)
    return docs.select(
        "doc_id",
        byte_len.cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha256"),
        F.hex(F.encode(F.substring(F.col("text"), 1, 4), "utf-8")).alias("magic_hex"),
        _media_type(F.col("text"), byte_len).alias("media_type"),
    )


def _media_type(text: F.Column, byte_len: F.Column) -> F.Column:
    """THE magic-byte media-type rule — one Spark definition shared by
    m1 and m6 (the streaming modality gate mirrors it in its Python
    fold, pinned by replay==batch parity; the oracles carry the SQL
    text). A rule change edits HERE plus the oracle strings — not
    five call sites (code-review r11)."""
    return (
        F.when(F.substring(text, 1, 4) == "key ", "KEY0")
        .when(byte_len % 3 == 0, "IMG")
        .when(byte_len % 3 == 1, "AUD")
        .otherwise("VID")
    )


def decode_media(payload: bytes, codec: str) -> dict:
    """Decode stub: deterministic fake for 'fake/deterministic';
    real codecs are NOT implemented in this container (no PIL/ffmpeg)
    and raise so callers fail loudly rather than silently fake."""
    if codec == "fake/deterministic":
        n = len(payload)
        return {
            "width": 16 + n % 624,
            "height": 16 + (n * 7) % 464,
            "n_frames": 1 + n % 30,
        }
    raise NotImplementedError(
        f"codec {codec!r}: media decoding requires image/audio libraries "
        "not present in this environment. Plug-in point: add a branch "
        "for your codec in decode_media in "
        "risk_dashboard_database_spark.plans.multimodal returning "
        "{width, height, n_frames} (e.g. via PIL / av); the mapInPandas "
        "batch shape in m2_decode_features stays as-is"
    )


@query(
    "m2_decode_features",
    oracle="""
    WITH meta AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    )
    SELECT doc_id,
           CAST(16 + n % 624 AS INTEGER) AS width,
           CAST(16 + (n * 7) % 464 AS INTEGER) AS height,
           CAST(1 + n % 30 AS INTEGER) AS n_frames,
           CAST(LEAST(4, 1 + n % 30) AS INTEGER) AS sampled_frames
    FROM meta
    """,
)
def m2_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode plumbing (m2): Arrow batches of binary
    payloads run through the decode stub, emitting typed feature
    columns (width/height/frame-count/sample plan). The oracle
    recomputes the deterministic fake arithmetic in SQL, so the whole
    Python batch path — schema, batch iteration, null handling — is
    value-checked, not just row-counted."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode_media(bytes(p), "fake/deterministic") for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_frames": [f["n_frames"] for f in feats],
                    "sampled_frames": [min(4, f["n_frames"]) for f in feats],
                }
            )
            yield out

    return src.mapInPandas(
        run,
        schema="doc_id long, width int, height int, n_frames int, sampled_frames int",
    )


@query(
    "m3_frame_resize",
    oracle="""
    WITH meta AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id,
             16 + n % 624 AS w,
             16 + (n * 7) % 464 AS h,
             1 + n % 30 AS nf
      FROM meta
    ),
    sampled AS (SELECT *, LEAST(4, nf) AS ns FROM dims),
    frames AS (
      SELECT doc_id, w, h, nf, ns, i
      FROM sampled, UNNEST(range(0, ns)) AS t(i)
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(CAST(i AS BIGINT) * nf // ns AS INTEGER) AS source_frame,
           CAST(CASE WHEN w >= h THEN 224
                     ELSE FLOOR(w * 224.0 / h) END AS INTEGER) AS out_w,
           CAST(CASE WHEN w >= h THEN FLOOR(h * 224.0 / w)
                     ELSE 224 END AS INTEGER) AS out_h
    FROM frames
    """,
)
def m3_frame_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling + resize plumbing (m3): the mapInPandas stage
    FANS OUT — one output row per sampled frame (evenly spaced source
    indices, i*n_frames//n_sampled), each with aspect-preserving
    fit-to-224 output dims. This is the grain change a real
    video-preprocessing stage performs inside the Arrow batch (N rows
    in, sum(sampled_frames) rows out); the resize itself is stubbed to
    its dimension arithmetic (no codecs in this container), which the
    oracle re-derives exactly — including the IEEE double floor, spelled
    with the same operation order on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                f = decode_media(bytes(p), "fake/deterministic")
                w, h, nf = f["width"], f["height"], f["n_frames"]
                ns = min(4, nf)
                for i in range(ns):
                    out_w = 224 if w >= h else int(w * 224.0 / h)
                    out_h = int(h * 224.0 / w) if w >= h else 224
                    rows.append((doc_id, i, (i * nf) // ns, out_w, out_h))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "source_frame", "out_w", "out_h"],
            )

    return src.mapInPandas(
        run,
        schema="doc_id long, frame_idx int, source_frame int, out_w int, out_h int",
    )


@query(
    "m4_payload_dedup",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             sha256(text) AS content_sha256,
             CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      FROM documents
    )
    SELECT content_sha256,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc,
           CAST(any_value(byte_len) AS BIGINT) AS payload_bytes,
           CAST((COUNT(*) - 1) * any_value(byte_len) AS BIGINT)
             AS bytes_saved
    FROM p GROUP BY content_sha256
    """,
)
def m4_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed payload dedup (m4): the storage-side exact
    dedup every media lake runs before the near-dup passes — group
    binary payloads by sha256, keep the first-seen copy (min doc_id,
    d1's deterministic canonical convention), report the bytes a
    content-addressed store saves.

    One hash-agg over a narrow (hash, byte_len) projection — d1's
    shape on binary columns; at 100 TB the shuffle carries ~32 bytes x
    distinct payloads. byte_len rides any_value because copies of one
    sha256 are byte-identical by definition."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    p = docs.select(
        "doc_id",
        F.sha2(payload, 256).alias("content_sha256"),
        F.octet_length(payload).cast("long").alias("byte_len"),
    )
    return p.groupBy("content_sha256").agg(
        F.count("*").cast("long").alias("n_copies"),
        F.min("doc_id").cast("long").alias("canonical_doc"),
        F.any_value("byte_len").cast("long").alias("payload_bytes"),
        ((F.count("*") - 1) * F.any_value("byte_len"))
        .cast("long")
        .alias("bytes_saved"),
    )


_M5_ORACLE = """
    WITH meta AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    dims AS (
      SELECT doc_id, text, 1 + n % 30 AS nf,
             LEAST(4, 1 + n % 30) AS ns
      FROM meta
    ),
    frames AS (
      SELECT doc_id, ns, i,
             CAST(i AS BIGINT) * nf // ns AS source_frame
      FROM dims, UNNEST(range(0, ns)) AS t(i)
    ),
    fps AS (
      SELECT f.doc_id, f.ns,
             md5(substr(d.text,
                        CAST(1 + (f.source_frame * 17)
                             % GREATEST(length(d.text) - 11, 1) AS INTEGER),
                        12)) AS fp
      FROM frames f JOIN dims d USING (doc_id)
    ),
    shared AS (
      SELECT fp FROM fps GROUP BY fp
      HAVING MIN(doc_id) <> MAX(doc_id)
    ),
    hits AS (
      SELECT doc_id, COUNT(*) AS dup_frames
      FROM fps WHERE fp IN (SELECT fp FROM shared)
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.ns AS BIGINT) AS sampled_frames,
           CAST(COALESCE(h.dup_frames, 0) AS BIGINT) AS dup_frames,
           CAST((COALESCE(h.dup_frames, 0) * 1000000) // d.ns AS BIGINT)
             AS dup_ppm
    FROM dims d LEFT JOIN hits h USING (doc_id)
    """


def _video_dims(docs: DataFrame) -> DataFrame:
    """(doc_id, text, nf, ns): the deterministic fake codec's frame
    count and m3's sample count per video. One definition for batch m5
    and the streaming frame gate."""
    payload = F.encode(F.col("text"), "utf-8")
    n = F.octet_length(payload)
    nf = (F.lit(1) + n % 30).cast("long")
    ns = F.least(F.lit(4).cast("long"), nf)
    return docs.select("doc_id", "text", nf.alias("nf"), ns.alias("ns"))


def frame_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, ns, fp): one fingerprint row per sampled frame — THE
    frame-identity convention of the m-family (m3's sampling plan, the
    fake codec's 12-byte payload slice, md5 fingerprint; a real
    deployment swaps in a pHash at the decode seam). Works identically
    on batch and streaming DataFrames; shared by batch m5 and
    streaming/framegate.py so the convention can never fork."""
    dims = _video_dims(docs)
    src_frame = F.expr("i * nf div ns")
    off = (
        F.lit(1)
        + (src_frame * 17) % F.greatest(F.length("text") - 11, F.lit(1))
    ).cast("int")
    return (
        dims.select(
            "doc_id",
            "text",
            "nf",
            "ns",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("ns") - 1)).alias("i"),
        )
        .select(
            "doc_id",
            "ns",
            F.md5(F.col("text").substr(off, F.lit(12))).alias("fp"),
        )
    )


def shared_frame_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprints appearing in >= 2 distinct videos (fp) — the
    cross-video dictionary, ONE map-side-combinable min!=max agg.
    Shared by batch m5 and the streaming frame gate."""
    fps = frame_fingerprints(load_table(spark, sf_dir, "documents"))
    return (
        fps.groupBy("fp")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .select("fp")
    )


@query("m5_frame_dedup", oracle=_M5_ORACLE)
def m5_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video frame-level dedup (m5): the video-pipeline analog of
    d30's span dedup — sample frames with m3's plan, fingerprint each
    frame, and report per video how many of its sampled frames also
    appear in ANOTHER video (intro cards, shared b-roll, rebroadcasts).
    With the container's deterministic fake codec a frame's
    "content" is a 12-byte payload slice addressed by the source frame
    index, so the whole pipeline is oracle-checkable end-to-end; a real
    deployment swaps the fingerprint column for a perceptual hash
    (pHash) computed in decode_media's mapInPandas seam — the plan
    around it (frame explode, fingerprint agg, join-back) is unchanged.

    Spark shape: frame fan-out is a per-row generate (m3's zero-
    exchange pattern); the shared-frame flag is ONE fingerprint-keyed
    map-side-combinable min!=max agg (d30's trick at frame grain); the
    join-back + per-video agg and the final left join mirror d30. At
    100 TB of video the fingerprint relation is frames x 48 bytes —
    the only corpus-scale exchange."""
    docs = load_table(spark, sf_dir, "documents")
    fps = frame_fingerprints(docs)
    shared = shared_frame_fps(spark, sf_dir)
    hits = fps.join(shared, "fp").groupBy("doc_id").agg(
        F.count("*").cast("long").alias("dup_frames")
    )
    return (
        _video_dims(docs).select("doc_id", "ns")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("ns").cast("long").alias("sampled_frames"),
            F.coalesce("dup_frames", F.lit(0)).cast("long").alias("dup_frames"),
            F.expr("(coalesce(dup_frames, 0) * 1000000) div ns")
            .cast("long")
            .alias("dup_ppm"),
        )
    )


# ----------------------------------------------------------------- m6
# Modality-mix dataset card — the multimodal twin of d33's text card:
# per (source, media type), item and byte budgets plus each modality's
# byte share within its source. A multimodal training build reads this
# table to set modality sampling ratios (and to catch a feed that
# silently stopped delivering one modality) BEFORE paying for decode.


@query(
    "m6_modality_mix",
    oracle="""
    WITH typed AS (
      SELECT source,
             CASE WHEN substr(text, 1, 4) = 'key ' THEN 'KEY0'
                  WHEN octet_length(encode(text)) % 3 = 0 THEN 'IMG'
                  WHEN octet_length(encode(text)) % 3 = 1 THEN 'AUD'
                  ELSE 'VID' END AS media_type,
             octet_length(encode(text)) AS b
      FROM documents
    ),
    g AS (
      SELECT source, media_type,
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(b) AS BIGINT) AS total_bytes
      FROM typed GROUP BY source, media_type
    )
    SELECT source, media_type, n_items, total_bytes,
           CAST(CASE WHEN SUM(total_bytes) OVER (PARTITION BY source) = 0
                THEN 0 ELSE (total_bytes * 1000000)
                // SUM(total_bytes) OVER (PARTITION BY source) END AS BIGINT)
             AS byte_share_ppm
    FROM g
    """,
)
def m6_modality_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, media type): item count, byte budget, and the
    modality's byte share (integer ppm) within its source — m1's
    magic-byte classification aggregated into the sampling-ratio card.

    Spark shape: ONE narrow scan (source + byte length + the m1
    media-type CASE — no payload decode), one map-side-combinable
    (source, media_type) agg to a sources-x-4 frame, and the share via
    a window over that tiny frame (the d54 discipline). Byte sums are
    integer-exact; at 100 TB this is a metadata-column scan with a
    dictionary-sized shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    byte_len = F.octet_length(payload)
    media_type = _media_type(F.col("text"), byte_len)
    g = (
        docs.select(
            "source",
            media_type.alias("media_type"),
            byte_len.cast("long").alias("b"),
        )
        .groupBy("source", "media_type")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("b").cast("long").alias("total_bytes"),
        )
    )
    from pyspark.sql.window import Window

    w_src = Window.partitionBy("source")
    return g.withColumn(
        "__src_bytes", F.sum("total_bytes").over(w_src)
    ).select(
        "source",
        "media_type",
        "n_items",
        "total_bytes",
        # a source whose every payload is empty would zero the window
        # sum — impossible here (n_chars >= 1) but the guard keeps the
        # query ANSI-safe on arbitrary data
        F.expr(
            "IF(__src_bytes = 0, 0, (total_bytes * 1000000) div __src_bytes)"
        )
        .cast("long")
        .alias("byte_share_ppm"),
    )


# ----------------------------------------------------------------- m7
# WebDataset-style shard packing — the storage-layout op a multimodal
# corpus build runs last: binary payloads can't split across files
# (unlike d12's token stream), so each item lands in the shard where
# its FIRST byte falls on the per-stream byte axis, and a shard whose
# last item straddles the boundary (or whose single item exceeds the
# budget outright) runs over — DISCLOSED per shard (the d59 sentinel
# discipline), because a shard writer must know which files will be
# oversized, not have them silently vanish into the next shard's
# accounting. Streams (doc_id mod M within each source) are the
# parallelism knob, exactly d12's PACK_SHARDS stance: the cumulative
# byte axis is per (source, stream), so no single-task corpus sort.

M7_SHARD_BYTES = 4096  # shard byte budget
M7_STREAMS = 4         # parallel packing streams per source


@query(
    "m7_shard_pack",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             doc_id % {M7_STREAMS} AS stream,
             octet_length(encode(text)) AS b
      FROM documents
    ),
    c AS (
      SELECT source, stream, doc_id, b,
             CAST(COALESCE(SUM(b) OVER (
               PARTITION BY source, stream ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_prev
      FROM t
    )
    SELECT source,
           CAST(stream AS BIGINT) AS stream,
           cum_prev // {M7_SHARD_BYTES} AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(b) AS BIGINT) AS payload_bytes,
           CAST((SUM(b) * 1000000) // {M7_SHARD_BYTES} AS BIGINT) AS fill_ppm,
           CAST(CASE WHEN SUM(b) > {M7_SHARD_BYTES} THEN 1 ELSE 0 END
                AS BIGINT) AS over_budget
    FROM c
    GROUP BY source, stream, cum_prev // {M7_SHARD_BYTES}
    """,
)
def m7_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, stream, shard) packing card: item count, payload
    bytes, fill ratio vs the byte budget (ppm), and the over-budget
    disclosure flag.

    Spark shape: one narrow scan (source, doc_id, byte length — no
    payload decode), ONE (source, stream)-keyed exchange whose window
    computes the exclusive running byte offset (the d12 boundary
    trick: shard id = prev-bytes div budget — pure integer math, no
    iterative fold), then the shard census aggregates on the SAME
    partitioning (exchange reused). Streams bound each window task's
    sort to corpus/(sources x M) rows; M is a workload parameter a
    100 TB deployment raises with the cluster, not a semantic."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        "doc_id",
        (F.col("doc_id") % M7_STREAMS).alias("stream"),
        F.octet_length(F.encode(F.col("text"), "utf-8")).cast("long").alias("b"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source", "stream")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.withColumn(
        "cum_prev", F.coalesce(F.sum("b").over(w), F.lit(0)).cast("long")
    )
    return (
        c.groupBy(
            "source",
            F.col("stream").cast("long").alias("stream"),
            F.expr(f"cum_prev div {M7_SHARD_BYTES}").alias("shard"),
        )
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("b").cast("long").alias("payload_bytes"),
        )
        .select(
            "source",
            "stream",
            "shard",
            "n_items",
            "payload_bytes",
            F.expr(f"(payload_bytes * 1000000) div {M7_SHARD_BYTES}")
            .cast("long")
            .alias("fill_ppm"),
            F.when(F.col("payload_bytes") > M7_SHARD_BYTES, 1)
            .otherwise(0)
            .cast("long")
            .alias("over_budget"),
        )
    )


# ------------------------------------------------------------------ m8
# Byte-level payload screening — the binary analytics a media lake can
# run WITHOUT decoding: per-payload byte histogram stats (distinct
# byte values, modal-byte concentration) rolled up per media type.
# A payload whose single most frequent byte owns >20% of its bytes is
# flagged uniformity-suspect (truncated/zero-padded/corrupt files look
# exactly like this; real compressed media is near-uniform). Unlike
# m2's decode seam this needs NO codec — it runs on real bytes today.
M8_TOP_SHARE_PPM = 200_000  # modal byte > 20% of payload -> suspect
M8_MIN_BYTES = 16           # ignore trivially short payloads


@query(
    "m8_payload_byte_stats",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             CASE WHEN substr(text, 1, 4) = 'key ' THEN 'KEY0'
                  WHEN octet_length(encode(text)) % 3 = 0 THEN 'IMG'
                  WHEN octet_length(encode(text)) % 3 = 1 THEN 'AUD'
                  ELSE 'VID' END AS media_type,
             regexp_extract_all(hex(encode(text)), '..') AS bytes_hex
      FROM documents
    ),
    per_byte AS (
      SELECT doc_id, unnest(bytes_hex) AS b FROM p
    ),
    counts AS (
      SELECT doc_id, b, COUNT(*) AS c FROM per_byte GROUP BY doc_id, b
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS distinct_bytes,
             CAST(MAX(c) AS BIGINT) AS top_count
      FROM counts GROUP BY doc_id
    )
    SELECT p.media_type,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(p.n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(d.distinct_bytes) AS BIGINT) AS sum_distinct_bytes,
           CAST(SUM(CASE WHEN p.n_bytes >= {M8_MIN_BYTES}
                          AND d.top_count * 1000000
                              > {M8_TOP_SHARE_PPM} * p.n_bytes
                         THEN 1 ELSE 0 END) AS BIGINT) AS uniform_suspect,
           CAST(SUM(CASE WHEN p.n_bytes >= {M8_MIN_BYTES}
                          AND d.top_count * 1000000
                              > {M8_TOP_SHARE_PPM} * p.n_bytes
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS uniform_suspect_ppm
    FROM p JOIN per_doc d USING (doc_id)
    GROUP BY p.media_type
    """,
)
def m8_payload_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per media type: payload count, total bytes, summed distinct
    byte values, and the uniformity-suspect count/ppm (modal byte
    > {M8_TOP_SHARE_PPM} ppm of a >= {M8_MIN_BYTES}-byte payload —
    the decode-free corruption screen). The threshold compare is the
    cross-multiplied integer form (top * 1e6 > ppm * n_bytes), so no
    division ever runs on a zero-length payload and every value is
    BIGINT-exact on both engines.

    Spark shape (OPTIMIZATION r14, guide §4.2): per-row byte
    histograms run as numpy `bincount` over the raw payload bytes
    inside a `mapInArrow` stage — the per-byte work is one vectorized
    native pass instead of the first-shipped hex() ->
    regexp_extract_all('..') -> array_sort -> interpreted aggregate()
    fold, which allocated a 2-char STRING per payload byte and was
    measured as the whole cost of the query (A/B at sf0.1: 2.27 s ->
    0.42 s min solo for identical output; plan diff: the two
    per-row Project walls collapse into one PythonMapInArrow node).
    Only `text` crosses the boundary (explicit select, guide §4.1),
    and each Arrow batch returns at most 4 PARTIAL rollup rows
    (media_type, n, tb, db, sus) — map-side aggregation in the
    Python stage — so the one Exchange still moves ~4 rows per
    partition. NULL semantics mirror the JVM form exactly: a NULL
    payload classifies ELSE->'VID', contributes legacy size(NULL)=-1
    to sum_distinct_bytes, NULL n_bytes/top_count skip the sums (the
    driver corpus has no NULL text; pinned by the brute-force parity
    test either way). At 100 TB this is one scan of the binary
    column, per-row work linear in payload bytes, unchanged."""
    docs = load_table(spark, sf_dir, "documents")

    def _byte_stats(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("media_type", pa.string()),
                ("n", pa.int64()),
                ("tb", pa.int64()),
                ("db", pa.int64()),
                ("sus", pa.int64()),
            ]
        )
        for batch in batches:
            agg: dict[str, list[int]] = {}
            for s in batch.column(0).to_pylist():
                if s is None:
                    a = agg.setdefault("VID", [0, 0, 0, 0])
                    a[0] += 1
                    a[2] += -1  # legacy size(array_distinct(NULL)) = -1
                    continue
                b = s.encode("utf-8")
                n = len(b)
                if s[:4] == "key ":
                    m = "KEY0"
                elif n % 3 == 0:
                    m = "IMG"
                elif n % 3 == 1:
                    m = "AUD"
                else:
                    m = "VID"
                if n:
                    counts = np.bincount(np.frombuffer(b, np.uint8))
                    distinct = int(np.count_nonzero(counts))
                    top = int(counts.max())
                else:
                    distinct = 0
                    top = 0
                a = agg.setdefault(m, [0, 0, 0, 0])
                a[0] += 1
                a[1] += n
                a[2] += distinct
                if n >= M8_MIN_BYTES and top * 1000000 > M8_TOP_SHARE_PPM * n:
                    a[3] += 1
            if agg:
                yield pa.RecordBatch.from_pylist(
                    [
                        {
                            "media_type": m,
                            "n": v[0],
                            "tb": v[1],
                            "db": v[2],
                            "sus": v[3],
                        }
                        for m, v in agg.items()
                    ],
                    schema=out_schema,
                )

    part = docs.select("text").mapInArrow(
        _byte_stats, "media_type string, n long, tb long, db long, sus long"
    )
    return part.groupBy("media_type").agg(
        F.sum("n").cast("long").alias("n_payloads"),
        F.sum("tb").cast("long").alias("total_bytes"),
        F.sum("db").cast("long").alias("sum_distinct_bytes"),
        F.sum("sus").cast("long").alias("uniform_suspect"),
        F.expr("CAST(SUM(sus) * 1000000 DIV SUM(n) AS BIGINT)").alias(
            "uniform_suspect_ppm"
        ),
    )
