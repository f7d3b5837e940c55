"""Registered queries + DuckDB oracle shadows (the driver contract).

Each entry pairs a Spark DataFrame program with an ANSI-SQL equivalent the
DuckDB oracle runs on the same parquet tables (SURVEY.md §5.2.5).  The
relational queries shadow the engine's physical primitives:

  q1_pricing_summary   partial+final hash aggregation      (O4)
  q_stump_scoring      broadcast join + hash agg scoring    (C3)
  q_window_dedup       lag window + Levenshtein consecutive dedup (R3)
  q_top1_per_group     closest-sibling top-1 window          (G2)
  q_pair_range_join    theta self-join with band predicates  (G1)
  q_nms_running_max    ancestor-path running max             (D8)
  q_broadcast_dim_join broadcast dimension join              (C3)

plus the training-data operators (dedup exact/minhash/jaccard/simhash, ANN
cosine top-k, token stats, quality score, language ID) over the
``documents`` / ``embeddings`` tables, and the extraction pipeline itself
checked byte-for-byte against committed goldens.

Column names are aliased identically on both sides; floats are rounded on
both sides so value hashes match.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

FIXTURES_DIR = "/root/repo/data/fixtures"
ORACLE_DOCS = os.path.join(FIXTURES_DIR, "documents_oracle.parquet")
PART_DOCS = os.path.join(FIXTURES_DIR, "documents_part")
N_ORACLE_DOCS = 200


# tiny inline stump table used by the scoring shadow (same shape as the
# broadcast NM tables: var, le, left_val, right_val)
SHADOW_STUMPS = [
    (0, 100.0, -0.5, 0.3), (0, 200.0, -0.2, 0.4), (0, 400.0, 0.1, 0.6),
    (0, 800.0, 0.2, -0.1), (1, 10.0, -0.4, 0.2), (1, 30.0, -0.1, 0.5),
    (1, 60.0, 0.3, -0.2), (1, 90.0, 0.1, -0.3),
]


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# shared memoized reader with the scan-parallelism fan-out for the
# row-heavy tables (see dataset_queries._tbl — single-row-group parquet
# cannot split, so CPU-heavy map stages would otherwise run one-task)
from .dataset_queries import _tbl  # noqa: E402


def ensure_fixture_corpus() -> None:
    """Generate (once) the committed fixture corpora used by the
    extraction queries; deterministic, so regeneration is a no-op."""
    from ..sources.fixtures import write_documents

    if not os.path.exists(ORACLE_DOCS):
        write_documents(ORACLE_DOCS, N_ORACLE_DOCS)
    if not os.path.exists(PART_DOCS):
        write_documents(PART_DOCS, N_ORACLE_DOCS, partition_by_day=True)


# --------------------------------------------------------------------------
# extraction pipeline (flagship)
# --------------------------------------------------------------------------

def extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full detect->classify->recognize->dedup over the fixture corpus;
    oracle = the committed golden text per url (byte-identity gate)."""
    from ..operators.extract import extract_documents

    ensure_fixture_corpus()
    docs = spark.read.parquet(ORACLE_DOCS)
    out = extract_documents(docs, spark)
    return out.select("url", "extracted_text")


def extract_pipeline_sql() -> str:
    return (f"SELECT url, text AS extracted_text FROM '{ORACLE_DOCS}'")


REGIONS_CHANNEL_GOLDEN = os.path.join(
    FIXTURES_DIR, "regions_by_channel_golden.parquet")


def q_regions_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-channel region census over the fixture corpus (D1): the same
    documents scanned on the content polarity (channel 0) and the
    negative link polarity (channel 1, cascade.invert_link_polarity),
    aggregated to (channel, n_regions, n_local_maxima, sum_prob).

    Oracle = a committed golden parquet (pinned once, regeneration is
    deterministic); the non-circular behavioral evidence for channel 1 —
    that it recovers link-structured content channel 0 misses — lives in
    tests/test_channels.py against hand-authored fixtures."""
    from ..operators.regions import extract_regions

    ensure_fixture_corpus()
    docs = spark.read.parquet(ORACLE_DOCS)
    regs = extract_regions(docs, spark, channels=(0, 1))
    return (
        regs.groupBy("channel")
        .agg(F.count("*").alias("n_regions"),
             F.sum(F.col("local_maxima").cast("int")).cast("bigint")
              .alias("n_local_maxima"),
             F.round(F.sum("probability"), 4).alias("sum_prob"))
    )


def q_regions_by_channel_sql() -> str:
    return (
        "SELECT CAST(channel AS TINYINT) AS channel, n_regions, "
        "n_local_maxima, sum_prob "
        f"FROM '{REGIONS_CHANNEL_GOLDEN}'"
    )


def ensure_regions_channel_golden(spark: SparkSession) -> None:
    """Write the golden census once (idempotent; committed in git)."""
    if os.path.exists(REGIONS_CHANNEL_GOLDEN):
        return
    df = q_regions_by_channel(spark, "")
    df.toPandas().astype(
        {"channel": "int8", "n_regions": "int64",
         "n_local_maxima": "int64", "sum_prob": "float64"}
    ).to_parquet(REGIONS_CHANNEL_GOLDEN, index=False)


def partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning on warc_dt=date(warc_ts) (north_rule): the scan
    must touch only the matching day directories (asserted in tests)."""
    ensure_fixture_corpus()
    df = spark.read.parquet(PART_DOCS)
    return (
        df.where(F.col("warc_dt").between("2025-01-01", "2025-01-02"))
        .groupBy(F.col("warc_dt").cast("string").alias("warc_dt"))
        .agg(F.count("*").alias("n_docs"),
             F.sum(F.length("text")).alias("golden_bytes"))
    )


def partition_prune_sql() -> str:
    return (
        # CAST the sum: DuckDB's un-cast sum() returns HUGEINT (int128),
        # which value-hashes differently from Spark's BIGINT even when the
        # numbers are identical (round-1 hash mismatch, values verified equal)
        "SELECT CAST(warc_dt AS VARCHAR) AS warc_dt, count(*) AS n_docs, "
        "CAST(sum(length(text)) AS BIGINT) AS golden_bytes "
        f"FROM read_parquet('{PART_DOCS}/*/*.parquet', hive_partitioning=true) "
        "WHERE warc_dt BETWEEN DATE '2025-01-01' AND DATE '2025-01-02' "
        "GROUP BY 1"
    )


# --------------------------------------------------------------------------
# relational shadows over the TPC-H-ish tables
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash aggregation (O4 shadow)."""
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q1_pricing_summary_sql() -> str:
    return """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


def q_stump_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast stump join + hash-agg vote summation (C3 relational
    shadow): rows CROSS JOIN broadcast(stumps) -> CASE -> sum per row."""
    docs = _tbl(spark, sf_dir, "documents")
    stumps = spark.createDataFrame(
        SHADOW_STUMPS, "var int, le double, left_val double, right_val double")
    feats = docs.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("f0"),
        F.size(F.split(F.col("text"), " ")).cast("double").alias("f1"),
    )
    scored = feats.crossJoin(F.broadcast(stumps)).select(
        "doc_id",
        F.when(
            F.when(F.col("var") == 0, F.col("f0")).otherwise(F.col("f1"))
            <= F.col("le"), F.col("left_val")
        ).otherwise(F.col("right_val")).alias("vote"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("vote"), 6).alias("votes"))
    )


def q_stump_scoring_sql() -> str:
    vals = ", ".join(f"({v}, {le}, {l}, {r})" for v, le, l, r in SHADOW_STUMPS)
    return f"""
    WITH stumps(var, le, left_val, right_val) AS (VALUES {vals}),
    feats AS (
      SELECT doc_id, CAST(n_chars AS DOUBLE) AS f0,
             CAST(length(string_split(text, ' ')) AS DOUBLE) AS f1
      FROM documents
    )
    SELECT doc_id,
           round(sum(CASE WHEN (CASE WHEN var = 0 THEN f0 ELSE f1 END) <= le
                          THEN left_val ELSE right_val END), 6) AS votes
    FROM feats CROSS JOIN stumps
    GROUP BY doc_id
    """


def _ref_nm1_rows() -> list[dict]:
    import json

    from ..sources.distill import MODELS_DIR
    with open(os.path.join(MODELS_DIR, "stumps_ref_nm1.json")) as f:
        return json.load(f)


def q_stump_scoring_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL distilled reference ensemble (S3/S4: 100 stumps decoded
    from /root/reference/trained_classifierNM1.xml by sources/distill.py)
    scoring a deterministic 4-feature projection of the documents table —
    same broadcast-join + hash-agg plan as q_stump_scoring, but the stump
    values are the reference's learned ones, so the correctness gate
    exercises the full decode path end to end."""
    docs = _tbl(spark, sf_dir, "documents")
    stumps = spark.createDataFrame(
        [(r["var"], r["le"], r["left_val"], r["right_val"])
         for r in _ref_nm1_rows()],
        "var int, le double, left_val double, right_val double")
    # deterministic stand-ins spanning the reference features' ranges
    # (aspect ratio ~0-10, compactness 0-1, holes 0-2, crossings 0-10)
    feats = docs.select(
        "doc_id",
        (F.col("n_chars") % 997 / 100.0).alias("f0"),
        (F.size(F.split("text", " ")) / (F.col("n_chars") + 1.0)).alias("f1"),
        (F.col("doc_id") % 3).cast("double").alias("f2"),
        (F.col("doc_id") % 7 / 2.0).alias("f3"),
    )
    feat = (
        F.when(F.col("var") == 0, F.col("f0"))
        .when(F.col("var") == 1, F.col("f1"))
        .when(F.col("var") == 2, F.col("f2"))
        .otherwise(F.col("f3"))
    )
    scored = feats.crossJoin(F.broadcast(stumps)).select(
        "doc_id",
        F.when(feat <= F.col("le"), F.col("left_val"))
         .otherwise(F.col("right_val")).alias("vote"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("vote"), 6).alias("ref_votes"))
    )


def q_stump_scoring_ref_sql() -> str:
    vals = ", ".join(
        f"({r['var']}, {r['le']!r}, {r['left_val']!r}, {r['right_val']!r})"
        for r in _ref_nm1_rows())
    return f"""
    WITH stumps(var, le, left_val, right_val) AS (VALUES {vals}),
    feats AS (
      SELECT doc_id,
             n_chars % 997 / 100.0 AS f0,
             length(string_split(text, ' ')) / (n_chars + 1.0) AS f1,
             CAST(doc_id % 3 AS DOUBLE) AS f2,
             doc_id % 7 / 2.0 AS f3
      FROM documents
    )
    SELECT doc_id,
           round(sum(CASE WHEN (CASE WHEN var = 0 THEN f0
                                     WHEN var = 1 THEN f1
                                     WHEN var = 2 THEN f2
                                     ELSE f3 END) <= le
                          THEN left_val ELSE right_val END), 6) AS ref_votes
    FROM feats CROSS JOIN stumps
    GROUP BY doc_id
    """


def q_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-dedup relational shadow (R3): lag window + Levenshtein
    similarity vs previous doc within each source stream."""
    docs = _tbl(spark, sf_dir, "documents", fanout=False)
    w = Window.partitionBy("source").orderBy("doc_id")
    prefix = F.substring(F.col("text"), 1, 64)
    prev = F.lag(prefix).over(w)
    d = docs.select(
        "doc_id", "source", prefix.alias("cur"), prev.alias("prev"))
    sim = (
        F.lit(1.0)
        - F.levenshtein("cur", "prev")
        / F.greatest(F.length("cur"), F.length("prev"))
    )
    return (
        d.withColumn(
            "is_dup",
            F.when(F.col("prev").isNull(), F.lit(False)).otherwise(sim >= 0.85),
        )
        .select("doc_id", "source", "is_dup")
    )


def q_window_dedup_sql() -> str:
    return """
    WITH d AS (
      SELECT doc_id, source, substring(text, 1, 64) AS cur,
             lag(substring(text, 1, 64)) OVER
               (PARTITION BY source ORDER BY doc_id) AS prev
      FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN prev IS NULL THEN false
                ELSE (1.0 - CAST(levenshtein(cur, prev) AS DOUBLE)
                      / greatest(length(cur), length(prev))) >= 0.85
           END AS is_dup
    FROM d
    """


def q_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest-sibling top-1-per-group shadow (G2)."""
    orders = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey",
                F.round("o_totalprice", 2).alias("top_price"))
    )


def q_top1_per_group_sql() -> str:
    return """
    SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS top_price
    FROM (
      SELECT *, row_number() OVER
        (PARTITION BY o_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    """


def q_pair_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-gate theta self-join shadow (G1): equi key + band predicate
    (events of the same user within a 10-minute forward window)."""
    ev = _tbl(spark, sf_dir, "events", fanout=False)
    a = ev.alias("a")
    b = ev.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    return (
        pairs.groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count("*").alias("n_pairs"))
    )


def q_pair_range_join_sql() -> str:
    return """
    SELECT a.user_id AS user_id, count(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
    GROUP BY a.user_id
    """


def q_triplet_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet gap-consistency shadow (G3, isValidTriplet analog): the
    pair-JOIN-pair-on-shared-middle expressed relationally — each event
    with its predecessor and successor (lag/lead) forms the triplet; the
    chained gaps pass iff max <= TOL + RATIO * max(0, min), the
    gaps_consistent gate the in-stage grouping applies.  One shuffle
    (window partition by user), counts aggregated per user."""
    from ..config import TRIPLET_GAP_TOLERANCE, TRIPLET_MAX_GAP_RATIO

    ev = _tbl(spark, sf_dir, "events", fanout=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g1 = us - F.lag(us).over(w)
    g2 = F.lead(us).over(w) - us
    lo, hi = F.least(g1, g2), F.greatest(g1, g2)
    consistent = hi <= (F.lit(TRIPLET_GAP_TOLERANCE * 1_000_000)
                        + F.lit(TRIPLET_MAX_GAP_RATIO)
                        * F.greatest(lo, F.lit(0)))
    t = ev.select("user_id", "event_id",
                  consistent.alias("ok"), g1.alias("g1"), g2.alias("g2"))
    return (
        t.where(F.col("g1").isNotNull() & F.col("g2").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_triplets"),
             F.sum(F.col("ok").cast("int")).cast("bigint")
              .alias("n_consistent"))
    )


def q_triplet_consistency_sql() -> str:
    from ..config import TRIPLET_GAP_TOLERANCE, TRIPLET_MAX_GAP_RATIO

    tol = TRIPLET_GAP_TOLERANCE * 1_000_000
    return f"""
    WITH t AS (
      SELECT user_id, event_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS g1,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS g2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_triplets,
           CAST(sum(CASE WHEN greatest(g1, g2) <=
                              {tol} + {TRIPLET_MAX_GAP_RATIO}
                              * greatest(least(g1, g2), 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent
    FROM t
    WHERE g1 IS NOT NULL AND g2 IS NOT NULL
    GROUP BY user_id
    """


def q_sequence_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-compatibility shadow (G4, isValidSequence analog,
    erfilter.c:1131-1147): two chains merge only if SOME gap of one is
    consistent with SOME gap of the other.  Relationally: each user's
    event-gap set is a chain's gap profile; adjacent users (u, u+1) play
    the two chains; the EXISTS-a-consistent-pair test is a theta join on
    the gaps_consistent band predicate, aggregated to a per-pair count +
    boolean.  Mirrors the in-stage gate in operators/grouping.py
    (_gaps_behind x _gaps_ahead any-pair test)."""
    from ..config import TRIPLET_GAP_TOLERANCE, TRIPLET_MAX_GAP_RATIO

    ev = _tbl(spark, sf_dir, "events", fanout=False)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = us - F.lag(us).over(w)
    gaps = ev.select("user_id", g.alias("gap")).where(
        F.col("gap").isNotNull())
    a = gaps.alias("a")
    b = gaps.alias("b")
    lo = F.least(F.col("a.gap"), F.col("b.gap"))
    hi = F.greatest(F.col("a.gap"), F.col("b.gap"))
    ok = hi <= (F.lit(TRIPLET_GAP_TOLERANCE * 1_000_000)
                + F.lit(TRIPLET_MAX_GAP_RATIO) * F.greatest(lo, F.lit(0)))
    return (
        a.join(b, F.col("b.user_id") == F.col("a.user_id") + 1)
        .groupBy(F.col("a.user_id").alias("user_a"),
                 F.col("b.user_id").alias("user_b"))
        .agg(F.count("*").cast("bigint").alias("n_gap_pairs"),
             F.sum(ok.cast("int")).cast("bigint").alias("n_consistent"))
        .withColumn("compatible", F.col("n_consistent") > 0)
    )


def q_sequence_compat_sql() -> str:
    from ..config import TRIPLET_GAP_TOLERANCE, TRIPLET_MAX_GAP_RATIO

    tol = TRIPLET_GAP_TOLERANCE * 1_000_000
    return f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (SELECT * FROM gaps WHERE gap IS NOT NULL)
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           CAST(count(*) AS BIGINT) AS n_gap_pairs,
           CAST(sum(CASE WHEN greatest(a.gap, b.gap) <=
                              {tol} + {TRIPLET_MAX_GAP_RATIO}
                              * greatest(least(a.gap, b.gap), 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           sum(CASE WHEN greatest(a.gap, b.gap) <=
                         {tol} + {TRIPLET_MAX_GAP_RATIO}
                         * greatest(least(a.gap, b.gap), 0)
                    THEN 1 ELSE 0 END) > 0 AS compatible
    FROM g a JOIN g b ON b.user_id = a.user_id + 1
    GROUP BY a.user_id, b.user_id
    """


def q_nms_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor-path running-max shadow (D8): max/min over the path prefix."""
    ev = _tbl(spark, sf_dir, "events", fanout=False)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return ev.select(
        "user_id", "event_id",
        F.round(F.max("value").over(w), 6).alias("run_max"),
        F.round(F.min("value").over(w), 6).alias("run_min"),
    )


def q_nms_running_max_sql() -> str:
    return """
    SELECT user_id, event_id,
           round(max(value) OVER w, 6) AS run_max,
           round(min(value) OVER w, 6) AS run_min
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def q_stream_dedup_shadow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-equivalence shadow of the streaming stateful host dedup:
    documents recast as a per-host refetch stream (host = source,
    warc_ts = epoch + doc_id seconds) run through
    streaming.stateful_dedup.batch_host_dedup — the SAME prev-kept
    Levenshtein chain the applyInPandasWithState operator applies across
    micro-batches (stream == batch equality is asserted in
    tests/test_stream_batch_shadow.py; this entry gives the chain a full
    value-hash check against DuckDB)."""
    from ..streaming.stateful_dedup import batch_host_dedup

    docs = _tbl(spark, sf_dir, "documents", fanout=False)
    stream_like = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example/"),
                 F.col("doc_id").cast("string")).alias("url"),
        F.expr("timestampadd(SECOND, cast(doc_id as int), "
               "timestamp'2025-01-01 00:00:00')").alias("warc_ts"),
        F.col("text").alias("extracted_text"),
    )
    return batch_host_dedup(stream_like)


def q_stream_dedup_shadow_sql() -> str:
    from ..config import DEDUP_PREFIX_CHARS, DEDUP_SIM_THRESHOLD

    # the prev-KEPT chain is inherently sequential, so the oracle walks it
    # with a recursive CTE over per-host row numbers (depth = docs per
    # host).  NB a list-valued struct field inside DuckDB 1.0's
    # list_reduce loses its accumulated contents across iterations, so the
    # higher-order-function formulation Spark uses is not portable here.
    sim = ("(c.prev <> '' AND b.cur <> '' AND "
           "(1.0 - CAST(levenshtein(b.cur, c.prev) AS DOUBLE)"
           " / greatest(length(b.cur), length(c.prev))) >= "
           f"{DEDUP_SIM_THRESHOLD})")
    return f"""
    WITH RECURSIVE base AS (
      SELECT source || '.example' AS host,
             'https://' || source || '.example/' || CAST(doc_id AS VARCHAR)
               AS url,
             TIMESTAMP '2025-01-01 00:00:00' + doc_id * INTERVAL 1 SECOND
               AS ts,
             substring(coalesce(text, ''), 1, {DEDUP_PREFIX_CHARS}) AS cur,
             row_number() OVER (
               PARTITION BY source
               ORDER BY TIMESTAMP '2025-01-01 00:00:00'
                        + doc_id * INTERVAL 1 SECOND,
                        'https://' || source || '.example/'
                        || CAST(doc_id AS VARCHAR)) AS rn
      FROM documents
    ),
    chain AS (
      SELECT host, rn, url, cur,
             (cur <> '') AS kept,
             CASE WHEN cur <> '' THEN cur ELSE '' END AS prev
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.host, b.rn, b.url, b.cur,
             CASE WHEN {sim} THEN false ELSE (b.cur <> '') END AS kept,
             CASE WHEN {sim} OR b.cur = '' THEN c.prev ELSE b.cur END
               AS prev
      FROM chain c JOIN base b ON b.host = c.host AND b.rn = c.rn + 1
    )
    SELECT host, url, kept FROM chain
    """


def q_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dimension join shadow: revenue by part brand."""
    li = _tbl(spark, sf_dir, "lineitem")
    part = _tbl(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_broadcast_dim_join_sql() -> str:
    return """
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """


# --------------------------------------------------------------------------
# multi-way join analytics (TPC-H Q3 / Q5 / Q18 shapes over the driver
# tables — the relational breadth side of the engine: join ordering,
# broadcast dims, semi-join via HAVING, top-k under a 3-way join)
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (dates adapted to the synthetic 1995-2001 range):
    filter two sides BEFORE the joins (Catalyst pushes both predicates
    to the scans), 3-way join, agg, deterministic rounded top-10.
    Order dates ride as epoch millis so the oracle compare never
    touches timestamp formatting."""
    cust = _tbl(spark, sf_dir, "customer")
    orders = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    cut = "1998-01-01"
    revenue = F.round(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
    out = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders.where(F.col("o_orderdate") < cut),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(li.where(F.col("l_shipdate") > cut),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.unix_millis(F.col("o_orderdate").cast("timestamp"))
             .alias("o_date_ms"),
            "o_orderpriority")
    )
    return out.orderBy(F.desc("revenue"), F.asc("o_date_ms"),
                       F.asc("l_orderkey")).limit(10)


def q3_shipping_priority_sql() -> str:
    return """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           epoch_ms(o_orderdate) AS o_date_ms,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_date_ms ASC, l_orderkey ASC
    LIMIT 10
    """


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where customer and supplier must share
    a nation; region/nation are tiny broadcast dims, the local-supplier
    constraint (c_nationkey = s_nationkey) runs as a join residual."""
    cust = _tbl(spark, sf_dir, "customer")
    orders = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    supp = _tbl(spark, sf_dir, "supplier")
    nation = _tbl(spark, sf_dir, "nation")
    region = _tbl(spark, sf_dir, "region")
    return (
        cust
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .where((F.col("o_orderdate") >= "1996-01-01")
               & (F.col("o_orderdate") < "1997-01-01"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"))
    )


def q5_local_supplier_volume_sql() -> str:
    return """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-gated semi-join — the big-order key set
    is computed once (partial-agg'd) and joined back; only qualifying
    orders' lineitems aggregate a second time."""
    cust = _tbl(spark, sf_dir, "customer")
    orders = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("q"))
           .where(F.col("q") > 250)
           .select("l_orderkey"))
    return (
        li.join(big, "l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
    )


def q18_large_volume_customer_sql() -> str:
    return """
    SELECT c_name, o_orderkey, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    JOIN (SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 250) big
      USING (l_orderkey)
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_name, o_orderkey, o_totalprice
    """


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join shape (TPC-H Q22 spirit): customers with no 1996
    orders (the unrestricted variant is empty on the synthetic data —
    every customer orders eventually), counted per nation with their
    idle balance.  The anti-join build side is just the distinct
    o_custkey set — at scale the anti-join ships key hashes, never
    customer rows."""
    cust = _tbl(spark, sf_dir, "customer")
    orders = _tbl(spark, sf_dir, "orders")
    nation = _tbl(spark, sf_dir, "nation")
    o96 = orders.where((F.col("o_orderdate") >= "1996-01-01")
                       & (F.col("o_orderdate") < "1997-01-01"))
    return (
        cust.join(o96.select("o_custkey").distinct(),
                  cust["c_custkey"] == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nation),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_idle_customers"),
             F.round(F.sum("c_acctbal"), 2).alias("idle_balance"))
    )


def q_customers_without_orders_sql() -> str:
    return """
    SELECT n_name, count(*) AS n_idle_customers,
           round(sum(c_acctbal), 2) AS idle_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey NOT IN (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01')
    GROUP BY n_name
    """


def q_order_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP shape: order counts and value at three grain levels
    (priority x status, priority subtotal, grand total) in ONE pass —
    the partial aggregates are shared across grouping sets, so the
    rollup costs one shuffle like the plain groupBy."""
    orders = _tbl(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_value"))
    )


def q_order_priority_rollup_sql() -> str:
    return """
    SELECT o_orderpriority, o_orderstatus,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_value
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS -> LEFT SEMI join): count orders per
    priority in one quarter having at least one line shipped AFTER the
    order date (the synthetic schema has no commit/receipt dates; the
    correlated late-line predicate keeps Q4's semi-join with a
    cross-table condition).  The semi-join ships only the key + one
    date per lineitem and stops probing an order at its first match —
    the EXISTS shape at 100 TB."""
    orders = _tbl(spark, sf_dir, "orders")
    li = _tbl(spark, sf_dir, "lineitem")
    lo, hi = "1997-01-01", "1997-04-01"
    return (
        orders.where((F.col("o_orderdate") >= lo)
                     & (F.col("o_orderdate") < hi))
        .join(li, (F.col("l_orderkey") == F.col("o_orderkey"))
              & (F.col("l_shipdate") > F.col("o_orderdate")),
              "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q4_order_priority_sql() -> str:
    return """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional two-nation trade volume by ship
    year — a 6-way join where the two nation dims join TWICE (supplier
    side and customer side) with an OR'd pair predicate, then a
    (nation, nation, year) aggregation.  Both nation joins broadcast;
    the date filter pushes to the lineitem scan."""
    li = _tbl(spark, sf_dir, "lineitem")
    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    supp = _tbl(spark, sf_dir, "supplier")
    nation = _tbl(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"),
                       F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where((F.col("l_shipdate") >= "1996-01-01")
                 & (F.col("l_shipdate") < "1998-01-01"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(vol), 2).alias("revenue"))
    )


def q7_volume_shipping_sql() -> str:
    return """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue
    share for one month) — two sums over the same joined rows in ONE
    aggregation, part dim broadcast, month filter pushed to the
    lineitem scan.  Scalar output."""
    li = _tbl(spark, sf_dir, "lineitem")
    part = _tbl(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), vol) \
             .otherwise(F.lit(0.0))
    return (
        li.where((F.col("l_shipdate") >= "1997-09-01")
                 & (F.col("l_shipdate") < "1997-10-01"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100 * F.sum(promo) / F.sum(vol), 4)
             .alias("promo_pct"))
    )


def q14_promo_revenue_sql() -> str:
    return """
    SELECT round(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                           THEN l_extendedprice * (1 - l_discount)
                           ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4)
             AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """
