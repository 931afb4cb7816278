"""Deterministic sketches over the engine's portable md5 hash:
HyperLogLog distinct counting and count-min frequency estimation.

The sketch family every 100 TB rollup pipeline leans on: exact
count-distinct shuffles one row per distinct key, while an HLL register
table is O(m) per group no matter the cardinality, and registers merge
with ``max`` — associative and commutative, so Spark's map-side partial
aggregation does the heavy lifting and re-aggregation across
partitions/days/regions is a register-wise max, never a re-scan.

Determinism (the cross-engine contract): stock HLL implementations hash
differently everywhere, so this one is built on the repo-standard md5
convention (`contract.md5_mod`) — hex digits 1-13 give a 52-bit
positive word for the rank (rho = leading-zero count + 1, computed
exactly as 53 − length(bin(w))), hex digits 14-15 give the bucket.
Register arithmetic stays exact-integer: the harmonic term
``sum(2^-M_j)`` is scaled by 2^53 so every addend is a BIGINT
(``shiftleft``), and only the final estimate divides doubles (one IEEE
division + round — bit-identical in any engine). The raw HLL estimator
(alpha_64 = 0.709) is reported WITHOUT the small-range linear-counting
correction — that correction needs ln(), which is not correctly-rounded
across libm implementations; the report includes the exact distinct
count and the empty-register count, so the small-range bias is visible
(the fixture's user_id side, n=150 < 2.5m, demonstrates it; event_id at
n >> m sits in the accurate regime).

Reference scope note: the reference engine has no sketch operators —
this extends the aggregation family (SURVEY §2.5) with the structure a
Spark pipeline actually uses for distinct-heavy rollups at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_validator_github_spark.contract import Query, load

#: Number of HLL registers (2^6; bucket = one hex byte mod 64).
HLL_M = 64

#: Standard HLL bias constant for m=64 (Flajolet et al. 2007).
HLL_ALPHA = 0.709

#: The rank word is 52 bits (13 hex digits); rho ranges 1..53.
_W_BITS = 52

#: The estimator numerator alpha·m²·2^53 as ONE double constant,
#: computed once here and embedded verbatim in both engines' plans —
#: a single shared literal instead of two engines multiplying their
#: own constant chains.
_EST_NUM = HLL_ALPHA * HLL_M * HLL_M * float(1 << (_W_BITS + 1))


def _hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, bucket) -> M = max rank; one tiny-key hash-agg with
    map-side partial max — the register table is group-cardinality × 64
    regardless of input size."""
    bucket = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 14, 2), "
        f"16, 10) as bigint) % {HLL_M}"
    )
    w = F.expr(
        f"cast(conv(substring(md5(cast({key_col} as string)), 1, 13), "
        f"16, 10) as bigint)"
    )
    rho = F.when(w == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(F.col(group_col).alias("grp"), bucket.alias("bucket"),
                  rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def fold_registers(regs: DataFrame,
                   group_cols: tuple[str, ...] = ("grp",)) -> DataFrame:
    """(*group_cols, bucket, m_reg) registers → *group_cols, v_zero,
    sum_pow, n_est.

    Accepts any register table — including the max-merge of several
    (register merge IS ``max``, so batch registers, daily registers,
    and streamed register logs all fold through here identically).
    Compound keys (e.g. the pair tables in :func:`hll_overlap`) pass
    their column list instead of being smashed into one delimited
    string — a group value containing the delimiter must not corrupt
    pair identity.
    """
    cols = list(group_cols)
    per_group = regs.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, {_W_BITS + 1} - cast(m_reg as int))"))
        .alias("sum_present"),
    )
    # Empty buckets contribute 2^-0 = 1 each → 2^53 in scaled units.
    scale = 1 << (_W_BITS + 1)
    folded = per_group.select(
        *cols,
        (F.lit(HLL_M) - F.col("n_present")).alias("v_zero"),
        (F.col("sum_present")
         + (F.lit(HLL_M) - F.col("n_present")) * F.lit(scale))
        .alias("sum_pow"),
    )
    est = F.round(
        F.lit(_EST_NUM) / F.col("sum_pow").cast("double")
    ).cast("long")
    return folded.select(*cols, "v_zero", "sum_pow", est.alias("n_est"))


def distinct_sketch(df: DataFrame, group_col: str, key_col: str,
                    key_label: str) -> DataFrame:
    """Per-group HLL distinct estimate next to the exact count.

    Columns: grp, key (the label), n_true, v_zero (empty registers),
    sum_pow (the exact-integer scaled harmonic sum), n_est.
    """
    folded = fold_registers(_hll_registers(df, group_col, key_col))
    true_counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(key_col).alias("n_true")
    )
    return (
        folded.join(true_counts, "grp")
        .select(
            "grp",
            F.lit(key_label).alias("key"),
            "n_true",
            "v_zero",
            "sum_pow",
            "n_est",
        )
    )


def hll_registers(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Public register builder (see `_hll_registers`): the unit a
    streaming pipeline appends per micro-batch and max-merges at read
    time (`streaming/events.py::stream_distinct_sketch`)."""
    return _hll_registers(df, group_col, key_col)


def events_distinct_sketch(events: DataFrame) -> DataFrame:
    """Distinct users (small-range regime) and distinct event ids
    (accurate regime) per event_type, sketch vs exact."""
    return distinct_sketch(events, "event_type", "user_id", "user").unionByName(
        distinct_sketch(events, "event_type", "event_id", "event")
    )


def _sketch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_distinct_sketch(
        load(spark, sf_dir, "events").select("event_type", "user_id",
                                             "event_id")
    )


def _sketch_branch_sql(key_col: str, key_label: str) -> str:
    scale = 1 << (_W_BITS + 1)
    return f"""
  WITH hashed AS (
    SELECT event_type AS grp,
           CAST(concat('0x', substring(md5(CAST({key_col} AS VARCHAR)), 14, 2))
                AS BIGINT) % {HLL_M} AS bucket,
           CAST(concat('0x', substring(md5(CAST({key_col} AS VARCHAR)), 1, 13))
                AS BIGINT) AS w
    FROM events
  ), regs AS (
    SELECT grp, bucket,
           MAX(CASE WHEN w = 0 THEN {_W_BITS + 1}
                    ELSE {_W_BITS + 1} - length(bin(w)) END) AS m_reg
    FROM hashed GROUP BY 1, 2
  ), folded AS (
    SELECT grp,
           {HLL_M} - COUNT(*) AS v_zero,
           CAST(SUM(1::BIGINT << ({_W_BITS + 1} - m_reg)) AS BIGINT)
             + ({HLL_M} - COUNT(*)) * {scale} AS sum_pow
    FROM regs GROUP BY 1
  ), trues AS (
    SELECT event_type AS grp, COUNT(DISTINCT {key_col}) AS n_true
    FROM events GROUP BY 1
  )
  SELECT f.grp, '{key_label}' AS key, t.n_true, f.v_zero, f.sum_pow,
         CAST(round({_EST_NUM!r} / CAST(f.sum_pow AS DOUBLE)) AS BIGINT)
           AS n_est
  FROM folded f JOIN trues t USING (grp)
"""


_SKETCH_SQL = (
    "SELECT * FROM (" + _sketch_branch_sql("user_id", "user")
    + ") UNION ALL SELECT * FROM ("
    + _sketch_branch_sql("event_id", "event") + ")"
)


# ---------------------------------------------------------------------------
# Set-overlap estimation from HLL register algebra: max-merging two
# groups' registers IS the sketch of their union (the same property
# that makes the sketch mergeable across partitions/days), so
# |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B) by inclusion–exclusion — the
# standard HLL audience-overlap trick. Everything runs on the tiny
# register tables (groups × 64 rows): the corpus is scanned once to
# build registers; pair analysis never touches it again. The exact
# intersection is computed alongside as the eval column — at production
# scale that exact side is the expensive part (a distinct over
# group-pairs × users), which is precisely why the sketch exists.
#
# Accuracy caveat (inherent to the method, not this implementation):
# inclusion–exclusion differences THREE ±1.04/sqrt(m) estimates, so the
# intersection's error is ~sqrt(3)·13% of the UNION size at m=64 — thin
# overlaps drown in noise (the estimate is clamped at 0). Production
# sizing raises m; the report keeps the exact count beside the estimate
# so the regime is visible, and the test uses a dominant overlap.
# ---------------------------------------------------------------------------


def hll_overlap(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """Pairwise distinct-overlap report: for each unordered group pair,
    HLL estimates of |A|, |B|, |A ∪ B| (max-merged registers) and the
    inclusion–exclusion |A ∩ B| (clamped at 0 — the estimator can go
    slightly negative when errors cancel badly), next to the exact
    intersection. Columns: grp_a, grp_b, est_a, est_b, est_union,
    est_inter, n_inter_true.
    """
    regs = _hll_registers(df, group_col, key_col)
    singles = fold_registers(regs).select(
        F.col("grp"), F.col("n_est").alias("est_single")
    )
    # Union registers per pair: each side CONTRIBUTES its register rows
    # to the pair, then max per (pair, bucket). A join on bucket would
    # silently drop buckets present in only one sketch (folding them as
    # empty and understating the union); the union-all + max form keeps
    # them — it is the same merge the streaming register log uses.
    groups = regs.select("grp").distinct()
    pairs = (
        groups.select(F.col("grp").alias("grp_a"))
        .join(groups.select(F.col("grp").alias("grp_b")),
              F.col("grp_a") < F.col("grp_b"))
    )
    contrib_a = pairs.join(
        regs.withColumnRenamed("grp", "grp_a"), "grp_a"
    ).select("grp_a", "grp_b", "bucket", "m_reg")
    contrib_b = pairs.join(
        regs.withColumnRenamed("grp", "grp_b"), "grp_b"
    ).select("grp_a", "grp_b", "bucket", "m_reg")
    merged = (
        contrib_a.unionAll(contrib_b)
        .groupBy("grp_a", "grp_b", "bucket")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    unions = fold_registers(merged, ("grp_a", "grp_b")).select(
        "grp_a", "grp_b", F.col("n_est").alias("est_union")
    )
    exact = (
        df.select(F.col(group_col).alias("grp"), F.col(key_col).alias("k"))
        .distinct()
    )
    ex_a = exact.select(F.col("grp").alias("grp_a"), "k")
    ex_b = exact.select(F.col("grp").alias("grp_b"), "k")
    inter_true = (
        ex_a.join(ex_b, "k")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_inter_true"))
    )
    out = (
        unions
        .join(F.broadcast(singles.withColumnRenamed("grp", "grp_a")
                          .withColumnRenamed("est_single", "est_a")), "grp_a")
        .join(F.broadcast(singles.withColumnRenamed("grp", "grp_b")
                          .withColumnRenamed("est_single", "est_b")), "grp_b")
        .join(inter_true, ["grp_a", "grp_b"], "left")
    )
    est_inter = F.greatest(
        F.lit(0).cast("long"),
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
    )
    return out.select(
        "grp_a", "grp_b", "est_a", "est_b", "est_union",
        est_inter.alias("est_inter"),
        F.coalesce("n_inter_true", F.lit(0)).alias("n_inter_true"),
    )


def _overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hll_overlap(
        load(spark, sf_dir, "events").select("event_type", "user_id"),
        "event_type", "user_id",
    )


def _overlap_sql() -> str:
    scale = 1 << (_W_BITS + 1)
    fold = (
        f"CAST(SUM(1::BIGINT << ({_W_BITS + 1} - m_reg)) AS BIGINT) "
        f"+ ({HLL_M} - COUNT(*)) * {scale}"
    )
    est = (f"CAST(round({_EST_NUM!r} / CAST(({fold}) AS DOUBLE)) "
           "AS BIGINT)")
    return f"""
WITH hashed AS (
  SELECT event_type AS grp,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 14, 2))
              AS BIGINT) % {HLL_M} AS bucket,
         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 13))
              AS BIGINT) AS w
  FROM events
), regs AS (
  SELECT grp, bucket,
         MAX(CASE WHEN w = 0 THEN {_W_BITS + 1}
                  ELSE {_W_BITS + 1} - length(bin(w)) END) AS m_reg
  FROM hashed GROUP BY 1, 2
), singles AS (
  SELECT grp, {est} AS est_single FROM regs GROUP BY grp
), pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM regs) a
  JOIN (SELECT DISTINCT grp FROM regs) b ON a.grp < b.grp
), contrib AS (
  SELECT p.grp_a, p.grp_b, r.bucket, r.m_reg
  FROM pairs p JOIN regs r ON r.grp = p.grp_a
  UNION ALL
  SELECT p.grp_a, p.grp_b, r.bucket, r.m_reg
  FROM pairs p JOIN regs r ON r.grp = p.grp_b
), merged AS (
  SELECT grp_a, grp_b, bucket, MAX(m_reg) AS m_reg
  FROM contrib GROUP BY 1, 2, 3
), unions AS (
  SELECT grp_a, grp_b, {est} AS est_union
  FROM merged GROUP BY grp_a, grp_b
), exact AS (
  SELECT DISTINCT event_type AS grp, user_id AS k FROM events
), inter_true AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, COUNT(*) AS n_inter_true
  FROM exact a JOIN exact b ON a.k = b.k AND a.grp < b.grp
  GROUP BY 1, 2
)
SELECT u.grp_a, u.grp_b,
       sa.est_single AS est_a, sb.est_single AS est_b, u.est_union,
       GREATEST(0::BIGINT, sa.est_single + sb.est_single - u.est_union)
         AS est_inter,
       COALESCE(t.n_inter_true, 0) AS n_inter_true
FROM unions u
JOIN singles sa ON sa.grp = u.grp_a
JOIN singles sb ON sb.grp = u.grp_b
LEFT JOIN inter_true t ON t.grp_a = u.grp_a AND t.grp_b = u.grp_b
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005 — public method):
# frequency estimates from a d×w counter grid. Counters are plain
# integer SUMS — fully mergeable, map-side combinable, and (unlike
# stock implementations) deterministic here because the d row hashes
# derive from the engine-portable md5. A point query reads d counters
# and takes the min; estimates only ever OVERcount (collisions add,
# never subtract), which the report makes visible by putting the exact
# count next to the estimate — overcount = n_est − n_true ≥ 0, an
# exact integer. At 100 TB the counter grid is d·w cells per group no
# matter how many distinct tokens stream through, vs one row per
# distinct token for the exact count.
# ---------------------------------------------------------------------------

#: Sketch depth (hash rows) and width (counters per row). Deliberately
#: NARROW: the fixture vocabulary is ~31 tokens, so w=8 guarantees
#: collisions and the overcount column is non-trivially exercised (a
#: 4×256 grid never collided on this fixture, which would make the
#: min-over-rows logic vacuously green — production sizing scales w to
#: the tolerated epsilon = e/w of the stream length).
CMS_D = 4
CMS_W = 8

#: How many exact-top tokens the report point-queries.
CMS_TOPK = 10


def _cms_bucket_sql_spark(row: int, tok: str = "tok") -> str:
    return (f"cast(conv(substring(md5(concat('cms{row}:', {tok})), 1, 8), "
            f"16, 10) as bigint) % {CMS_W}")


def _cms_bucket_sql_duck(row: int, tok: str = "tok") -> str:
    return (f"CAST(concat('0x', substring(md5(concat('cms{row}:', {tok})), "
            f"1, 8)) AS BIGINT) % {CMS_W}")


def cms_counters(tokens_df: DataFrame) -> DataFrame:
    """(row, bucket) -> exact BIGINT counter; ``tokens_df`` has one
    ``tok`` string per row. One explode (d structs per token) + one
    hash-agg on the tiny d×w key space — map-side partial sums do the
    heavy lifting, exactly like any production CMS merge."""
    cells = tokens_df.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_cms_bucket_sql_spark(i)).alias("bucket"),
            )
            for i in range(CMS_D)
        ])).alias("c")
    )
    return (
        cells.groupBy(F.col("c.row").alias("row"),
                      F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_point_query(counters: DataFrame, probe_tokens: DataFrame) -> DataFrame:
    """Point-query a counter grid: for each row of ``probe_tokens``
    (column ``tok`` plus any carried columns), min over the d counters.
    The probe side broadcasts — the grid is never re-keyed."""
    carried = [c for c in probe_tokens.columns if c != "tok"]
    probes = probe_tokens.select(
        "tok", *carried,
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_cms_bucket_sql_spark(i)).alias("bucket"),
            )
            for i in range(CMS_D)
        ])).alias("p"),
    ).select("tok", *carried, "p.row", "p.bucket")
    return (
        counters.join(F.broadcast(probes), ["row", "bucket"])
        .groupBy("tok", *carried)
        .agg(F.min("n").alias("n_est"))
    )


def cms_token_report(docs: DataFrame, k: int = CMS_TOPK) -> DataFrame:
    """CMS point-query estimates for the exact top-``k`` tokens.

    Columns: tok, n_true, n_est (min over the d counters), overcount
    (= n_est − n_true, ≥ 0 by construction). The exact top-k keep-list
    is tie-broken (count desc, tok asc) and is the only part that needs
    the exact per-token aggregate — the sketch itself never does.
    """
    from pyspark.sql import Window

    from etl_validator_github_spark.scale.text import tokens

    toks = docs.select(F.explode(tokens()).alias("tok"))
    counters = cms_counters(toks)
    true_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_true"))
    # Exact top-k over the vocab aggregate without a single-partition
    # sort (functions/ranks.py — same rationale as vocab_coverage).
    from etl_validator_github_spark.functions.ranks import (
        global_row_number,
    )

    top = (
        global_row_number(
            true_counts, [F.desc("n_true"), F.asc("tok")], rank_col="rk",
        )
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
    return cms_point_query(counters, top).withColumn(
        "overcount", F.col("n_est") - F.col("n_true")
    )


def _cms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cms_token_report(load(spark, sf_dir, "documents"))


def _cms_sql() -> str:
    cell_rows = " UNION ALL ".join(
        f"SELECT {i} AS row, {_cms_bucket_sql_duck(i)} AS bucket, tok "
        "FROM toks"
        for i in range(CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cells AS (
  {cell_rows}
), counters AS (
  SELECT row, bucket, COUNT(*) AS n FROM cells GROUP BY 1, 2
), trues AS (
  SELECT tok, COUNT(*) AS n_true FROM toks GROUP BY 1
), top AS (
  SELECT tok, n_true,
         row_number() OVER (ORDER BY n_true DESC, tok ASC) AS rk
  FROM trues QUALIFY rk <= {CMS_TOPK}
), probes AS (
  {" UNION ALL ".join(
      f"SELECT tok, n_true, {i} AS row, {_cms_bucket_sql_duck(i)} AS bucket "
      "FROM top"
      for i in range(CMS_D))}
)
SELECT p.tok, p.n_true, CAST(MIN(c.n) AS BIGINT) AS n_est,
       CAST(MIN(c.n) AS BIGINT) - p.n_true AS overcount
FROM probes p JOIN counters c ON p.row = c.row AND p.bucket = c.bucket
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Quantile sketch — the DDSketch idea (Masson, Lee & Rim 2019, "DDSketch:
# a fast and fully-mergeable quantile sketch with relative-error
# guarantees" — public method) in its base-2 variant: values map to
# logarithmic buckets, the histogram is O(buckets) state that merges by
# plain addition, and a quantile query walks the cumulative counts. The
# proper DDSketch uses bucket = floor(log_gamma(x)) for a tunable
# relative error (gamma−1)/2; log_gamma needs ln(), which is not
# correctly-rounded across libm implementations, so the cross-engine
# variant here pins gamma = 2: bucket = floor(log2(cents)) computed
# EXACTLY as length(bin(cents)) − 1 — pure integer string length, the
# same trick as the HLL rank. The cost of gamma=2 is a coarse ≤2×
# relative bound (bucket bounds are reported so the width is visible);
# production sizing on one engine would shrink gamma.
# ---------------------------------------------------------------------------

#: The quantiles the report walks to.
DD_QUANTILES = (50, 90, 99)


def quantile_sketch(values: DataFrame, col: str = "v") -> DataFrame:
    """Base-2 DDSketch quantile report over a positive BIGINT column.

    One map-side hash-agg builds the ≤64-bucket histogram; the quantile
    walk is a window over those buckets. Columns: quantile_pct, bucket,
    bucket_lo, bucket_hi (both exact BIGINT bounds, inclusive),
    cum_count, n_total — every value exact-integer.
    """
    from pyspark.sql import Window

    hist = (
        values.filter(F.col(col) > 0)
        .select((F.length(F.bin(F.col(col))) - 1).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = hist.select(
        "bucket",
        F.sum("n").over(w_cum).alias("cum_count"),
        F.sum("n").over(w_all).alias("n_total"),
    )
    # rank(q) = ceil(q/100 × N) as exact integers: (q·N + 99) div 100.
    qs = F.explode(F.array(*[F.lit(q) for q in DD_QUANTILES]))
    ranked = cum.select("*", qs.alias("quantile_pct")).withColumn(
        "q_rank",
        F.expr("(quantile_pct * n_total + 99) div 100"),
    )
    # The answering bucket is the FIRST whose cumulative count reaches
    # the rank — i.e. the min bucket among those with cum_count >= rank.
    w_pick = Window.partitionBy("quantile_pct")
    picked = (
        ranked.filter(F.col("cum_count") >= F.col("q_rank"))
        .withColumn("min_bucket", F.min("bucket").over(w_pick))
        .filter(F.col("bucket") == F.col("min_bucket"))
    )
    return picked.select(
        "quantile_pct",
        "bucket",
        F.expr("shiftleft(1L, cast(bucket as int))").alias("bucket_lo"),
        (F.expr("shiftleft(1L, cast(bucket as int) + 1)") - 1)
        .alias("bucket_hi"),
        "cum_count",
        "n_total",
    )


def _quantile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    vals = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v")
    )
    return quantile_sketch(vals)


_QUANTILE_SQL = f"""
WITH vals AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
), hist AS (
  SELECT length(bin(v)) - 1 AS bucket, COUNT(*) AS n
  FROM vals WHERE v > 0 GROUP BY 1
), cum AS (
  SELECT bucket,
         CAST(SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_count,
         CAST(SUM(n) OVER () AS BIGINT) AS n_total
  FROM hist
), ranked AS (
  SELECT c.*, q.quantile_pct,
         (q.quantile_pct * c.n_total + 99) // 100 AS q_rank
  FROM cum c CROSS JOIN
       (SELECT unnest([{", ".join(str(q) for q in DD_QUANTILES)}])
          AS quantile_pct) q
), picked AS (
  SELECT *, MIN(bucket) OVER (PARTITION BY quantile_pct) AS min_bucket
  FROM ranked WHERE cum_count >= q_rank
)
SELECT CAST(quantile_pct AS INT) AS quantile_pct,
       CAST(bucket AS BIGINT) AS bucket,
       (1::BIGINT << CAST(bucket AS INT)) AS bucket_lo,
       (1::BIGINT << (CAST(bucket AS INT) + 1)) - 1 AS bucket_hi,
       cum_count, n_total
FROM picked WHERE bucket = min_bucket
"""


# ---------------------------------------------------------------------------
# Bloom-filter decontamination: the membership sketch completing the
# family (HLL = distinct, CMS = frequency, DDSketch = quantiles,
# Bloom = membership).
#
# The exact decontamination operator (scale/dedup.py `decontaminate`)
# broadcasts the held-out shingle SET — fine while the benchmark suite
# is small, but a broadcast that grows with the held-out corpus. The
# Bloom variant collapses ANY held-out set to a fixed m-bit register
# array (here 65536 bits = 2048 × 32-bit words in BIGINT lanes, k=3),
# built with one tiny hash-agg (bit_or per word — associative and
# commutative, so map-side partial aggregation applies and two days'
# filters merge with a word-wise OR, never a rebuild). The corpus probe
# is then map-side arithmetic against the ONE folded register row
# (1-row broadcast fold; the BroadcastNestedLoopJoin it plans to is the
# intended shape, per the semantic-dedup / DSIR convention) — zero
# shuffle of corpus text, one final hash-agg on doc_id.
#
# Determinism: bit positions come from the repo-standard md5 hex
# convention (hash j of shingle = first 8 hex digits of
# md5('<j>:'||shingle) mod m), so BOTH engines build bit-identical
# registers and the false-positive set itself — the lossy part of any
# Bloom filter — is reproduced exactly by the oracle. No false
# negatives by construction: every truly-overlapping shingle hits, so
# n_bloom_hits ≥ the exact operator's n_overlap_shingles per doc
# (pinned by test_scale.py). m = 65536 puts the sf0.01 fixture (~1.3k
# held-out shingles) at a per-shingle FP rate of ~2e-4 — a small but
# non-empty false-positive tail, so the lossy path is exercised without
# the filter saturating (4096 bits flags every doc at this scale;
# production sizing scales m with the held-out count, the register
# array stays a broadcastable few KiB either way).
# ---------------------------------------------------------------------------

#: Bloom geometry: m = 65536 bits as 2048 words × 32 bits (32-bit lanes
#: inside BIGINTs keep every shift/mask far from the sign bit on both
#: engines), k = 3 hash functions.
BLOOM_BITS = 65536
BLOOM_WORD_BITS = 32
BLOOM_WORDS = BLOOM_BITS // BLOOM_WORD_BITS
BLOOM_K = 3


def _bloom_pos_spark(j: int, col: str = "shingle") -> str:
    """Spark SQL expr: bit position of hash ``j`` for a key column."""
    return (f"cast(conv(substring(md5(concat('{j}:', {col})), 1, 8), "
            f"16, 10) as bigint) % {BLOOM_BITS}")


def _bloom_pos_duck(j: int, col: str = "shingle") -> str:
    """DuckDB expr computing the identical bit position."""
    return (f"CAST(concat('0x', substring(md5(concat('{j}:', {col})), "
            f"1, 8)) AS BIGINT) % {BLOOM_BITS}")


def bloom_build(keys: DataFrame, key_col: str = "shingle") -> DataFrame:
    """Distinct keys → ONE row ``words: array<bigint>[BLOOM_WORDS]``.

    Explode each key to its k bit positions, bit_or the masks per word
    (map-side partial agg; ≤ BLOOM_WORDS groups), then fold the word
    table into a single dense array row — the broadcastable register
    state, a few KiB no matter how large the key set.
    """
    pos = keys.select(
        F.explode(F.array(
            *[F.expr(_bloom_pos_spark(j, key_col)) for j in range(BLOOM_K)]
        )).alias("pos")
    )
    words = (
        pos.select(
            F.expr(f"cast(pos div {BLOOM_WORD_BITS} as int)")
            .alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), "
                   f"cast(pos % {BLOOM_WORD_BITS} as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            f"i -> coalesce(element_at(wm, i), cast(0 as bigint)))"
        ).alias("words")
    )


def bloom_probe(keyed: DataFrame, bloom_row: DataFrame,
                key_col: str = "shingle") -> DataFrame:
    """(doc_id, key) rows × the 1-row register fold → per-doc hit report.

    The k membership tests are pure map-side expressions over the
    broadcast array (word lookup + shift + mask); a key is a hit only
    if ALL k bits are set. Output per doc_id: n_shingles,
    n_bloom_hits, flagged (0/1) — every column exact-integer.
    """
    hit = None
    for j in range(BLOOM_K):
        pos = _bloom_pos_spark(j, key_col)
        bit_j = F.expr(
            f"(shiftright(element_at(words, "
            f"cast(({pos}) div {BLOOM_WORD_BITS} as int) + 1), "
            f"cast(({pos}) % {BLOOM_WORD_BITS} as int)) & 1) = 1"
        )
        hit = bit_j if hit is None else (hit & bit_j)
    probed = keyed.crossJoin(F.broadcast(bloom_row)).select(
        "doc_id", hit.cast("int").alias("hit")
    )
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles"),
        F.sum("hit").cast("int").alias("n_bloom_hits"),
        F.max("hit").cast("int").alias("flagged"),
    )


def _window_positions(docs: DataFrame, k: int) -> DataFrame:
    """(doc_id, sig, p0..p{K-1}): one row per k-token window with its
    Bloom bit positions and a 60-bit dedup signature, all computed in
    the SAME whole-stage-codegen pass as the tokenize + explode.

    This is the scale-critical half of Bloom decontamination: the
    shingle STRINGS exist only transiently inside the stage — what
    leaves it (and what any shuffle carries) is doc_id + four BIGINTs,
    ~40 bytes/window instead of the full shingle text. The hash
    convention is unchanged from `_bloom_pos_spark` — hash j of a
    shingle is md5('<j>:' || shingle), position = first 8 hex digits
    mod m — so registers and the false-positive set stay bit-identical
    to the string-keyed path and the DuckDB oracle. ``sig`` is hex
    digits 9..23 of hash 0 (independent of the position digits):
    distinct-shingle counting per doc needs distinctness only WITHIN a
    doc (~10² windows), where a 60-bit key is collision-free for all
    practical purposes.

    (A first cut computed the hashes inside per-row higher-order
    ``transform`` lambdas to avoid the explode entirely — 7× SLOWER:
    HOF lambda bodies evaluate interpreted, outside codegen. The
    explode keeps every md5 in generated code; `windowed_shingles`
    additionally assembles the shingle STRING post-explode so the
    string-building escapes the interpreted lambda too.)
    """
    from etl_validator_github_spark.scale.dedup import windowed_shingles

    pos_cols = [
        F.expr(f"cast(conv(substring(md5(concat('{j}:', shingle)), 1, 8), "
               f"16, 10) as bigint) % {BLOOM_BITS}").alias(f"p{j}")
        for j in range(BLOOM_K)
    ]
    sig = F.expr(
        "cast(conv(substring(md5(concat('0:', shingle)), 9, 15), "
        "16, 10) as bigint)"
    ).alias("sig")
    return (
        windowed_shingles(
            docs.select("doc_id", F.split("text", " ").alias("__toks")), k)
        .select("doc_id", sig, *pos_cols)
    )


def bloom_build_from_positions(win_pos: DataFrame) -> DataFrame:
    """(sig, p0..p{k-1}) window rows → the ONE register row (same
    output as `bloom_build`; positions were already computed in the
    window pass instead of re-hashing shingle strings). Dedup by sig
    before the word agg keeps the explode bounded by distinct keys."""
    pos = (
        win_pos.select("sig", *[f"p{j}" for j in range(BLOOM_K)])
        .distinct()
        .select(F.explode(F.array(
            *[F.col(f"p{j}") for j in range(BLOOM_K)]
        )).alias("pos"))
    )
    words = (
        pos.select(
            F.expr(f"cast(pos div {BLOOM_WORD_BITS} as int)")
            .alias("word_idx"),
            F.expr(f"shiftleft(cast(1 as bigint), "
                   f"cast(pos % {BLOOM_WORD_BITS} as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("wm")
    ).select(
        F.expr(
            f"transform(sequence(0, {BLOOM_WORDS - 1}), "
            f"i -> coalesce(element_at(wm, i), cast(0 as bigint)))"
        ).alias("words")
    )


def bloom_probe_positions(win_pos: DataFrame,
                          bloom_row: DataFrame) -> DataFrame:
    """(doc_id, sig, p0..p{k-1}) window rows × the 1-row register fold
    → the per-doc hit report.

    Membership arithmetic is a codegen projection against the
    broadcast ``words`` array; per-doc distinct counting is two
    hash-aggs on (doc_id, sig) then doc_id — both with map-side
    partial aggregation, and since a doc's windows never span input
    rows the first partial agg already collapses duplicates before the
    exchange. Docs with no windows (< k tokens) produce no rows,
    matching the string formulation and the oracle."""
    hit = None
    for j in range(BLOOM_K):
        bit_j = F.expr(
            f"(shiftright(element_at(words, "
            f"cast(p{j} div {BLOOM_WORD_BITS} as int) + 1), "
            f"cast(p{j} % {BLOOM_WORD_BITS} as int)) & 1) = 1"
        )
        hit = bit_j if hit is None else (hit & bit_j)
    per_window = (
        win_pos.crossJoin(F.broadcast(bloom_row))
        .select("doc_id", "sig", hit.cast("int").alias("hit"))
        .groupBy("doc_id", "sig")
        .agg(F.max("hit").alias("hit"))
    )
    return per_window.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_shingles"),
        F.sum("hit").cast("int").alias("n_bloom_hits"),
        F.max("hit").cast("int").alias("flagged"),
    )


def bloom_decontaminate(docs: DataFrame,
                        bench_mod: int | None = None) -> DataFrame:
    """Benchmark decontamination through the Bloom membership sketch.

    Same held-out split as the exact operator (doc_id % DECON_BENCH_MOD
    == 0 plays the benchmark suite): held-out 5-gram shingles build the
    filter, every corpus doc's distinct shingles probe it.

    Probe dataflow (the 100 TB shape): `_window_positions` hashes
    every window in the tokenize stage itself, so shingle STRINGS are
    never shuffled — the exchanges downstream carry doc_id + four
    BIGINTs per window, and the membership test is pure arithmetic
    against the 1-row register broadcast. Same output and oracle as
    the earlier string-keyed formulation (tests/test_scale.py pins the
    two paths equal); measured at 1M docs in tools/measure_1m.py
    (SCALE.md).
    """
    from etl_validator_github_spark.scale.dedup import (
        DECON_BENCH_MOD, DECON_SHINGLE,
    )
    mod = bench_mod if bench_mod is not None else DECON_BENCH_MOD
    wp = _window_positions(docs, DECON_SHINGLE)
    return bloom_probe_positions(
        wp.filter(F.col("doc_id") % mod != 0),
        bloom_build_from_positions(wp.filter(F.col("doc_id") % mod == 0)),
    )


def _bloom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bloom_decontaminate(load(spark, sf_dir, "documents"))


def _bloom_sql() -> str:
    from etl_validator_github_spark.scale.dedup import (
        DECON_BENCH_MOD, DECON_SHINGLE,
    )
    bench_pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos_duck(j)} AS pos FROM bench"
        for j in range(BLOOM_K)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT doc_id, shingle, {_bloom_pos_duck(j)} AS pos FROM corpus"
        for j in range(BLOOM_K)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - {DECON_SHINGLE - 2}),
                i -> array_to_string(list_slice(toks, i,
                       i + {DECON_SHINGLE - 1}), ' '))) AS shingle
  FROM tok
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_BENCH_MOD} = 0
), bpos AS (
  {bench_pos}
), words AS (
  SELECT pos // {BLOOM_WORD_BITS} AS word_idx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % {BLOOM_WORD_BITS} AS INT))
           AS word
  FROM bpos GROUP BY 1
), corpus AS (
  SELECT DISTINCT doc_id, shingle FROM sh
  WHERE doc_id % {DECON_BENCH_MOD} != 0
), cpos AS (
  {probe_pos}
), checked AS (
  SELECT doc_id, shingle,
         MIN(CASE WHEN (COALESCE(w.word, 0)
                        >> CAST(pos % {BLOOM_WORD_BITS} AS INT)) & 1 = 1
                  THEN 1 ELSE 0 END) AS hit
  FROM cpos LEFT JOIN words w ON pos // {BLOOM_WORD_BITS} = w.word_idx
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS INT) AS n_shingles,
       CAST(SUM(hit) AS INT) AS n_bloom_hits,
       CAST(MAX(hit) AS INT) AS flagged
FROM checked GROUP BY 1
"""


SKETCH_QUERIES: dict[str, Query] = {
    q.name: q
    for q in [
        Query("events_distinct_sketch", _sketch_q, _SKETCH_SQL,
              "Deterministic md5-HLL distinct sketch per event_type: "
              "exact-integer registers, raw alpha-64 estimate next to "
              "the exact count (sketch state is O(m) per group and "
              "merges by register max)."),
        Query("text_cms_topk_counts", _cms_q, _cms_sql(),
              "Deterministic count-min sketch over the token stream: "
              "4×8 exact-integer counter grid, point-query estimates "
              "for the exact top-10 tokens with the guaranteed-"
              "non-negative overcount shown."),
        Query("orders_quantile_sketch", _quantile_q, _QUANTILE_SQL,
              "Base-2 DDSketch quantile report over order totals: "
              "log2 buckets via length(bin(cents)), O(buckets) "
              "mergeable histogram, exact-integer rank walk to "
              "P50/P90/P99 bucket bounds."),
        Query("docs_bloom_decontaminate", _bloom_q, _bloom_sql(),
              "Bloom-filter decontamination: held-out shingles fold to "
              "a 64 Kbit register row (bit_or agg, word-wise-OR "
              "mergeable), corpus probes it map-side — the false-"
              "positive set reproduced exactly by the oracle."),
        Query("events_user_overlap_sketch", _overlap_q, _overlap_sql(),
              "HLL register algebra for audience overlap: max-merged "
              "pair registers estimate each union, inclusion-exclusion "
              "gives the intersection, exact intersections sit beside "
              "for eval."),
    ]
}
