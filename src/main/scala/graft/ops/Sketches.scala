package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable cardinality sketch: HyperLogLog with p = 9 (512 registers)
  * over an md5-derived 32-bit hash — the NDV machinery that backs stats
  * collection (`GraftTable.analyze`) at 100 TB scale, where an exact
  * COUNT(DISTINCT) means shuffling every key and the sketch means
  * shuffling 512 cells.
  *
  * Scale shape: each row maps to (register, rank) with NO shuffle; the
  * register table is a groupBy-max over 512 keys with map-side partial
  * aggregation, so the exchange carries at most 512 rows per partition
  * regardless of input size, and sketches of different partitions /
  * tables / snapshots merge by the same max — the standard mergeable-
  * summary contract.
  *
  * Reproducibility: the register array and the harmonic-sum numerator are
  * EXACT integers (rank via binary-string length, 2^(24-rank) via shifts),
  * and the final estimate is a fixed sequence of IEEE double ops on those
  * integers, so Spark and DuckDB produce bit-identical estimates. The
  * small-range (linear counting) and 32-bit-collision corrections are
  * deliberately not applied — inputs here sit in the plain-HLL regime —
  * keeping the estimator a pure rational function. Baseline accuracy
  * 1.04/sqrt(512) ≈ 4.6 % relative error; the query emits the exact NDV
  * alongside so the error is visible.
  */
object Sketches {
  type Q = (SparkSession, String) => DataFrame

  val P = 9
  val M = 1 << P // 512 registers
  private val WBits = 32 - P // 23 bits of rank material
  private val WMask = (1L << WBits) - 1

  /** per-row (register, rank) from the first 32 bits of md5("hll:" || key) */
  private def regRank(keyCol: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    val u = conv(substring(
      md5(concat(lit("hll:"), col(keyCol).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    val idx = shiftright(u, WBits)
    val w = u.bitwiseAND(lit(WMask))
    // rank = position of the first 1-bit in the 23-bit word from the MSB;
    // all-zero word -> WBits + 1. bin() has no leading zeros, so
    // rank = WBits + 1 - length(bin(w)) for w > 0 in both engines.
    val rank = when(w === 0L, lit(WBits + 1))
      .otherwise(lit(WBits + 1) - length(bin(w)))
    (idx, rank)
  }

  /** HLL NDV estimate for lineitem.l_orderkey, with the exact NDV beside it */
  def hllNdv(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val (idx, rank) = regRank("l_orderkey")
    val regs = li.select(idx.as("idx"), rank.as("rank"))
      .groupBy(col("idx")).agg(max(col("rank")).as("r"))
    // exact integer harmonic numerator: T = sum(2^(24-r)) + zeros * 2^24
    // (scaling the 2^-r sum by 2^24 keeps it integral)
    val agg = regs.agg(
      count(lit(1)).as("n_registers"),
      sum(expr(s"shiftleft(cast(1 as bigint), cast(${WBits + 1} - r as int))"))
        .cast("long").as("t_present"))
    val sketch = agg.select(
      col("n_registers"),
      (col("t_present") +
        (lit(M.toLong) - col("n_registers")) * lit(1L << (WBits + 1))).as("t"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val raw = alpha * lit(M.toDouble) * lit(M.toDouble) *
      lit((1L << (WBits + 1)).toDouble) / col("t").cast("double")
    // small-range regime -> linear counting over zero registers, rounded
    // to 4 decimals via floor arithmetic (ln differs by 1 ULP between
    // JVM and DuckDB libm on 2 of 511 possible inputs; the rounding
    // absorbs it). Mirrors HllNdvAgg.eval exactly.
    val zeros = (lit(M.toLong) - col("n_registers")).cast("double")
    val lc = lit(M.toDouble) * log(lit(M.toDouble) / zeros)
    val est = sketch.select(
      col("n_registers"), col("t"),
      when(raw <= lit(2.5 * M) && col("n_registers") < lit(M.toLong),
        floor(lc * lit(10000.0) + lit(0.5)) / lit(10000.0))
        .otherwise(raw)
        .as("ndv_est"))
    val exact = li.agg(countDistinct(col("l_orderkey")).as("ndv_exact"))
    est.crossJoin(exact)
      .select("n_registers", "t", "ndv_est", "ndv_exact")
  }

  /** Exact distributed quantiles (R-7 linear interpolation) of document
    * length per language — Spark's `percentile` aggregate against DuckDB's
    * `quantile_cont`. Exact quantiles sort within each group (here: 5
    * groups), which is the honest cost; the sketch-based alternative at
    * 100 TB is a fixed-bin histogram (deterministic), not t-digest
    * (merge-order-dependent). */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        expr("percentile(cast(n_chars as double), 0.5)").as("p50"),
        expr("percentile(cast(n_chars as double), 0.9)").as("p90"),
        expr("percentile(cast(n_chars as double), 0.99)").as("p99"))
      .orderBy("lang")

  /** the same sketch as a first-class Catalyst aggregate
    * (functions/HllAgg.scala): per-group NDV via `graft_hll_ndv` — the
    * 512-byte register buffer partial-aggregates map-side and merges by
    * element-wise max, so each group ships one buffer per partition
    * through the shuffle regardless of row count */
  def hllGroup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(graft.functions.HllNdvAgg.hllNdv(col("l_orderkey")).as("sk"),
        countDistinct(col("l_orderkey")).as("ndv_exact"))
      .select(col("l_returnflag"), col("sk.n_registers").as("n_registers"),
        col("sk.t").as("t"), col("sk.ndv_est").as("ndv_est"),
        col("ndv_exact"))
      .orderBy("l_returnflag")
  }

  /** Sketch ALGEBRA rollup: per-grain HLL registers are computed in ONE
    * pass over the fact table, then the coarser grain derives by merging
    * REGISTERS (max per index) — events is never rescanned. This is the
    * property that makes sketches the right NDV answer at 100 TB: a cube
    * of exact COUNT(DISTINCT)s pays a key-space shuffle PER GRAIN, while
    * mergeable registers roll any finished grain up to a coarser one for
    * the cost of a ≤(grains × 512)-row aggregate. The register table is
    * cached so both output grains read the single pass; the "(all)" row
    * is bit-identical to a direct single-pass global sketch
    * (SketchPropertySpec pins it against [[graft.functions.HllNdvAgg]]). */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val (idx, rank) = regRank("user_id")
    val base = ev.select(col("event_type"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("event_type"), col("idx")).agg(max(col("rank")).as("r"))
      .cache()
    val grains = base.select(col("event_type").as("grain"), col("idx"), col("r"))
      .unionByName(base.groupBy(col("idx")).agg(max(col("r")).as("r"))
        .select(lit("(all)").as("grain"), col("idx"), col("r")))
    val agg = grains.groupBy(col("grain")).agg(
      count(lit(1)).as("n_registers"),
      sum(expr(s"shiftleft(cast(1 as bigint), cast(${WBits + 1} - r as int))"))
        .cast("long").as("t_present"))
    val sk = agg.select(col("grain"), col("n_registers"),
      (col("t_present") +
        (lit(M.toLong) - col("n_registers")) * lit(1L << (WBits + 1))).as("t"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(M.toDouble))
    val raw = alpha * lit(M.toDouble) * lit(M.toDouble) *
      lit((1L << (WBits + 1)).toDouble) / col("t").cast("double")
    val zeros = (lit(M.toLong) - col("n_registers")).cast("double")
    val lc = lit(M.toDouble) * log(lit(M.toDouble) / zeros)
    val out = sk.select(col("grain"), col("n_registers"), col("t"),
      when(raw <= lit(2.5 * M) && col("n_registers") < lit(M.toLong),
        floor(lc * lit(10000.0) + lit(0.5)) / lit(10000.0))
        .otherwise(raw).as("ndv_est"))
      .orderBy("grain")
      // the result is ≤(grains+1) rows: pin it eagerly so the register
      // cache can be released NOW instead of leaking for the JVM's
      // lifetime (bench loops re-invoke this; each cache would pile up)
      .localCheckpoint()
    base.unpersist(blocking = false)
    out
  }

  /** Count-Min heavy hitters (functions/CmsAgg.scala): ONE pass builds
    * the 4×1024 counter grid (map-side partials, element-wise-sum merge
    * — the shuffle carries one 32 KB grid per partition), then the exact
    * top-20 hottest users probe it: est = min over hash rows, an upper
    * bound on the true count. The probe side is the "which keys need
    * salting" query that feeds SkewJoin; the exact count rides beside
    * the estimate so the CMS error is visible. */
  def cmsTopk(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.CmsSketchAgg.{D, W}
    val ev = Tables(spark, dir, "events")
    val sk = ev.agg(graft.functions.CmsSketchAgg.cms(col("user_id")).as("sk"))
    val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt_exact"))
      .orderBy(col("cnt_exact").desc, col("user_id")).limit(20)
    val est = (0 until D).map { d =>
      element_at(col("sk"),
        (lit(d * W) + cmsIdx(d, col("user_id")) + lit(1L)).cast("int"))
    }.reduce(least(_, _))
    top.crossJoin(broadcast(sk))
      .select(col("user_id"), col("cnt_exact"), est.as("cnt_est"))
      .orderBy(col("cnt_exact").desc, col("user_id"))
  }

  /** probe-side replica of CmsSketchAgg's hash row d: low 10 bits of the
    * first 32 bits of md5("cms<d>:" || key) */
  private def cmsIdx(d: Int, k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s"cms$d:"), k.cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
      .bitwiseAND(lit((graft.functions.CmsSketchAgg.W - 1).toLong))

  /** Histogram-sketch quantiles (functions/HistAgg.scala) — the
    * mergeable answer to q_quantiles' exact per-group sort: 256 BIGINT
    * bins, element-wise-sum merge (partition-invariant, unlike t-digest),
    * ±4-char accuracy by construction. The exact percentiles ride beside
    * the estimates so the sketch error is visible in the output. */
  def histQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        graft.functions.HistQuantileAgg
          .histQuantile(col("n_chars"), 0L, 1024L, 256).as("sk"),
        expr("percentile(cast(n_chars as double), 0.5)").as("exact_p50"),
        expr("percentile(cast(n_chars as double), 0.99)").as("exact_p99"))
      .select(col("lang"), col("sk.n").as("n"), col("sk.p50").as("h50"),
        col("sk.p90").as("h90"), col("sk.p99").as("h99"),
        col("exact_p50"), col("exact_p99"))
      .orderBy("lang")

  /** Group-level set similarity via MinHash signatures
    * (functions/MinHashAgg.scala): pairwise Jaccard of the order-key
    * sets behind each return flag, from K=64-long signatures instead of
    * a key-level join. Signature build is one aggregation (min-merge is
    * duplicate-insensitive — no pre-distinct shuffle); comparison is
    * O(groups²·K). The exact Jaccard (distinct + self-join) rides
    * beside the estimate so the sketch error is visible — at 100 TB
    * only the signature path survives. */
  def groupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val sig = li.groupBy(col("l_returnflag"))
      .agg(graft.functions.MinHashSigAgg.minhash(col("l_orderkey")).as("sig"))
    val a = sig.select(col("l_returnflag").as("fa"), col("sig").as("siga"))
    val b = sig.select(col("l_returnflag").as("fb"), col("sig").as("sigb"))
    val est = a.join(b, col("fa") < col("fb"))
      .select(col("fa"), col("fb"),
        (expr("cast(size(filter(zip_with(siga, sigb, (x, y) -> x = y), v -> v)) as double)")
          / lit(64).cast("double")).as("est_jaccard"))
    val d = li.select(col("l_returnflag").as("f"), col("l_orderkey").as("k"))
      .distinct()
    val cnt = d.groupBy(col("f")).agg(count(lit(1)).as("n"))
    val inter = d.as("x")
      .join(d.as("y"), col("x.k") === col("y.k") && col("x.f") < col("y.f"))
      .groupBy(col("x.f").as("fa"), col("y.f").as("fb"))
      .agg(count(lit(1)).as("ni"))
    val exact = inter
      .join(cnt.select(col("f").as("fa"), col("n").as("na")), "fa")
      .join(cnt.select(col("f").as("fb"), col("n").as("nb")), "fb")
      .select(col("fa"), col("fb"),
        (col("ni").cast("double") /
          (col("na") + col("nb") - col("ni")).cast("double")).as("exact_jaccard"))
    est.join(exact, Seq("fa", "fb"))
      .select(col("fa"), col("fb"), col("est_jaccard"), col("exact_jaccard"))
      .orderBy("fa", "fb")
  }

  /** KMV/theta set-algebra sketch (functions/KmvAgg.scala) — the sketch
    * family Iceberg's Puffin stats carry: per event type, the 256
    * smallest distinct hashes of the user set, then pairwise UNION and
    * INTERSECTION cardinality estimates from the 2 KB sketches alone.
    * At 100 TB the sketch build is one capped-buffer aggregation (the
    * shuffle carries ≤ K longs per group per partition) and the algebra
    * is O(groups²·K) on the driver-sized result; exact answers ride
    * beside the estimates so the error is visible. Estimators are exact
    * integer counts with one final double division — bit-identical in
    * DuckDB. */
  def thetaSets(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KmvSketchAgg.{K, SPACE}
    val ev = Tables(spark, dir, "events")
    val sig = ev.groupBy(col("event_type"))
      .agg(graft.functions.KmvSketchAgg.kmv(col("user_id")).as("sig"))
    val a = sig.select(col("event_type").as("ta"), col("sig").as("siga"))
    val b = sig.select(col("event_type").as("tb"), col("sig").as("sigb"))
    val algebra = a.join(b, col("ta") < col("tb"))
      .withColumn("theta_a", when(size(col("siga")) < K, lit(1L << 32))
        .otherwise(element_at(col("siga"), K)))
      .withColumn("theta_b", when(size(col("sigb")) < K, lit(1L << 32))
        .otherwise(element_at(col("sigb"), K)))
      .withColumn("theta", least(col("theta_a"), col("theta_b")))
      .withColumn("merged", array_sort(array_distinct(concat(col("siga"), col("sigb")))))
      .withColumn("n_inter",
        expr("size(filter(array_intersect(siga, sigb), x -> x < theta))").cast("long"))
      .withColumn("est_union",
        when(size(col("merged")) < K, size(col("merged")).cast("double"))
          .otherwise(lit((K - 1).toDouble) * lit(SPACE)
            / element_at(col("merged"), K).cast("double")))
      .withColumn("est_inter",
        col("n_inter").cast("double") * lit(SPACE) / col("theta").cast("double"))
    val d = ev.select(col("event_type").as("t"), col("user_id").as("k")).distinct()
    val cnt = d.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val xinter = d.as("x")
      .join(d.as("y"), col("x.k") === col("y.k") && col("x.t") < col("y.t"))
      .groupBy(col("x.t").as("ta"), col("y.t").as("tb"))
      .agg(count(lit(1)).as("ni"))
    algebra
      .join(xinter, Seq("ta", "tb"), "left")
      .join(cnt.select(col("t").as("ta"), col("n").as("na")), "ta")
      .join(cnt.select(col("t").as("tb"), col("n").as("nb")), "tb")
      .select(col("ta"), col("tb"),
        col("est_union"),
        (col("na") + col("nb") - coalesce(col("ni"), lit(0L))).cast("long")
          .as("exact_union"),
        col("est_inter"),
        coalesce(col("ni"), lit(0L)).cast("long").as("exact_inter"))
      .orderBy("ta", "tb")
  }

  /** Robust spread statistics: per-language median and MAD (median
    * absolute deviation) of document length — the outlier-resistant
    * companion to the z-score family (a single corrupt gigabyte document
    * moves a mean/stddev, not a median/MAD). Two exact percentile
    * passes: medians per group, broadcast back, then the deviation
    * percentile — R-7 interpolation matches DuckDB's quantile_cont
    * bit-for-bit (proven by q_quantiles). */
  def robustStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("lang"), col("n_chars").cast("double").as("x"))
    val med = docs.groupBy(col("lang"))
      .agg(expr("percentile(x, 0.5)").as("med"))
    docs.join(broadcast(med), "lang")
      .withColumn("adev", abs(col("x") - col("med")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("median"),
        expr("percentile(adev, 0.5)").as("mad"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "q_robust_stats" -> robustStats,
    "q_hll_ndv" -> hllNdv,
    "q_hll_group" -> hllGroup,
    "q_hll_rollup" -> hllRollup,
    "q_cms_topk" -> cmsTopk,
    "q_hist_quantiles" -> histQuantiles,
    "q_group_minhash" -> groupMinhash,
    "q_theta_sets" -> thetaSets,
    "q_quantiles" -> quantiles)

  /** the md5 32-bit fold over hex chars — DuckDB's conv()-equivalent */
  private[ops] def sqlFold(arg: String): String =
    s"""CAST(list_sum(list_transform(range(1, 9),
       |  i -> CAST(strpos('0123456789abcdef',
       |         substr(md5($arg), CAST(i AS INT), 1))
       |       - 1 AS DOUBLE) * power(16, 8 - i))) AS BIGINT)""".stripMargin

  /** the md5 32-bit fold, as in Sampling's oracle */
  private val sqlU = sqlFold("'hll:' || CAST(l_orderkey AS VARCHAR)")

  /** raw HLL estimate over (n_registers, t) columns — pure rational */
  private[ops] val sqlHllRaw: String =
    s"""CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
       |      + CAST(1.079 AS DOUBLE) / CAST($M.0 AS DOUBLE))
       |    * CAST($M.0 AS DOUBLE) * CAST($M.0 AS DOUBLE)
       |    * CAST(${1L << (WBits + 1)}.0 AS DOUBLE)
       |    / CAST(t AS DOUBLE)""".stripMargin

  /** full estimator incl. linear-counting small-range branch — mirrors
    * HllNdvAgg.eval (floor-rounded to 4 decimals where ln is involved) */
  private[ops] val sqlHllEst: String =
    s"""CASE WHEN ($sqlHllRaw) <= CAST(1280.0 AS DOUBLE) AND n_registers < $M
       |  THEN floor(CAST($M.0 AS DOUBLE)
       |      * ln(CAST($M.0 AS DOUBLE) / CAST($M - n_registers AS DOUBLE))
       |      * CAST(10000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
       |    / CAST(10000.0 AS DOUBLE)
       |  ELSE $sqlHllRaw END""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_robust_stats" ->
      """WITH d AS (
        |  SELECT lang, CAST(n_chars AS DOUBLE) AS x FROM documents),
        |m AS (
        |  SELECT lang, quantile_cont(x, 0.5) AS med FROM d GROUP BY lang)
        |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n, MAX(med) AS median,
        |  quantile_cont(abs(x - med), 0.5) AS mad
        |FROM d JOIN m ON d.lang = m.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,
    "q_theta_sets" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type AS t,
         |    ${sqlFold("'kmv:' || CAST(user_id AS VARCHAR)")} AS h
         |  FROM events
         |), km AS (
         |  SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn
         |  FROM h
         |), kept AS (
         |  SELECT t, h, rn FROM km WHERE rn <= 256
         |), th AS (
         |  SELECT t,
         |    CASE WHEN MAX(rn) < 256 THEN 4294967296
         |         ELSE MAX(CASE WHEN rn = 256 THEN h END) END AS theta
         |  FROM kept GROUP BY t
         |), tp AS (
         |  SELECT a.t AS ta, b.t AS tb,
         |    LEAST(a.theta, b.theta) AS theta
         |  FROM th a JOIN th b ON a.t < b.t
         |), mg AS (
         |  SELECT DISTINCT ta, tb, h FROM (
         |    SELECT p.ta, p.tb, k.h FROM tp p JOIN kept k ON k.t = p.ta
         |    UNION ALL
         |    SELECT p.ta, p.tb, k.h FROM tp p JOIN kept k ON k.t = p.tb)
         |), mgr AS (
         |  SELECT ta, tb, h,
         |    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |  FROM mg
         |), uni AS (
         |  SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS nm,
         |    MAX(CASE WHEN rn = 256 THEN h END) AS kth
         |  FROM mgr GROUP BY ta, tb
         |), skinter AS (
         |  SELECT p.ta, p.tb, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM tp p
         |  JOIN kept x ON x.t = p.ta
         |  JOIN kept y ON y.t = p.tb AND y.h = x.h
         |  WHERE x.h < p.theta
         |  GROUP BY p.ta, p.tb
         |), d AS (
         |  SELECT DISTINCT event_type AS t, user_id AS k FROM events
         |), cnt AS (
         |  SELECT t, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY t
         |), xinter AS (
         |  SELECT x.t AS ta, y.t AS tb, CAST(COUNT(*) AS BIGINT) AS ni
         |  FROM d x JOIN d y ON x.k = y.k AND x.t < y.t GROUP BY x.t, y.t
         |)
         |SELECT p.ta, p.tb,
         |  CASE WHEN u.nm < 256 THEN CAST(u.nm AS DOUBLE)
         |       ELSE CAST(255 AS DOUBLE) * CAST(4294967296 AS DOUBLE)
         |            / CAST(u.kth AS DOUBLE) END AS est_union,
         |  CAST(ca.n + cb.n - COALESCE(xi.ni, 0) AS BIGINT) AS exact_union,
         |  CAST(COALESCE(si.n_inter, 0) AS DOUBLE) * CAST(4294967296 AS DOUBLE)
         |    / CAST(p.theta AS DOUBLE) AS est_inter,
         |  CAST(COALESCE(xi.ni, 0) AS BIGINT) AS exact_inter
         |FROM tp p
         |JOIN uni u ON u.ta = p.ta AND u.tb = p.tb
         |LEFT JOIN skinter si ON si.ta = p.ta AND si.tb = p.tb
         |LEFT JOIN xinter xi ON xi.ta = p.ta AND xi.tb = p.tb
         |JOIN cnt ca ON ca.t = p.ta
         |JOIN cnt cb ON cb.t = p.tb
         |ORDER BY p.ta, p.tb""".stripMargin,
    "q_group_minhash" ->
      s"""WITH mh AS (
         |  SELECT l_returnflag AS f,
         |    ${sqlFold("'mh1:' || CAST(l_orderkey AS VARCHAR)")} AS h1,
         |    ${sqlFold("'mh2:' || CAST(l_orderkey AS VARCHAR)")} AS h2
         |  FROM lineitem
         |), g AS (
         |  SELECT f, i, CAST(MIN((h1 + i * h2) % 4294967296) AS BIGINT) AS mg
         |  FROM mh, (SELECT UNNEST(range(64)) AS i) GROUP BY f, i
         |), m AS (
         |  SELECT a.f AS fa, b.f AS fb,
         |    CAST(SUM(CASE WHEN a.mg = b.mg THEN 1 ELSE 0 END) AS BIGINT) AS mm
         |  FROM g a JOIN g b ON a.i = b.i AND a.f < b.f GROUP BY a.f, b.f
         |), d AS (
         |  SELECT DISTINCT l_returnflag AS f, l_orderkey AS k FROM lineitem
         |), cnt AS (
         |  SELECT f, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY f
         |), inter AS (
         |  SELECT x.f AS fa, y.f AS fb, CAST(COUNT(*) AS BIGINT) AS ni
         |  FROM d x JOIN d y ON x.k = y.k AND x.f < y.f GROUP BY x.f, y.f
         |)
         |SELECT m.fa, m.fb,
         |  CAST(mm AS DOUBLE) / CAST(64 AS DOUBLE) AS est_jaccard,
         |  CAST(ni AS DOUBLE) / CAST(ca.n + cb.n - ni AS DOUBLE) AS exact_jaccard
         |FROM m
         |JOIN inter ON m.fa = inter.fa AND m.fb = inter.fb
         |JOIN cnt ca ON ca.f = m.fa
         |JOIN cnt cb ON cb.f = m.fb
         |ORDER BY m.fa, m.fb""".stripMargin,
    "q_hist_quantiles" ->
      """WITH b AS (
        |  SELECT lang,
        |    CAST(LEAST(GREATEST((n_chars * 256) // 1024, 0), 255) AS BIGINT)
        |      AS bin
        |  FROM documents
        |), counts AS (
        |  SELECT lang, bin, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM b GROUP BY lang, bin
        |), cum AS (
        |  SELECT lang, bin,
        |    CAST(SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM counts
        |), pick AS (
        |  SELECT lang, n,
        |    MIN(CASE WHEN CAST(cum AS DOUBLE)
        |          >= CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE) THEN bin END) AS b50,
        |    MIN(CASE WHEN CAST(cum AS DOUBLE)
        |          >= CAST(0.9 AS DOUBLE) * CAST(n AS DOUBLE) THEN bin END) AS b90,
        |    MIN(CASE WHEN CAST(cum AS DOUBLE)
        |          >= CAST(0.99 AS DOUBLE) * CAST(n AS DOUBLE) THEN bin END) AS b99
        |  FROM cum GROUP BY lang, n
        |), ex AS (
        |  SELECT lang,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS exact_p50,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.99) AS exact_p99
        |  FROM documents GROUP BY lang
        |)
        |SELECT p.lang, n,
        |  CAST(b50 + 1 AS DOUBLE) * (CAST(1024 AS DOUBLE) / CAST(256 AS DOUBLE)) AS h50,
        |  CAST(b90 + 1 AS DOUBLE) * (CAST(1024 AS DOUBLE) / CAST(256 AS DOUBLE)) AS h90,
        |  CAST(b99 + 1 AS DOUBLE) * (CAST(1024 AS DOUBLE) / CAST(256 AS DOUBLE)) AS h99,
        |  exact_p50, exact_p99
        |FROM pick p JOIN ex USING (lang)
        |ORDER BY lang""".stripMargin,
    "q_cms_topk" ->
      s"""WITH ds AS (SELECT UNNEST(range(4)) AS d),
         |hashes AS (
         |  SELECT ${sqlFold("'cms' || d || ':' || CAST(user_id AS VARCHAR)")}
         |    % 1024 AS idx, d
         |  FROM events, ds
         |),
         |counters AS (
         |  SELECT d, idx, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM hashes GROUP BY d, idx
         |),
         |top AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt_exact
         |  FROM events GROUP BY user_id
         |  ORDER BY cnt_exact DESC, user_id LIMIT 20
         |),
         |probe AS (
         |  SELECT t.user_id, t.cnt_exact, ds.d,
         |    ${sqlFold("'cms' || ds.d || ':' || CAST(t.user_id AS VARCHAR)")}
         |      % 1024 AS idx
         |  FROM top t, ds
         |)
         |SELECT p.user_id, p.cnt_exact, CAST(MIN(c.c) AS BIGINT) AS cnt_est
         |FROM probe p JOIN counters c ON c.d = p.d AND c.idx = p.idx
         |GROUP BY p.user_id, p.cnt_exact
         |ORDER BY cnt_exact DESC, user_id""".stripMargin,
    "q_hll_group" ->
      s"""WITH h AS (
         |  SELECT l_returnflag, $sqlU AS u FROM lineitem
         |), rr AS (
         |  SELECT l_returnflag, u // ${1L << WBits} AS idx,
         |    CASE WHEN u % ${1L << WBits} = 0 THEN ${WBits + 1}
         |         ELSE ${WBits + 1} - length(bin(u % ${1L << WBits})) END AS rank
         |  FROM h
         |), regs AS (
         |  SELECT l_returnflag, idx, MAX(rank) AS r FROM rr
         |  GROUP BY l_returnflag, idx
         |), agg AS (
         |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_registers,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(${WBits + 1} - r AS BIGINT))
         |         AS BIGINT) AS t_present
         |  FROM regs GROUP BY l_returnflag
         |), sk AS (
         |  SELECT l_returnflag, n_registers,
         |    t_present + ($M - n_registers) * ${1L << (WBits + 1)} AS t
         |  FROM agg
         |), ex AS (
         |  SELECT l_returnflag, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
         |    AS ndv_exact
         |  FROM lineitem GROUP BY l_returnflag
         |)
         |SELECT sk.l_returnflag, n_registers, t,
         |  $sqlHllEst AS ndv_est,
         |  ndv_exact
         |FROM sk JOIN ex USING (l_returnflag)
         |ORDER BY l_returnflag""".stripMargin,
    "q_quantiles" ->
      """SELECT lang,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS p50,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.9) AS p90,
        |  quantile_cont(CAST(n_chars AS DOUBLE), 0.99) AS p99
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the register-merge rollup replayed: grain registers, then the
    // "(all)" grain as MAX over them — the same associative algebra
    "q_hll_rollup" ->
      s"""WITH h AS (
         |  SELECT event_type,
         |    ${sqlFold("'hll:' || CAST(user_id AS VARCHAR)")} AS u
         |  FROM events
         |), rr AS (
         |  SELECT event_type, u // ${1L << WBits} AS idx,
         |    CASE WHEN u % ${1L << WBits} = 0 THEN ${WBits + 1}
         |         ELSE ${WBits + 1} - length(bin(u % ${1L << WBits})) END AS rank
         |  FROM h
         |), regs AS (
         |  SELECT event_type, idx, MAX(rank) AS r FROM rr GROUP BY event_type, idx
         |), grains AS (
         |  SELECT event_type AS grain, idx, r FROM regs
         |  UNION ALL
         |  SELECT '(all)' AS grain, idx, MAX(r) AS r FROM regs GROUP BY idx
         |), agg AS (
         |  SELECT grain, CAST(COUNT(*) AS BIGINT) AS n_registers,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(${WBits + 1} - r AS BIGINT))
         |         AS BIGINT) AS t_present
         |  FROM grains GROUP BY grain
         |), sk AS (
         |  SELECT grain, n_registers,
         |    t_present + ($M - n_registers) * ${1L << (WBits + 1)} AS t
         |  FROM agg
         |)
         |SELECT grain, n_registers, CAST(t AS BIGINT) AS t,
         |  $sqlHllEst AS ndv_est
         |FROM sk ORDER BY grain""".stripMargin,
    "q_hll_ndv" ->
      s"""WITH h AS (
         |  SELECT $sqlU AS u FROM lineitem
         |), rr AS (
         |  SELECT u // ${1L << WBits} AS idx,
         |    CASE WHEN u % ${1L << WBits} = 0 THEN ${WBits + 1}
         |         ELSE ${WBits + 1} - length(bin(u % ${1L << WBits})) END AS rank
         |  FROM h
         |), regs AS (
         |  SELECT idx, MAX(rank) AS r FROM rr GROUP BY idx
         |), agg AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_registers,
         |    CAST(SUM(CAST(1 AS BIGINT) << CAST(${WBits + 1} - r AS BIGINT))
         |         AS BIGINT) AS t_present
         |  FROM regs
         |), sk AS (
         |  SELECT n_registers,
         |    t_present + ($M - n_registers) * ${1L << (WBits + 1)} AS t
         |  FROM agg
         |)
         |SELECT n_registers, t,
         |  $sqlHllEst AS ndv_est,
         |  (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem)
         |    AS ndv_exact
         |FROM sk""".stripMargin)
}
