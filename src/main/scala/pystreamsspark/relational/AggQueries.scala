package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import Det._

/** Aggregation surface beyond plain groupBy (SURVEY.md §2.5). */
object AggQueries {

  /** rollup with grouping() labels instead of NULLs so the compared output
    * has no null-ordering ambiguity between engines. */
  def qRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(
        // grouping() must be evaluated inside the Aggregate node
        when(grouping($"l_returnflag") === 1, lit("ALL")).otherwise($"l_returnflag").as("returnflag"),
        when(grouping($"l_linestatus") === 1, lit("ALL")).otherwise($"l_linestatus").as("linestatus"),
        count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .select($"returnflag", $"linestatus", $"n", $"sum_qty")
      .orderBy($"returnflag", $"linestatus")
  }

  val qRollupSql: String =
    s"""SELECT
       |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
       |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
       |  COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** cube over two independent dimensions, same grouping() labeling. */
  def qCube(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(
        when(grouping($"o_orderstatus") === 1, lit("ALL")).otherwise($"o_orderstatus").as("status"),
        when(grouping($"o_orderpriority") === 1, lit("ALL")).otherwise($"o_orderpriority").as("priority"),
        count(lit(1)).as("n"))
      .select($"status", $"priority", $"n")
      .orderBy($"status", $"priority")
  }

  val qCubeSql: String =
    """SELECT
      |  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
      |  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Exact percentiles (interpolated) of integer-valued quantities — both
    * engines interpolate identically on exact values. */
  def qPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }

  val qPercentileSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  MIN(l_quantity) AS min_qty,
      |  MAX(l_quantity) AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** collect_set per group, sorted and serialized to a string so the
    * compared value is order- and codec-unambiguous. */
  def qCollectList(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        concat_ws(",", sort_array(collect_set($"o_orderpriority"))).as("priorities"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val qCollectListSql: String =
    """SELECT o_orderstatus,
      |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities,
      |  COUNT(*) AS n
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** HLL++ approximate distinct — sketches differ across engines, so this
    * key is smoke-checked only (no oracle entry); correctness is covered
    * by the bounds test in the ScalaTest suite, and the same
    * sketch-distinct pipeline is oracle-checked end-to-end by its
    * replayable twin [[qKmvDistinct]]. */
  def qApproxDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_users"),
           count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** KMV (k-minimum-values) distinct-count sketch — the replayable
    * oracle TWIN of [[qApproxDistinct]]'s HLL pipeline (Bar-Yossef et
    * al. 2002: keep the k smallest uniform hashes per group; with the
    * k-th smallest at fraction h/2^40 of the hash space, distinct ≈
    * (k−1)·2^40/h; under k distinct hashes the sketch IS the exact
    * count). The same bounded-k map-side UDAF as top-k carries the
    * sketch — n_groups×k rows cross the shuffle, mergeable on a 1000-
    * executor combine tree — and the md5-derived 40-bit hash family
    * exists in BOTH engines, so unlike HLL the whole sketch replays in
    * DuckDB: estimator bit-exact, same IEEE op order. */
  def qKmvDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 64
    val scale = lit((k - 1).toDouble * 1099511627776.0) // (k−1)·2^40, exact
    val d1 = Tables.events(spark, sfDir)
      .select($"event_type", $"user_id").distinct()
    val exact = d1.groupBy($"event_type").agg(count(lit(1)).as("n_exact"))
    val d2 = d1.select($"event_type",
      conv(substring(md5($"user_id".cast("string").cast("binary")), 1, 10),
        16, 10).cast("long").as("h")).distinct()
    val sketch = d2.groupBy($"event_type")
      .agg(pystreamsspark.operators.TopKAgg.smallestK(k)($"h").as("ks"),
        count(lit(1)).as("n_h"))
      .select($"event_type",
        when($"n_h" < k, $"n_h".cast("double"))
          .otherwise(scale / element_at($"ks", k).cast("double"))
          .as("kmv_estimate"))
    exact.join(sketch, "event_type").orderBy($"event_type")
  }

  val qKmvDistinctSql: String =
    """WITH d1 AS (SELECT DISTINCT event_type, user_id FROM events),
      |ex AS (SELECT event_type, COUNT(*) AS n_exact FROM d1 GROUP BY 1),
      |d2 AS (SELECT DISTINCT event_type,
      |  CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 10))
      |    AS BIGINT) AS h FROM d1),
      |r AS (SELECT event_type, h,
      |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
      |  COUNT(*) OVER (PARTITION BY event_type) AS n_h FROM d2),
      |sk AS (SELECT event_type,
      |  CASE WHEN max(n_h) < 64 THEN CAST(max(n_h) AS DOUBLE)
      |       ELSE (63.0 * 1099511627776.0) /
      |            CAST(max(CASE WHEN rn = 64 THEN h END) AS DOUBLE)
      |  END AS kmv_estimate FROM r GROUP BY 1)
      |SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact, kmv_estimate
      |FROM ex JOIN sk USING (event_type)
      |ORDER BY event_type""".stripMargin

  /** Count-Min Sketch frequency estimation (Cormode & Muthukrishnan
    * 2005): d=4 hash rows × w=64 counters, estimate = min over rows of
    * the landed counter — always an OVERestimate, exact when no
    * collision. The md5-derived hash family exists in both engines, so
    * the whole sketch replays in DuckDB and the key compares the
    * estimate against the exact count for the top-20 users.
    *
    * Scale shape: the counter build is the real sketch path — a ×4
    * generator over the raw stream into a 256-cell aggregate whose
    * partial agg collapses map-side (per-partition state is the 256
    * cells, NOT per-key counts), so the build never shuffles per-key
    * state and the counter table broadcasts to the probe join. The
    * exact side exists only for the comparison (it is the oracle's
    * ground truth, and the thing a production CMS avoids computing). */
  def qCmsFreq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def h(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 10), 16, 10).cast("long")
    def bucketed(df: DataFrame): DataFrame = df
      .withColumn("d", explode(sequence(lit(0), lit(3))))
      .withColumn("bucket", pmod(h(concat($"d".cast("string"), lit(":"),
        $"user_id".cast("string"))), lit(64L)))
    val ev = Tables.events(spark, sfDir).select($"user_id")
    val counters = bucketed(ev).groupBy($"d", $"bucket")
      .agg(count(lit(1)).as("cnt"))
    val top = ev.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
      .orderBy($"n_exact".desc, $"user_id".asc).limit(20)
    bucketed(top).join(broadcast(counters), Seq("d", "bucket"))
      .groupBy($"user_id", $"n_exact").agg(min($"cnt").as("cms_est"))
      .orderBy($"n_exact".desc, $"user_id".asc)
  }

  val qCmsFreqSql: String =
    """WITH ev AS (SELECT user_id FROM events),
      |tag AS (SELECT user_id, unnest([0,1,2,3]) AS d FROM ev),
      |tb AS (SELECT d, user_id,
      |  CAST(concat('0x', substring(md5(CAST(d AS VARCHAR) || ':' ||
      |    CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT) % 64 AS bucket FROM tag),
      |counters AS (SELECT d, bucket, COUNT(*) AS cnt FROM tb GROUP BY d, bucket),
      |top AS (SELECT user_id, COUNT(*) AS n_exact FROM ev GROUP BY user_id
      |        ORDER BY n_exact DESC, user_id LIMIT 20),
      |pt AS (SELECT user_id, n_exact, unnest([0,1,2,3]) AS d FROM top),
      |pb AS (SELECT user_id, n_exact, d,
      |  CAST(concat('0x', substring(md5(CAST(d AS VARCHAR) || ':' ||
      |    CAST(user_id AS VARCHAR)), 1, 10)) AS BIGINT) % 64 AS bucket FROM pt)
      |SELECT pb.user_id, pb.n_exact, MIN(c.cnt) AS cms_est
      |FROM pb JOIN counters c ON c.d = pb.d AND c.bucket = pb.bucket
      |GROUP BY pb.user_id, pb.n_exact
      |ORDER BY pb.n_exact DESC, pb.user_id""".stripMargin

  /** MULTIPLE exact count-distincts in one aggregation — the shape that
    * forces Catalyst's Expand-based rewrite: the input is replicated once
    * per distinct column (gid tagging), partial-aggregated per (key, gid,
    * value), then re-aggregated, so each distinct set dedups in parallel
    * map-side instead of funneling through a naive per-key set union.
    * The Expand node is asserted in PlanSpec. sum_qty is a sum of
    * integer-valued doubles (< 2^53) — order-independent, cast to long
    * on both sides. */
  def qMultiDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("nd_part"),
        countDistinct($"l_suppkey").as("nd_supp"),
        count(lit(1)).as("n"),
        sum($"l_quantity").cast("long").as("sum_qty"))
      .orderBy($"l_returnflag")
  }

  val qMultiDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nd_part,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd_supp,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Quantile estimation from a bottom-k-by-hash sample — the third
    * replayable sketch in the family (KMV = distinct counts, CMS =
    * frequencies, this = quantiles). Bottom-k sampling (Cohen & Kaplan,
    * "Summarizing data using bottom-k sketches", PODC 2007): the k rows
    * with the smallest uniform hash are a uniform-without-replacement
    * sample of the group, and — unlike Bernoulli sampling — the sample
    * size is EXACTLY k, a pure function of the data (no RNG state, same
    * sample on any cluster layout). The group median estimated from the
    * 128-row sample sits next to the exact percentile for comparison,
    * the same exact-vs-sketch surface as q_kmv_distinct.
    *
    * The 40-bit md5 hash and the sampled VALUE are packed into one long
    * (h·64 + qty, qty < 64), so the bounded min-k UDAF carries both:
    * ordering by the packed long IS ordering by (h, qty) — total,
    * deterministic, and replayable in DuckDB with the same md5-derived
    * hash family. Only n_groups × k longs cross the shuffle (the
    * window-rank formulation the oracle uses would shuffle every row);
    * the unpack + median over 128 values is per-group scalar work.
    * At 100 TB this is THE quantile shape: map-side bounded state,
    * mergeable on a combine tree, answer-sized traffic. */
  def qQuantileSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 128
    val key = concat($"l_orderkey".cast("string"), lit(":"),
      $"l_linenumber".cast("string"))
    val h = conv(substring(md5(key.cast("binary")), 1, 10), 16, 10).cast("long")
    val comb = h * 64L + $"l_quantity".cast("long")
    val g = Tables.lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity", comb.as("comb"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        pystreamsspark.operators.TopKAgg.smallestK(k)($"comb").as("ks"))
    val vs = array_sort(transform($"ks", x => x % lit(64L)))
    val m = size(vs)
    val lo = ((m + lit(1)) / lit(2)).cast("int")
    val hi = (m / lit(2)).cast("int") + lit(1)
    g.select($"l_returnflag", $"n", $"exact_p50",
        ((element_at(vs, lo) + element_at(vs, hi)).cast("double") / 2.0)
          .as("sample_p50"))
      .orderBy($"l_returnflag")
  }

  val qQuantileSampleSql: String =
    """WITH li AS (
      |  SELECT l_returnflag, l_quantity,
      |    CAST(concat('0x', substring(md5(concat(CAST(l_orderkey AS VARCHAR),
      |      ':', CAST(l_linenumber AS VARCHAR))), 1, 10)) AS BIGINT) * 64
      |      + CAST(l_quantity AS BIGINT) AS comb
      |  FROM lineitem),
      |ex AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    quantile_cont(l_quantity, 0.5) AS exact_p50
      |  FROM li GROUP BY l_returnflag),
      |r AS (
      |  SELECT l_returnflag, comb % 64 AS val,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY comb) AS rn
      |  FROM li),
      |s AS (
      |  SELECT l_returnflag, val,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY val) AS rv,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS m
      |  FROM r WHERE rn <= 128),
      |med AS (
      |  SELECT l_returnflag,
      |    (CAST(SUM(CASE WHEN rv = (m + 1) // 2 THEN val ELSE 0 END) AS DOUBLE)
      |     + CAST(SUM(CASE WHEN rv = m // 2 + 1 THEN val ELSE 0 END) AS DOUBLE))
      |      / 2.0 AS sample_p50
      |  FROM s GROUP BY l_returnflag)
      |SELECT ex.l_returnflag, CAST(ex.n AS BIGINT) AS n, ex.exact_p50,
      |  med.sample_p50
      |FROM ex JOIN med USING (l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** KMV sketch SET OPERATIONS (Beyer et al., "On Synopses for
    * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007
    * — public work): estimate |A∪B| and |A∩B| between audience sets
    * (distinct users per event_type) from their per-group KMV sketches
    * alone — the mergeable-sketch algebra that lets a 100 TB pipeline
    * answer arbitrary pairwise overlap questions from one
    * sketch-per-segment pass instead of a quadratic pairwise rescan.
    *
    * Mechanics: ks(A∪B) = the k smallest of sorted-merge(ks(A), ks(B));
    * the union estimate is the usual (k−1)·2^40/h_k; ρ = |{h ∈ ks(A∪B):
    * h ∈ ks(A) ∧ h ∈ ks(B)}| is a Binomial(k, J) draw, so
    * |A∩B| ≈ (ρ/k)·|A∪B|. When the merged sketch holds fewer than k
    * hashes both input sketches were complete, so ρ and the sizes are
    * exact. The md5-derived 40-bit hash family exists in both engines
    * (the q_kmv_distinct idiom), so estimator AND exact ground truth
    * replay bit-identically in DuckDB.
    *
    * Shape: one distinct + one bounded-k UDAF agg per group (k·groups
    * rows cross the shuffle), then a 3-row broadcast pair table joined
    * against the 5-row sketch table; the exact intersection side is one
    * user-keyed equi-join and exists only as the oracle's ground truth. */
  def qSketchOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 64
    val scale = lit((k - 1).toDouble * 1099511627776.0) // (k−1)·2^40, exact
    val pairsDf = broadcast(Seq(
      ("click", "purchase"), ("click", "view"), ("signup", "view"))
      .toDF("a_type", "b_type"))
    // high-value audiences (value > 150): at the small SFs the sets sit
    // below k (exact branch); at sf0.1 they are ~10×k (true estimation).
    // The distinct audience table feeds four consumers (exact counts,
    // hashes, and both sides of the ground-truth intersection) —
    // materialize it once so the events scan and the distinct shuffle
    // run once, not per reference.
    val d1 = pystreamsspark.operators.Lineage.truncate(
      Tables.events(spark, sfDir)
        .filter($"value" > 150.0)
        .select($"event_type", $"user_id").distinct())
    val exact = d1.groupBy($"event_type").agg(count(lit(1)).as("n_exact"))
    val hd = d1.select($"event_type",
      conv(substring(md5($"user_id".cast("string").cast("binary")), 1, 10),
        16, 10).cast("long").as("h")).distinct()
    val sk = hd.groupBy($"event_type")
      .agg(pystreamsspark.operators.TopKAgg.smallestK(k)($"h").as("ks"))
    val interExact = pairsDf
      .join(d1.select($"event_type".as("a_type"), $"user_id"), Seq("a_type"))
      .join(d1.select($"event_type".as("b_type"), $"user_id"),
        Seq("b_type", "user_id"))
      .groupBy($"a_type", $"b_type").agg(count(lit(1)).as("n_inter"))
    val j = pairsDf
      .join(broadcast(sk).select($"event_type".as("a_type"), $"ks".as("ka")),
        Seq("a_type"))
      .join(broadcast(sk).select($"event_type".as("b_type"), $"ks".as("kb")),
        Seq("b_type"))
      .join(broadcast(exact).select($"event_type".as("a_type"),
        $"n_exact".as("n_a")), Seq("a_type"))
      .join(broadcast(exact).select($"event_type".as("b_type"),
        $"n_exact".as("n_b")), Seq("b_type"))
      .withColumn("u", array_sort(array_union($"ka", $"kb")))
      .withColumn("nu", size($"u"))
      .withColumn("u64", slice($"u", 1, k))
      .withColumn("rho",
        size(array_intersect(array_intersect($"u64", $"ka"), $"kb")))
      .withColumn("union_est",
        when($"nu" < k, $"nu".cast("double"))
          .otherwise(scale / element_at($"u", k).cast("double")))
      .withColumn("inter_est",
        when($"nu" < k, $"rho".cast("double"))
          .otherwise(($"rho".cast("double") / lit(k.toDouble)) * $"union_est"))
    j.join(interExact, Seq("a_type", "b_type"), "left")
      .na.fill(0L, Seq("n_inter"))
      .select($"a_type", $"b_type", $"n_a", $"n_b", $"n_inter",
        $"rho", $"union_est", $"inter_est")
      .orderBy($"a_type", $"b_type")
  }

  val qSketchOverlapSql: String =
    """WITH p(a_type, b_type) AS (
      |  VALUES ('click', 'purchase'), ('click', 'view'), ('signup', 'view')),
      |d1 AS (SELECT DISTINCT event_type, user_id FROM events
      |       WHERE value > 150.0),
      |ex AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
      |       FROM d1 GROUP BY 1),
      |hd AS (SELECT DISTINCT event_type,
      |  CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 10))
      |    AS BIGINT) AS h FROM d1),
      |r AS (SELECT event_type, h,
      |  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM hd),
      |sk AS (SELECT event_type, list(h ORDER BY h) AS ks
      |       FROM r WHERE rn <= 64 GROUP BY event_type),
      |ie AS (
      |  SELECT p.a_type, p.b_type, CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM p
      |  JOIN d1 a ON a.event_type = p.a_type
      |  JOIN d1 b ON b.event_type = p.b_type AND b.user_id = a.user_id
      |  GROUP BY 1, 2),
      |j AS (
      |  SELECT p.a_type, p.b_type, ea.n_exact AS n_a, eb.n_exact AS n_b,
      |    sa.ks AS ka, sb.ks AS kb,
      |    list_sort(list_distinct(list_concat(sa.ks, sb.ks))) AS u
      |  FROM p
      |  JOIN sk sa ON sa.event_type = p.a_type
      |  JOIN sk sb ON sb.event_type = p.b_type
      |  JOIN ex ea ON ea.event_type = p.a_type
      |  JOIN ex eb ON eb.event_type = p.b_type),
      |j2 AS (
      |  SELECT a_type, b_type, n_a, n_b, ka, kb,
      |    len(u) AS nu, u[1:64] AS u64, u
      |  FROM j),
      |j3 AS (
      |  SELECT a_type, b_type, n_a, n_b, nu,
      |    CAST(len(list_intersect(list_intersect(u64, ka), kb)) AS INT)
      |      AS rho,
      |    CASE WHEN nu < 64 THEN CAST(nu AS DOUBLE)
      |         ELSE (63.0 * 1099511627776.0) / CAST(u[64] AS DOUBLE)
      |    END AS union_est
      |  FROM j2)
      |SELECT j3.a_type, j3.b_type, n_a, n_b,
      |  CAST(COALESCE(ie.n_inter, 0) AS BIGINT) AS n_inter, rho, union_est,
      |  CASE WHEN nu < 64 THEN CAST(rho AS DOUBLE)
      |       ELSE (CAST(rho AS DOUBLE) / 64.0) * union_est
      |  END AS inter_est
      |FROM j3 LEFT JOIN ie
      |  ON ie.a_type = j3.a_type AND ie.b_type = j3.b_type
      |ORDER BY j3.a_type, j3.b_type""".stripMargin

  /** Equi-depth (equal-count) histogram of o_totalprice in two
    * scale-true passes: pass 1 computes the 9 interior decile boundaries
    * with the exact distributed `percentile` aggregate (the
    * quantile_cont-parity path proven by q_percentile — NO global sort,
    * no single-partition ntile window); pass 2 bins every row against
    * the broadcast boundary array with map-side comparisons and
    * aggregates per bin. This is the optimizer-statistics histogram
    * build at 100 TB: two scans, both fully parallel.
    *
    * Bin index = Σ_i [x > b_i] — integer; per-bin count/min/max are
    * exact (min/max of doubles are selections, not arithmetic). */
  def qEqdepthHist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bounds = Tables.orders(spark, sfDir)
      .agg(expr("percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5," +
        "0.6,0.7,0.8,0.9))").as("bs"))
    Tables.orders(spark, sfDir)
      .crossJoin(broadcast(bounds))
      .select($"o_totalprice",
        aggregate(transform($"bs",
            b => when($"o_totalprice" > b, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).as("bin"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        min($"o_totalprice").as("lo"),
        max($"o_totalprice").as("hi"))
      .orderBy($"bin")
  }

  val qEqdepthHistSql: String =
    """WITH b AS (
      |  SELECT [quantile_cont(o_totalprice, 0.1), quantile_cont(o_totalprice, 0.2),
      |          quantile_cont(o_totalprice, 0.3), quantile_cont(o_totalprice, 0.4),
      |          quantile_cont(o_totalprice, 0.5), quantile_cont(o_totalprice, 0.6),
      |          quantile_cont(o_totalprice, 0.7), quantile_cont(o_totalprice, 0.8),
      |          quantile_cont(o_totalprice, 0.9)] AS bs
      |  FROM orders),
      |binned AS (
      |  SELECT o_totalprice,
      |    CAST(len(list_filter(bs, x -> o_totalprice > x)) AS INT) AS bin
      |  FROM orders CROSS JOIN b)
      |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
      |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      |FROM binned
      |GROUP BY bin
      |ORDER BY bin""".stripMargin

  /** Winsorized statistics: clamp o_totalprice to its own [p5, p95]
    * band, then aggregate — outlier-robust mean/extremes without
    * dropping rows, the standard pre-step before fitting anything to a
    * heavy-tailed metric. Two scale-true passes (the q_eqdepth_hist
    * shape): exact distributed percentile bounds → 1-row broadcast →
    * map-side clamp + partial/final agg. The clamped mean exits via the
    * §7.5 decimal route; min/max/bounds are stored-value selections. */
  def qWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bounds = Tables.orders(spark, sfDir)
      .agg(expr("percentile(o_totalprice, 0.05)").as("p05"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
    Tables.orders(spark, sfDir)
      .crossJoin(broadcast(bounds))
      .select(least(greatest($"o_totalprice", $"p05"), $"p95").as("w"),
        $"p05", $"p95")
      .groupBy($"p05", $"p95")
      .agg(count(lit(1)).as("n"),
        davg($"w").as("mean_w"),
        min($"w").as("min_w"),
        max($"w").as("max_w"))
      .select($"n", $"p05", $"p95", $"mean_w", $"min_w", $"max_w")
  }

  val qWinsorizeSql: String =
    s"""WITH b AS (
       |  SELECT quantile_cont(o_totalprice, 0.05) AS p05,
       |         quantile_cont(o_totalprice, 0.95) AS p95
       |  FROM orders),
       |c AS (
       |  SELECT LEAST(GREATEST(o_totalprice, p05), p95) AS w, p05, p95
       |  FROM orders CROSS JOIN b)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n, p05, p95,
       |  ${sqlAvg("w")} AS mean_w,
       |  MIN(w) AS min_w, MAX(w) AS max_w
       |FROM c
       |GROUP BY p05, p95""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_winsorize"       -> (qWinsorize _),
    "q_sketch_overlap"  -> (qSketchOverlap _),
    "q_eqdepth_hist"    -> (qEqdepthHist _),
    "q_quantile_sample" -> (qQuantileSample _),
    "q_rollup"          -> (qRollup _),
    "q_cube"            -> (qCube _),
    "q_percentile"      -> (qPercentile _),
    "q_collect_list"    -> (qCollectList _),
    "q_multi_distinct"  -> (qMultiDistinct _),
    "q_kmv_distinct"    -> (qKmvDistinct _),
    "q_cms_freq"        -> (qCmsFreq _),
    "q_approx_distinct" -> (qApproxDistinct _))

  val oracle: Map[String, String] = Map(
    "q_winsorize"      -> qWinsorizeSql,
    "q_sketch_overlap" -> qSketchOverlapSql,
    "q_eqdepth_hist"   -> qEqdepthHistSql,
    "q_quantile_sample" -> qQuantileSampleSql,
    "q_rollup"         -> qRollupSql,
    "q_cube"           -> qCubeSql,
    "q_percentile"     -> qPercentileSql,
    "q_collect_list"   -> qCollectListSql,
    "q_multi_distinct" -> qMultiDistinctSql,
    "q_kmv_distinct"   -> qKmvDistinctSql,
    "q_cms_freq"       -> qCmsFreqSql)
}
