package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import pystreamsspark.llm.Dedup

/** Graph analytics over the near-duplicate similarity graph (the same
  * edge list the dedup clustering consumes) — connected components live
  * in `llm.Dedup`; this module holds the pattern-matching side.
  *
  * Triangle counting: enumerate each triangle once via the DEGREE-
  * oriented two-join (the classic MapReduce-triangles skew fix, cf.
  * Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  * Reducer", WWW 2011 — public algorithm): orient every edge from its
  * lower-(degree, id) endpoint to its higher one, build wedges by
  * joining oriented edges on their SOURCE, and close each wedge with a
  * third equi-join. Every wedge then pivots at its lowest-degree
  * vertex, so per-join-key fan-out is bounded by O(sqrt(|E|)) even when
  * the graph has a hub whose raw degree is ~|V| — under raw-id
  * orientation that hub serializes one reducer. Each triangle is
  * enumerated exactly once (its unique min-rank vertex is the pivot),
  * so per-node participation counts are identical to any other
  * orientation — which keeps the oracle SQL orientation-free.
  */
object GraphQueries {

  /** Per-node triangle participation counts over an undirected edge
    * list given as one row per edge (any per-row endpoint order). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // total order on vertices: (degree, id) — unique since ids are unique
    val deg = edges.select(col("a").as("id"))
      .unionAll(edges.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    // oriented edge u -> v with rank(u) < rank(v); carry v's rank for the
    // wedge-ordering filter below
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("u"),
      when(aFirst, col("b")).otherwise(col("a")).as("v"),
      when(aFirst, col("db")).otherwise(col("da")).as("dv"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        (col("e1.dv") < col("e2.dv") ||
          (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    // the closing edge y-z is oriented y -> z because rank(y) < rank(z)
    // by the wedge filter — one equi-join, no inequality probe
    val tris = wedges
      .join(oriented.as("e3"),
        col("y") === col("e3.u") && col("z") === col("e3.v"))
      .select(col("x"), col("y"), col("z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Per-node triangle participation counts (the clustering-coefficient
    * numerator) over the exact-Jaccard >= 0.5 near-dup graph. */
  def qTriangles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val edges = Dedup.jaccardPairs(Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("lang", "source"), threshold = 0.5)
      .select($"id_a".as("a"), $"id_b".as("b"))
    triangleCounts(edges).orderBy($"id")
  }

  val qTrianglesSql: String =
    """WITH t AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), e AS (
      |  SELECT a.doc_id AS a, b.doc_id AS b
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      |), tri AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1
      |  JOIN e e2 ON e1.b = e2.a
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |)
      |SELECT id, COUNT(*) AS n_triangles
      |FROM (SELECT x AS id FROM tri UNION ALL
      |      SELECT y FROM tri UNION ALL
      |      SELECT z FROM tri)
      |GROUP BY id
      |ORDER BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_triangles" -> (qTriangles _))

  val oracle: Map[String, String] = Map(
    "q_triangles" -> qTrianglesSql)
}
