package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import pystreamsspark.llm.Dedup

/** Graph analytics over the near-duplicate similarity graph (the same
  * edge list the dedup clustering consumes) — connected components live
  * in `llm.Dedup`; this module holds the pattern-matching side.
  *
  * Triangle counting: enumerate each triangle once via the id-oriented
  * two-join (a<b<c): edges(a,b) ⋈ edges(b,c) builds open wedges, a third
  * join closes them against edges(a,c). Both joins are equi-joins on a
  * vertex key — no cartesian anywhere. At 100 TB the orientation would
  * be by (degree, id) instead of raw id (the classic skew fix: every
  * wedge pivots at its LOWEST-degree vertex, bounding per-key fanout at
  * sqrt(|E|)); id orientation keeps the enumeration oracle-identical
  * here and the join shape is the same.
  */
object GraphQueries {

  /** Per-node triangle participation counts over an id-oriented edge
    * list (`a` < `b` in every row). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val wedges = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val tris = wedges
      .join(edges.as("e3"), col("x") === col("e3.a") && col("z") === col("e3.b"))
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
      .select($"id_a".as("a"), $"id_b".as("b")) // id_a < id_b by construction
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
