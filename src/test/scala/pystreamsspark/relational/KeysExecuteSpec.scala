package pystreamsspark.relational

import pystreamsspark.SparkSpec

/** Whole-surface execution smoke: every key registered in
  * `SparkEntry.queries` must ANALYZE and EXECUTE at sf0.001 inside
  * `sbt test` — so a registration-time break (a bad loader, a renamed
  * column, a function that stops resolving) fails here in one obvious
  * place instead of 40 obscure ones at driver time. Value correctness
  * stays the DuckDB oracle's job.
  */
class KeysExecuteSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query key analyzes and executes") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).limit(1).collect(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, s"${failures.size} keys failed:\n" +
      failures.mkString("\n"))
    assert(graft.SparkEntry.queries.size >= 220)
  }

  test("the driver's flagship entry() returns rows (smoke contract)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle entry has a matching query registration") {
    val orphaned = graft.SparkEntry.oracleSql.keySet --
      graft.SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle entries without queries: $orphaned")
  }
}
