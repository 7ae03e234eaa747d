package pystreamsspark.relational

import java.nio.file.{Files, Paths}
import pystreamsspark.SparkSpec

/** SqlQueries must register only the tables each query reads, so a fault
  * in one table's loader (or a missing file) cannot take down unrelated
  * SQL keys. Round 4 regression: the events remount broke ALL 8 SQL keys
  * because `views` eagerly registered every table.
  *
  * Proof: a data dir with every table EXCEPT events. Q5/Q10/lateral don't
  * read events and must still run; qPivot (which genuinely reads events)
  * must fail.
  */
class SqlViewIsolationSpec extends SparkSpec {

  test("SQL keys not reading events survive a missing events table") {
    val src = Paths.get("/root/testdata/sf0.001")
    val dir = Files.createTempDirectory(Paths.get("target"), "sql-iso-")
    pystreamsspark.io.Tables.tableNames.filterNot(_ == "events").foreach { t =>
      Files.createSymbolicLink(dir.resolve(s"$t.parquet"),
        src.resolve(s"$t.parquet"))
    }
    val d = dir.toString
    assert(SqlQueries.qSqlQ5(spark, d).count() > 0)
    assert(SqlQueries.qSqlQ10(spark, d).count() > 0)
    assert(SqlQueries.qLateral(spark, d).count() > 0)
    assert(SqlQueries.qRecursive(spark, d).count() > 0)
    // Sanity: a key that DOES read events still fails against this dir —
    // the isolation is per-dependency, not a silent swallow.
    intercept[Exception] { SqlQueries.qPivot(spark, d).count() }
  }
}
