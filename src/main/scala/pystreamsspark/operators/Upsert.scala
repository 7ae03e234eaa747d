package pystreamsspark.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changeset application (MERGE semantics without a table format):
  * apply a stream of keyed Insert/Update/Delete changes to a snapshot.
  *
  *   1. collapse the changeset to the LATEST change per key
  *      (row_number over the change-sequence column — one shuffle on
  *      the key, WindowGroupLimit prunes rank > 1 before the sort
  *      spills);
  *   2. snapshot rows whose key has ANY change are anti-joined away;
  *   3. surviving latest changes with op != 'D' (inserts + updates)
  *      are unioned in.
  *
  * Everything shuffles on the merge key once — the same plan a MERGE
  * INTO compiles to in lakehouse engines; at 100 TB the snapshot side
  * would additionally prune files by key-range/partition stats before
  * the anti-join, which is a storage-layout concern, not a plan change.
  */
object Upsert {

  /** `changes` must contain `keyCol`, `seqCol` (change order), `opCol`
    * ('U' upsert / 'D' delete) and the snapshot's payload columns for
    * op='U' rows. Result has exactly the snapshot's columns. */
  def apply(snapshot: DataFrame, changes: DataFrame,
            keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val cols = snapshot.columns.toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val untouched = snapshot.join(latest.select(col(keyCol)), Seq(keyCol), "left_anti")
    val applied = latest.filter(col(opCol) =!= "D").select(cols.map(col): _*)
    untouched.unionByName(applied)
  }
}
