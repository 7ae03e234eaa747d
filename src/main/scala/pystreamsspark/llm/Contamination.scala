package pystreamsspark.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/test contamination detection: which evaluation documents leak
  * into the training corpus via shared word n-grams — the
  * decontamination pass every LLM training pipeline runs before
  * training (cf. the GPT-3 / Gopher appendix methodology: n-gram
  * overlap with a document-frequency cap; public method).
  *
  * Funnel (the 100 TB shape — never test×train all-pairs):
  *   1. explode each side into its DISTINCT word n-grams (map-side);
  *   2. compute train-side df per gram and DROP grams with
  *      df > maxDf — ubiquitous phrases ("in the case of") would
  *      otherwise fan out quadratically and signal nothing, exactly
  *      why published decontamination pipelines cap df. The count is
  *      a gram-partitioned window fused into the stream's one shuffle
  *      (see below), not a separate aggregate pass;
  *   3. equi-join test grams ⋈ train grams on the gram itself —
  *      shuffle keyed by gram, only co-occurring docs ever meet;
  *   4. count shared grams per (test_doc, train_doc); keep pairs
  *      with at least minShared.
  * Output: (test_id, train_id, n_shared).
  *
  * Grams stay STRINGS here so the whole pipeline is oracle-checkable
  * verbatim; at 100 TB swap step 1 to `shingle_hash` (8-byte grams)
  * — semantics identical, shuffle 10-20× lighter.
  */
object Contamination {

  def contaminationPairs(train: DataFrame, test: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, minShared: Int = 2,
                         maxDf: Long = 50L): DataFrame = {
    def grams(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol).as(as),
          explode(array_distinct(Dedup.shingles(col(textCol), n))).as("gram"))
    val trainGrams = grams(train, "train_id")
    val testGrams = grams(test, "test_id")
    // df cap on the TRAIN side, fused into the stream's ONE shuffle: a
    // gram-partitioned window counts df in-partition and the filtered
    // stream comes out ALREADY HashPartitioning(gram)-distributed, which
    // the pairs join below reuses — so train grams are read once and
    // shuffled once, total. (A broadcast-anti formulation was measured
    // slower: it re-reads + re-explodes the train side for the ban-list
    // aggregate, and the pairs join still needs the full-stream shuffle.)
    val keptTrain = trainGrams
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))))
      .filter(col("df") <= maxDf)
      .select(col("train_id"), col("gram"))
    testGrams.join(keptTrain, "gram")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
