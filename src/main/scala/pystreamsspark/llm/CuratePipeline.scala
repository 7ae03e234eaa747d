package pystreamsspark.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composed deliverable a user
  * of the reference library would reach for: one call that chains the
  * repo's operators into the standard pre-training data funnel
  *
  *   normalize → language filter → quality filter → exact dedup →
  *   near-dup prune → decontaminate vs an eval set → pack into
  *   fixed-token-budget training chunks
  *
  * Every stage is one of the already-verified operators ([[TextOps]],
  * [[Dedup]], [[Contamination]], `operators.SeqPack`), so the pipeline
  * inherits their scale shapes: per-row codegen'd normalization and
  * scoring, hash-bucketed exact dedup, banded/blocked near-dup pruning,
  * gram-keyed decontamination with the broadcast df-cap ban list, and
  * the two-pass prefix-sum packer. No stage collects rows to the
  * driver; each returns a DataFrame, so callers can splice in or drop
  * stages freely.
  *
  * Stage accounting: [[curateWithStats]] returns per-stage surviving-doc
  * counts alongside the final packed chunks, the audit trail a
  * production curation run logs.
  */
object CuratePipeline {

  /** Keep-decision quality gate mirroring the q_quality_score features:
    * enough tokens, not too repetitive, sane mean token length. */
  private def qualityGate(text: Column): Column = {
    val feats = TextOps.qualityFeatures(text).toMap
    feats("n_tokens") >= 5 &&
      feats("uniq_ratio") >= 0.2 &&
      feats("mean_token_len") >= 2.0 && feats("mean_token_len") <= 20.0
  }

  /** The composed funnel. `eval` is the held-out set to decontaminate
    * against (pass an empty frame with (idCol, textCol) to skip).
    * Returns the packed chunk assignment: (id, chunk_id) + carried doc
    * columns, where every chunk holds ≤ `tokenBudget` tokens. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             eval: DataFrame, langs: Seq[String] = Seq("en"),
             neardupThreshold: Double = 0.8,
             tokenBudget: Long = 4096,
             keepBest: Boolean = false): DataFrame =
    curateWithStats(docs, idCol, textCol, eval, langs,
      neardupThreshold, tokenBudget, keepBest)._1

  /** [[curate]] plus the per-stage survivor counts (stage, n_docs).
    * `keepBest = true` switches the near-dup canonical policy from
    * min-id to highest-token-count (ties to smaller id) — the
    * keep-the-richest-variant rule ([[Dedup.neardupPruneBest]]). */
  def curateWithStats(docs: DataFrame, idCol: String, textCol: String,
                      eval: DataFrame, langs: Seq[String] = Seq("en"),
                      neardupThreshold: Double = 0.8,
                      tokenBudget: Long = 4096,
                      keepBest: Boolean = false): (DataFrame, Seq[(String, Long)]) = {
    val stats = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def stage(name: String, df: DataFrame): DataFrame = {
      stats += name -> df.count(); df
    }

    val normed = stage("0_input", docs)
      .withColumn(textCol, Dedup.normText(col(textCol)))
    val inLang = stage("1_normalized", normed)
      .filter(TextOps.langIdHeuristic(col(textCol)).isin(langs.map(lit): _*))
    val quality = stage("2_language", inLang)
      .filter(qualityGate(col(textCol)))
    val exact = stage("3_quality", quality)
      .withColumn("__h", xxhash64(col(textCol)))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__h"), col(textCol)).orderBy(col(idCol))))
      .filter(col("__rk") === 1).drop("__h", "__rk")
    val neardup = stage("4_exact_dedup", exact.cache())
    val blockCols = Seq.empty[String] ++
      (if (neardup.columns.contains("lang")) Seq("lang") else Nil)
    val pruned =
      if (keepBest)
        Dedup.neardupPruneBest(neardup, idCol, textCol, blockCols,
          threshold = neardupThreshold,
          qualityCol = TextOps.tokenCount(col(textCol)))
      else Dedup.neardupPrune(neardup, idCol, textCol, blockCols,
        threshold = neardupThreshold)
    val clean = stage("5_neardup_prune", pruned.cache())
    val decontaminated =
      if (eval.isEmpty) clean
      else {
        val hits = Contamination.contaminationPairs(
          clean, eval, idCol, textCol, n = 3, minShared = 2, maxDf = 1000L)
          .select(col("train_id").as(idCol)).distinct()
        clean.join(hits, Seq(idCol), "left_anti")
      }
    val fin = stage("6_decontaminated", decontaminated.cache())
    val packed = pystreamsspark.operators.SeqPack.packChunks(
        fin.withColumn("__ntok", TextOps.tokenCount(col(textCol))),
        idCol, "__ntok", budget = tokenBudget)
      .select(col("id").as(idCol), col("chunk").as("chunk_id"))
      .join(fin, Seq(idCol))
    stats += "7_packed_docs" -> packed.count()
    neardup.unpersist(); clean.unpersist(); fin.unpersist()
    (packed, stats.toSeq)
  }
}
