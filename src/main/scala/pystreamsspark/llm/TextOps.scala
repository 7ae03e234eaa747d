package pystreamsspark.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: tokenization,
  * quality scoring, language-ID heuristics, fingerprinting, TF-IDF.
  *
  * Everything is built from codegen'd `functions._` expressions — no UDFs,
  * so every operator stays inside WholeStageCodegen and distributes as a
  * plain projection/aggregation at any scale. Per-document work is
  * embarrassingly parallel (no shuffle); the aggregating ops (TF-IDF,
  * token stats) shuffle once on the token key with map-side partial
  * aggregation.
  */
object TextOps {

  /** Whitespace tokenization, empty tokens dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** BPE-ish subword segmentation: splits on whitespace, then breaks each
    * word into runs of letters / digits / other (the GPT-2-style pre-token
    * regex families), lowercased. Pure regexp — codegen'd. */
  def subwordTokens(text: Column): Column =
    filter(
      split(
        regexp_replace(lower(text), "([a-z]+|[0-9]+|[^a-z0-9 ]+)", "$1"),
        "[ ]+"),
      t => t =!= "")

  /** Exact token count (whitespace discipline). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Quality-score feature columns: token counts, unique ratio, mean token
    * length, stopword ratio. All exact-integer counts + single IEEE
    * divisions — deterministic across engines. */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "and", "to", "in")

  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    // nTok=0 guard: an EMPTY document would hit ANSI's divide-by-zero
    // error and brick the whole scoring job on one degenerate row
    // (same crash class fixed in Dedup round 9); ratios of an empty
    // doc are 0.0 by definition here
    def ratio(num: Column): Column =
      when(nTok === 0, lit(0.0)).otherwise(num.cast("double") / nTok)
    Seq(
      "n_tokens" -> nTok,
      "n_uniq_tokens" -> nUniq,
      "uniq_ratio" -> ratio(nUniq),
      "n_stopwords" -> nStop,
      "stopword_ratio" -> ratio(nStop),
      "sum_token_len" -> sumLen,
      "mean_token_len" -> ratio(sumLen))
  }

  /** Order-sensitive document fingerprint: position-weighted polynomial
    * over per-token codes, mod 1e9+7. Sum of exact integers — order of
    * aggregation doesn't matter, but token ORDER in the document does
    * (position i is part of each addend), so permuted documents get
    * different fingerprints while the computation stays a plain integer
    * SUM (distributable, deterministic). */
  def fingerprint(text: Column): Column = {
    val toks = tokens(text)
    val codes = zip_with(
      toks, sequence(lit(1), greatest(size(toks), lit(1))),
      (t, i) => i * (ascii(substring(t, 1, 1)) * 131L + length(t)))
    coalesce(aggregate(codes, lit(0L), (acc, c) => acc + c) % 1000000007L, lit(0L))
  }

  /** Heuristic language-ID over token profiles. On natural text this
    * would use char-n-gram frequency profiles; the rule set here is the
    * deterministic skeleton (stopword densities + mean token length) so
    * the operator is oracle-checkable. Returns a lang code column. */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    def density(words: Seq[String]) =
      size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") / nTok
    val theDensity = density(Seq("the", "a"))
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val meanLen = sumLen.cast("double") / nTok
    when(nTok === 0, "und")
      .when(theDensity >= 0.08, "en")
      .when(meanLen >= 5.0, "de")
      .when(meanLen < 4.2, "zh")
      .otherwise("other")
  }

  /** TF-IDF per (doc, token). `idf` uses the exact-rational form
    * n_docs/df so compared outputs are bit-deterministic; pass
    * `logIdf = true` for the classic ln(N/df) variant (float log is
    * libm-dependent — keep it out of cross-engine comparisons). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String,
            logIdf: Boolean = false): DataFrame = {
    val tokenized = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val tf = tokenized.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // corpus size as a broadcast 1-row aggregate, not a driver action —
    // the whole pipeline stays one plan (no extra job per execution)
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val withN = tf.join(df, "token").crossJoin(broadcast(nDf))
    val idf =
      if (logIdf) log(col("n_docs").cast("double") / col("df"))
      else col("n_docs").cast("double") / col("df")
    withN.withColumn("tfidf", col("tf") * idf)
  }
}
