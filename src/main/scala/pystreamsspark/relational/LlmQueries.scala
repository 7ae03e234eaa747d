package pystreamsspark.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import pystreamsspark.io.Tables
import pystreamsspark.llm.{Contamination, Dedup, Similarity, TextOps}
import Det._

/** LLM-training-data pipeline operators (SURVEY.md §2.8) as oracle-checked
  * queries. The sketch-based ops (MinHash-LSH, SimHash, ANN) hash with
  * xxhash64, which DuckDB lacks — those keys are registered without an
  * oracle entry (driver rows-only check) and are covered by ScalaTest
  * properties instead.
  */
object LlmQueries {

  /** Exact dedup by normalized text; keeps the smallest doc_id. The
    * library op ([[Dedup.exact]]) leads the shuffle key with xxhash64 of
    * the text — here the compared output is just (keep_id, n_copies). */
  def qDedupExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.exact(Tables.documents(spark, sfDir), "doc_id", "text")
      .select($"keep_id", $"n_copies")
      .orderBy($"keep_id")
  }

  val qDedupExactSql: String =
    """SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY lower(trim(text))
      |ORDER BY keep_id""".stripMargin

  /** Incremental dedup: documents arriving as a "new" batch (odd ids)
    * are kept only if their normalized text hash is unseen in the
    * existing corpus (even ids) — the anti-join delta-ingestion shape
    * (at 100 TB the existing side is a pre-built hash index, and the
    * anti join is a broadcast or bloom-filter pre-pass). */
  def qDedupDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val existing = docs.filter($"doc_id" % 2 === 0)
      .select(Dedup.normText($"text").as("norm"))
    val incoming = docs.filter($"doc_id" % 2 === 1)
      .select($"doc_id", Dedup.normText($"text").as("norm"))
    incoming.join(existing, Seq("norm"), "left_anti")
      .select($"doc_id")
      .orderBy($"doc_id")
  }

  val qDedupDeltaSql: String =
    """SELECT doc_id
      |FROM documents n
      |WHERE doc_id % 2 = 1
      |  AND NOT EXISTS (
      |    SELECT 1 FROM documents e
      |    WHERE e.doc_id % 2 = 0
      |      AND lower(trim(e.text)) = lower(trim(n.text)))
      |ORDER BY doc_id""".stripMargin

  /** Incremental NEAR-dup delta ([[Dedup.neardupDelta]]): which docs of
    * a 20% incoming batch (doc_id % 5 == 0) are exact-Jaccard-0.5
    * near-duplicates of the 80% existing corpus, within (lang, source)
    * blocks. The continuous-ingestion shape: existing corpus scanned
    * once, batch broadcast, verify candidate-local — never batch×batch
    * or corpus×corpus. Oracle is the quadratic cross join in DuckDB
    * (MATERIALIZED token CTE). */
  def qNeardupDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    Dedup.neardupDelta(
        docs.filter($"doc_id" % 5 =!= 0), docs.filter($"doc_id" % 5 === 0),
        "doc_id", "text", Seq("lang", "source"), threshold = 0.5)
      .orderBy($"id")
  }

  val qNeardupDeltaSql: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), p AS (
      |  SELECT i.doc_id AS id, e.doc_id AS eid,
      |    CAST(len(list_intersect(i.toks, e.toks)) AS DOUBLE) /
      |      (len(i.toks) + len(e.toks) - len(list_intersect(i.toks, e.toks)))
      |      AS jaccard
      |  FROM t i JOIN t e
      |    ON i.lang = e.lang AND i.source = e.source
      |   AND i.doc_id % 5 = 0 AND e.doc_id % 5 <> 0
      |)
      |SELECT id, COUNT(*) AS n_matches, MIN(eid) AS min_match,
      |  MAX(jaccard) AS max_jaccard
      |FROM p WHERE jaccard >= 0.5
      |GROUP BY id ORDER BY id""".stripMargin

  /** Global top-20 tokens by frequency (explode → partial agg → final →
    * TakeOrderedAndProject: only (token, count) partials shuffle). */
  def qTokensTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // explode the raw split and filter AFTER: the post-explode filter is
    // codegen'd, while filtering inside the array (HOF lambda) is
    // interpreted per element
    Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"token")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token".asc)
      .limit(20)
  }

  val qTokensTopkSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY n DESC, token ASC
      |LIMIT 20""".stripMargin

  /** TF-IDF with the exact-rational idf (n_docs/df) so every compared
    * column is bit-deterministic: tfidf = tf * (n_docs/df), fixed op
    * order on both sides. (The classic ln() idf is available via
    * [[TextOps.tfidf]] logIdf=true — kept out of the oracle because
    * float log is libm-dependent.) */
  def qTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    TextOps.tfidf(Tables.documents(spark, sfDir), "doc_id", "text")
      .select($"doc_id", $"token", $"tf", $"df", $"n_docs", $"tfidf")
      .orderBy($"doc_id", $"token")
  }

  val qTfidfSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
      |), tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf FROM tok WHERE token <> '' GROUP BY 1, 2
      |), df AS (
      |  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
      |), n AS (SELECT COUNT(*) AS n_docs FROM documents)
      |SELECT doc_id, token, tf, df, n_docs,
      |  tf * (CAST(n_docs AS DOUBLE) / df) AS tfidf
      |FROM tf JOIN df USING (token) CROSS JOIN n
      |ORDER BY doc_id, token""".stripMargin

  /** Corpus stats per (lang, source): doc counts and exact integer char
    * sums — the first profiling pass of any training-data pipeline. */
  def qLangStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .groupBy($"lang", $"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_chars").as("sum_chars"),
        min($"n_chars").as("min_chars"),
        max($"n_chars").as("max_chars"))
      .orderBy($"lang", $"source")
  }

  val qLangStatsSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Per-document quality features: exact integer counts + single IEEE
    * divisions (deterministic across engines). */
  def qQualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val feats = TextOps.qualityFeatures($"text")
    Tables.documents(spark, sfDir)
      .select(($"doc_id" +: feats.map { case (n, c) => c.as(n) }): _*)
      .orderBy($"doc_id")
  }

  val qQualityScoreSql: String = {
    val stop = TextOps.stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents)
       |SELECT doc_id,
       |  len(toks) AS n_tokens,
       |  len(list_distinct(toks)) AS n_uniq_tokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS uniq_ratio,
       |  len(list_filter(toks, x -> x IN ($stop))) AS n_stopwords,
       |  CAST(len(list_filter(toks, x -> x IN ($stop))) AS DOUBLE) / len(toks) AS stopword_ratio,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_token_len,
       |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_token_len
       |FROM t
       |ORDER BY doc_id""".stripMargin
  }

  /** Hashing-trick LINEAR CLASSIFIER scoring (the fastText-style
    * quality-model shape): token → feature bucket (md5 mod 256) →
    * integer weight → per-document score = bias + Σ w(bucket(t)),
    * thresholded into keep/drop. The weights here are a DETERMINISTIC
    * stand-in (LCG of the bucket id) so the whole pipeline is exact
    * integer arithmetic the DuckDB oracle replays bit-for-bit; swapping
    * in a trained vector changes ONE broadcast lookup, not the plan.
    * Scale shape: explode → per-row arithmetic (no weight-table join at
    * all with the hashing trick; a learned table would broadcast) →
    * map-side partial sum per doc — shuffle payload is one row per doc,
    * never the token stream. */
  def qHashClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "")
    // md5→BIGINT idiom (10 hex chars = 40 bits, positive in both
    // engines), bucketed to 256 features; weight ∈ [-20, 20]
    val bucket =
      conv(substring(md5($"t".cast("binary")), 1, 10), 16, 10)
        .cast("long") % 256L
    val w = (bucket * 1103515245L + 12345L) % 41L - 20L
    toks.select($"doc_id", w.as("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), (sum($"w") - 3L).as("score"))
      .withColumn("label",
        when($"score" > 0L, lit("keep")).otherwise(lit("drop")))
      .orderBy($"doc_id")
  }

  val qHashClassifierSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents
      |), w AS (
      |  SELECT doc_id,
      |    ((CAST(concat('0x', substring(md5(t), 1, 10)) AS BIGINT) % 256)
      |      * 1103515245 + 12345) % 41 - 20 AS w
      |  FROM tok)
      |SELECT doc_id, COUNT(*) AS n_tokens,
      |  CAST(SUM(w) - 3 AS BIGINT) AS score,
      |  CASE WHEN SUM(w) - 3 > 0 THEN 'keep' ELSE 'drop' END AS label
      |FROM w
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic vs the labeled lang column: confusion counts.
    * (Deterministic rule skeleton — see [[TextOps.langIdHeuristic]].) */
  def qLangid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"lang", TextOps.langIdHeuristic($"text").as("pred"))
      .groupBy($"lang", $"pred")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"pred")
  }

  val qLangidSql: String =
    """WITH t AS (
      |  SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), f AS (
      |  SELECT lang,
      |    CAST(len(list_filter(toks, x -> x IN ('the', 'a'))) AS DOUBLE) / len(toks) AS the_density,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_len,
      |    len(toks) AS n_tok
      |  FROM t)
      |SELECT lang,
      |  CASE WHEN n_tok = 0 THEN 'und'
      |       WHEN the_density >= 0.08 THEN 'en'
      |       WHEN mean_len >= 5.0 THEN 'de'
      |       WHEN mean_len < 4.2 THEN 'zh'
      |       ELSE 'other' END AS pred,
      |  COUNT(*) AS n
      |FROM f
      |GROUP BY 1, 2
      |ORDER BY lang, pred""".stripMargin

  /** Order-sensitive rolling fingerprint (position-weighted polynomial
    * mod 1e9+7) — pure integer math, distributable as a plain SUM. */
  def qFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", TextOps.fingerprint($"text").as("fingerprint"))
      .orderBy($"doc_id")
  }

  val qFingerprintSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), e AS (
      |  SELECT doc_id, i, toks[i] AS tok
      |  FROM t, UNNEST(generate_series(1, len(toks))) AS u(i))
      |SELECT doc_id,
      |  CAST(SUM(i * (ascii(substr(tok, 1, 1)) * 131 + length(tok))) % 1000000007 AS BIGINT)
      |    AS fingerprint
      |FROM e
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Brute-force cosine top-10 vs the vec_id=0 probe. Sequential double
    * folds on both sides (see Similarity scaladoc) keep the scores
    * bit-identical to DuckDB's ordered SUM. */
  def qKnnCosine(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val probe = emb.filter($"vec_id" === 0).select($"embedding".as("probe"))
    Similarity.knn(emb, "vec_id", "embedding", probe, 10)
  }

  // list_dot_product over DOUBLE[] casts: per-row sequential double
  // accumulation — same IEEE sequence as Spark's fused loop. (A
  // subquery-SUM formulation is decorrelated by DuckDB into a PARALLEL
  // aggregate whose combine order is nondeterministic across runs —
  // observed as 1-ulp wobble at sf0.1.)
  val qKnnCosineSql: String =
    """WITH p AS (SELECT CAST(embedding AS DOUBLE[]) AS pe FROM embeddings WHERE vec_id = 0),
      |s AS (
      |  SELECT vec_id,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), p.pe) AS dot,
      |    list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS na,
      |    list_dot_product(p.pe, p.pe) AS nb
      |  FROM embeddings e CROSS JOIN p)
      |SELECT vec_id, dot / (sqrt(na) * sqrt(nb)) AS cosine
      |FROM s
      |ORDER BY cosine DESC, vec_id ASC
      |LIMIT 10""".stripMargin

  /** Exact same-label near-dup pairs, global top-20 by cosine (the IVF
    * verify step with label as the coarse cell). */
  def qEmbedNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Similarity.blockedPairs(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", "label",
        threshold = -1.0)
      .orderBy($"cosine".desc, $"id_a".asc, $"id_b".asc)
      .limit(20)
      .select($"block", $"id_a", $"id_b", $"cosine")
  }

  // same per-row list_dot_product discipline as qKnnCosineSql
  val qEmbedNeardupSql: String =
    """WITH s AS (
      |  SELECT a.label AS block, a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS dot,
      |    list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])) AS na,
      |    list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS nb
      |  FROM embeddings a JOIN embeddings b
      |    ON a.label = b.label AND a.vec_id < b.vec_id)
      |SELECT block, id_a, id_b, dot / (sqrt(na) * sqrt(nb)) AS cosine
      |FROM s
      |ORDER BY cosine DESC, id_a ASC, id_b ASC
      |LIMIT 20""".stripMargin

  /** Blocked exact n-gram Jaccard pairs (lang, source blocking) at
    * threshold 0.5, top-50 — the oracle-checkable near-dup variant.
    * Uses [[pystreamsspark.llm.Dedup.jaccardPairs]]'s cost-based
    * dispatch; on this corpus the stats sample detects a near-uniform
    * 31-token vocabulary (zero pruning power) and picks the block join.
    * The prefix-filter plan is driver-verified by [[qJaccardPrefix]]. */
  def qJaccardPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.jaccardPairs(Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("lang", "source"), threshold = 0.5)
      .orderBy($"jaccard".desc, $"id_a".asc, $"id_b".asc)
      .limit(50)
      .select($"id_a", $"id_b", $"n_inter", $"n_union", $"jaccard")
  }

  val qJaccardPairsSql: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents)
      |SELECT * FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.toks, b.toks)) AS n_inter,
      |    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS n_union,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.5
      |ORDER BY jaccard DESC, id_a ASC, id_b ASC
      |LIMIT 50""".stripMargin

  /** EXACT-RECALL prefix-filtered similarity join (AllPairs/PPJoin),
    * FORCED strategy — value-verifies the whole prefix funnel
    * (df-ordered token sort → prefix explode → candidate join → length
    * filter → exact verify) against DuckDB's all-pairs formulation: one
    * lost true pair breaks the hash. Restricted to two sources so the
    * deliberately pruning-hostile corpus (31-token uniform vocabulary —
    * candidates ~= all pairs with ~9x multiplicity) keeps the key
    * affordable in Bench; recall-exactness is input-independent. */
  def qJaccardPrefix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.jaccardPairs(
        Tables.documents(spark, sfDir).filter($"source".isin("src3", "src7")),
        "doc_id", "text", Seq("lang", "source"), threshold = 0.5,
        strategy = "prefix")
      .orderBy($"id_a".asc, $"id_b".asc)
      .select($"id_a", $"id_b", $"n_inter", $"n_union", $"jaccard")
  }

  val qJaccardPrefixSql: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents WHERE source IN ('src3', 'src7'))
      |SELECT * FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(list_intersect(a.toks, b.toks)) AS n_inter,
      |    len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS n_union,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
      |WHERE jaccard >= 0.5
      |ORDER BY id_a ASC, id_b ASC""".stripMargin

  /** Connected components over the EXACT-Jaccard near-dup pair list
    * (threshold 0.5, (lang, source) blocking): every clustered doc labeled
    * with the min doc_id of its component. Unlike [[qDedupClusters]] (the
    * LSH production path), the edge list here is oracle-reproducible, so
    * the full distributed min-label-propagation loop is value-checked
    * against a DuckDB transitive-closure recursion. */
  def qCcClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.jaccardPairs(Tables.documents(spark, sfDir), "doc_id", "text",
      Seq("lang", "source"), threshold = 0.5)
    Dedup.connectedComponents(pairs)
      .select($"id", $"label")
      .orderBy($"id")
  }

  // oracle: min label = min id reachable in the undirected edge graph —
  // a recursive transitive closure (components here are small; the Spark
  // side is the O(diameter)-round distributed formulation instead)
  val qCcClustersSql: String =
    """WITH RECURSIVE reach AS (
      |    SELECT s AS id, s AS r FROM und
      |    UNION
      |    SELECT reach.id, und.d FROM reach JOIN und ON reach.r = und.s
      |), t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), e0 AS MATERIALIZED (
      |  SELECT a.doc_id AS s, b.doc_id AS d
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      |), und AS MATERIALIZED (
      |  SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0
      |)
      |SELECT id, MIN(r) AS label FROM reach GROUP BY id ORDER BY id""".stripMargin

  /** LEAKAGE-SAFE train/val/test split — the near-dup-aware version of
    * the plain hash split ([[PipelineQueries.qTrainTestSplit]]): split
    * assignment is a function of the near-dup CLUSTER id (min doc_id of
    * the connected component over exact-Jaccard ≥ 0.5 pairs; singletons
    * are their own group), so two near-duplicate documents can never
    * straddle train and test — the eval-set contamination published
    * decontamination pipelines exist to prevent (GPT-3 appendix C,
    * Gopher A3). The fingerprint hashes every doc WITH its split, so
    * the oracle verifies each document's assignment, not just totals.
    *
    * Scale shape: composes the audited pieces — prefix/cost-dispatched
    * pair gen + O(diameter) min-label CC — then the label map
    * (clustered docs only, but corpus-proportional at a realistic dup
    * rate) left-joins back to the doc list UNHINTED: AQE broadcasts it
    * when it actually fits and shuffle-joins on doc_id when it does
    * not — a forced broadcast here would OOM at 100 TB (r11 verdict).
    * The split itself is a projection. */
  def qLeakSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def h(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c.cast("binary")), 1, 10), 16, 10).cast("long")
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.5)
    val labels = Dedup.connectedComponents(pairs)
      .select($"id".as("doc_id"), $"label")
    val hc = substring(md5($"group_id".cast("string").cast("binary")), 1, 1)
    docs.select($"doc_id").join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce($"label", $"doc_id"))
      .withColumn("split",
        when(hc < "c", "train").when(hc < "e", "val").otherwise("test"))
      .groupBy($"split")
      .agg(countDistinct($"group_id").as("n_groups"),
        count(lit(1)).as("n_docs"),
        bit_xor(h(concat($"doc_id".cast("string"), lit("|"), $"split")))
          .as("assign_fp"))
      .orderBy($"split")
  }

  val qLeakSplitSql: String =
    """WITH RECURSIVE reach AS (
      |    SELECT s AS id, s AS r FROM und
      |    UNION
      |    SELECT reach.id, und.d FROM reach JOIN und ON reach.r = und.s
      |), t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), e0 AS MATERIALIZED (
      |  SELECT a.doc_id AS s, b.doc_id AS d
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      |), und AS MATERIALIZED (
      |  SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0
      |), lab AS (
      |  SELECT id, MIN(r) AS label FROM reach GROUP BY id
      |), g AS (
      |  SELECT dd.doc_id, COALESCE(lab.label, dd.doc_id) AS group_id
      |  FROM documents dd LEFT JOIN lab ON lab.id = dd.doc_id
      |), s AS (
      |  SELECT doc_id, group_id,
      |    CASE WHEN substr(md5(CAST(group_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
      |         WHEN substr(md5(CAST(group_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM g
      |)
      |SELECT split, CAST(COUNT(DISTINCT group_id) AS BIGINT) AS n_groups,
      |  COUNT(*) AS n_docs,
      |  bit_xor(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR) || '|' ||
      |    split), 1, 10)) AS BIGINT)) AS assign_fp
      |FROM s GROUP BY split ORDER BY split""".stripMargin

  /** Corpus BOILERPLATE detection — the CCNet/RefinedWeb-style pass
    * that scores each doc by how much of it is made of n-grams shared
    * with most of the corpus (navigation chrome, license headers,
    * templating). A gram is boilerplate when its document frequency
    * exceeds half the corpus; each doc reports its distinct-gram count,
    * boilerplate-gram count and ratio. Skew-safe shape, same as the
    * contamination df cap: gram df is a map-side-combined partial
    * aggregate (the hottest gram collapses per partition), the ban
    * list broadcasts, and the per-doc count is one more partial agg —
    * no gram-partitioned window anywhere. */
  def qBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 3)).as("gram"))
    val nDocs = grams.select($"doc_id").distinct()
      .agg(count(lit(1)).as("n_docs"))
    val banned = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter($"df" > lit(0.5) * $"n_docs")
      .select($"gram")
    grams.join(broadcast(banned.withColumn("is_boiler", lit(1L))),
        Seq("gram"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce($"is_boiler", lit(0L))).as("n_boiler"))
      .withColumn("boiler_ratio", $"n_boiler".cast("double") / $"n_grams")
      .orderBy($"doc_id")
  }

  val qBoilerplateSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) > 0
      |), g AS (
      |  SELECT doc_id, unnest(grams) AS gram FROM t
      |), df AS (
      |  SELECT gram, count(*) AS c FROM g GROUP BY gram
      |), n AS (SELECT count(*) AS n_docs FROM t
      |), banned AS (
      |  SELECT gram FROM df, n WHERE c > 0.5 * n_docs
      |)
      |SELECT g.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_grams,
      |  CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
      |  CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
      |    AS boiler_ratio
      |FROM g LEFT JOIN banned b ON g.gram = b.gram
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  /** Inverted index over 3-gram shingles — the retrieval building block
    * behind BM25/contamination lookups, materialized: per gram its document
    * frequency and a capped posting list (10 smallest doc_ids,
    * comma-joined — ragged LIST columns are untested in the driver's
    * compare, and the cap is what a 100 TB build needs anyway: uncapped
    * postings for a stopword-gram are the corpus itself, so the full-scale
    * representation is the (gram, doc_id) pair table this aggregates,
    * with collect only ever applied through a bound). Shape: one partial+
    * final agg keyed by gram — the posting cap is enforced DURING
    * aggregation by the bounded [[operators.SmallestKLongs]] UDAF, so the
    * hottest gram ships k ids per map task, never its full corpus-sized
    * posting list — then a global top-200 by (df desc, gram) via
    * TakeOrderedAndProject. No full sort, no window. Shingles are
    * per-doc-distinct, so inputs to the min-k are already set-semantic. */
  def qInvertedIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 3)).as("gram"))
      .groupBy($"gram")
      .agg(count(lit(1)).as("df"),
        array_join(
          pystreamsspark.operators.TopKAgg.smallestK(10)($"doc_id"), ",")
          .as("postings"))
      .orderBy($"df".desc, $"gram".asc)
      .limit(200)
  }

  // Same shingle comprehension as qBoilerplateSql; shingles() is
  // per-doc-distinct, so COUNT(*) over (doc_id, gram) rows is df.
  val qInvertedIndexSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) > 0
      |), g AS (
      |  SELECT doc_id, unnest(grams) AS gram FROM t
      |)
      |SELECT gram, CAST(COUNT(*) AS BIGINT) AS df,
      |  array_to_string(list_sort(list(doc_id))[1:10], ',') AS postings
      |FROM g
      |GROUP BY gram
      |ORDER BY df DESC, gram ASC
      |LIMIT 200""".stripMargin

  /** Bounded-memory EXACT top-20 tokens via the Misra–Gries funnel
    * ([[operators.HeavyHitters.exactTopK]]): sketch pass (≤ m counters
    * per task cross the shuffle, however large the vocabulary) →
    * broadcast candidate semi-join → exact recount → top-k. The
    * deliberate output-twin of [[qTokensTopk]] — same rows, same oracle
    * — so the sketch funnel itself is value-verified cross-engine, the
    * same twin pattern as q_minhash_oracle. The exactness certificate
    * (20th count > n/(m+1)) holds with ~2× margin at every SF for the
    * token stream; HeavyHittersSpec exercises the decrement/merge path
    * on a vocabulary ≫ m where the guarantee is non-trivial. */
  def qHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
    pystreamsspark.operators.HeavyHitters.exactTopK(toks, "token", 20, m = 64)
  }

  val qHeavyHittersSql: String =
    """SELECT token, COUNT(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |WHERE token <> ''
      |GROUP BY token
      |ORDER BY n DESC, token ASC
      |LIMIT 20""".stripMargin

  /** Sparse TF-weighted cosine similarity — the inverted-index
    * counterpart to the dense [[qKnnCosine]], via
    * [[pystreamsspark.llm.Similarity.sparseCosineTopK]]'s cost-based
    * dispatch: candidate pairs from a TOKEN-keyed join (the inverted
    * index, the open-vocabulary scale path) OR vocabulary-indexed dense
    * tf vectors + codegen'd vec_dot when a bounded stats sample shows
    * the index join's fan-out Σ df² exceeding brute-force n² — this
    * 31-word uniform corpus is that regime (measured 10 s → <1 s at
    * sf0.1). Both plans are exact and parity-tested; the score is
    * cross-engine EXACT: dot and squared norms are integer values
    * (< 2^53, order-independent in double), sqrt is correctly-rounded
    * IEEE in both engines, and the final product+division of identical
    * operands is correctly rounded. Top-20 by (cosine, ids) total
    * order. */
  def qSparseCosine(spark: SparkSession, sfDir: String): DataFrame =
    pystreamsspark.llm.Similarity.sparseCosineTopK(
      Tables.documents(spark, sfDir).filter(col("lang") === "en"),
      "doc_id", "text", 20)

  val qSparseCosineSql: String =
    """WITH tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents WHERE lang = 'en')
      |  WHERE token <> ''
      |  GROUP BY doc_id, token
      |), norms AS (
      |  SELECT doc_id, SUM(tf * tf) AS n2 FROM tf GROUP BY doc_id
      |), dots AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.tf * b.tf) AS dot
      |  FROM tf a JOIN tf b ON a.token = b.token AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)
      |SELECT id_a, id_b,
      |  CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
      |FROM dots
      |JOIN norms na ON na.doc_id = id_a
      |JOIN norms nb ON nb.doc_id = id_b
      |ORDER BY cosine DESC, id_a ASC, id_b ASC
      |LIMIT 20""".stripMargin

  /** Corpus bigram-LM familiarity scoring — the integer-arithmetic
    * proxy for perplexity-based quality filtering (a doc whose word
    * bigrams are common in the corpus reads like the corpus; one full
    * of rare transitions doesn't). Score = mean corpus frequency of the
    * doc's bigrams: pure integer aggregates + ONE correctly-rounded
    * division, so it's cross-engine exact where a real LM's log-probs
    * (libm ln) never are. Shape: bigram generation is a per-row array
    * op (zero shuffle), counts are one partial+final agg, and the
    * count join is gram-keyed — the contamination shape, broadcast-able
    * when the vocabulary is small, never doc×doc. */
  def qBigramLm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", filter(split($"text", " "), t => t =!= "").as("toks"))
      .filter(size($"toks") >= 2)
    val bg = toks.select($"doc_id", explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => concat(element_at($"toks", i), lit(" "), element_at($"toks", i + 1))))
      .as("bigram"))
    val cnt = bg.groupBy($"bigram").agg(count(lit(1)).as("cnt"))
    bg.join(cnt, "bigram")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"cnt").as("sum_freq"))
      .withColumn("avg_bigram_freq", $"sum_freq".cast("double") / $"n_bigrams")
      .orderBy($"doc_id")
  }

  val qBigramLmSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), bg AS (
      |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bigram
      |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM t WHERE len(toks) >= 2)
      |), c AS (
      |  SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram
      |)
      |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(c.cnt) AS BIGINT) AS sum_freq,
      |  CAST(CAST(SUM(c.cnt) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_bigram_freq
      |FROM bg JOIN c USING (bigram)
      |GROUP BY bg.doc_id
      |ORDER BY bg.doc_id""".stripMargin

  /** CCNet-style n-gram LM quality scoring (Wenzek et al. 2020 — the
    * perplexity filter every LLM curation pipeline runs): train add-1
    * smoothed bigram counts on a HELD-OUT corpus slice (doc_id % 5 != 0
    * — scoring docs never feed their own model), score the remaining
    * docs by per-bigram code length, rank worst-to-best. The score is
    * the SHANNON CODE LENGTH under power-of-two-quantized
    * probabilities: bits(w1 w2) = ceil(-log2 P̂) with
    * P̂ = (c2+1)/(c1+V) — a genuine log-loss, but computed EXACTLY:
    * a libm-log first guess is corrected to the true ceiling by integer
    * shift comparisons (`shiftleft(num, e) >= den`), so the per-doc
    * totals are integers and hash bit-identically cross-engine (the
    * BM25/KN fixed-op-tree discipline taken one step further — no
    * float in the compared aggregate at all; the one double output is
    * a single correctly-rounded division). Shape: counts are one
    * partial+final agg over the train slice; scoring is a gram-keyed
    * LEFT join (broadcast-able vocabulary side, never doc×doc); the
    * per-doc reduce is map-side partial — the contamination/BM25 scale
    * shape. Worst docs (highest bits/bigram) surface first: the prune
    * candidates. */
  def qLmScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", filter(split($"text", " "), t => t =!= "").as("toks"))
      .filter(size($"toks") >= 2)
    def bigrams(df: DataFrame) = df.select($"doc_id", explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("w1"),
          element_at($"toks", i + 1).as("w2")))).as("b"))
      .select($"doc_id", $"b.w1", $"b.w2")
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val c2 = bigrams(train).groupBy($"w1", $"w2")
      .agg(count(lit(1)).as("c2"))
    val c1 = bigrams(train).groupBy($"w1").agg(count(lit(1)).as("c1"))
    val vocab = train.select(explode($"toks").as("w"))
      .agg(count_distinct($"w").as("V"))
    val scored = bigrams(docs.filter($"doc_id" % 5 === 0))
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select($"doc_id",
        (coalesce($"c2", lit(0L)) + lit(1L)).as("num"),
        // greatest(…,1): an empty train slice gives V=0 and c1 null →
        // den=0, where Spark's log(0)=NULL and DuckDB's LN(0)=-inf
        // DIVERGE (r13 review); den>=1 pins bits=0 on both engines
        greatest(coalesce($"c1", lit(0L)) + $"V", lit(1L)).as("den"))
      // bits = ceil(log2(den/num)), EXACT: the libm estimate seeds a
      // 4-wide window, integer shifts pick the true ceiling
      .withColumn("eraw", greatest(
        floor(log(col("den").cast("double") / col("num")) / log(lit(2.0)))
          .cast("int") - lit(1), lit(0)))
      .withColumn("bits", expr(
        """CASE WHEN shiftleft(num, eraw) >= den THEN eraw
          |     WHEN shiftleft(num, eraw + 1) >= den THEN eraw + 1
          |     WHEN shiftleft(num, eraw + 2) >= den THEN eraw + 2
          |     ELSE eraw + 3 END""".stripMargin))
    scored.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum($"bits".cast("long")).as("bits"))
      .withColumn("avg_bits", $"bits".cast("double") / $"n_bigrams")
      .orderBy($"avg_bits".desc, $"doc_id".asc)
      .limit(100)
  }

  val qLmScoreSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), t2 AS (
      |  SELECT * FROM t WHERE len(toks) >= 2
      |), bg AS (
      |  SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
      |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM t2)
      |), c2 AS (
      |  SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE doc_id % 5 <> 0
      |  GROUP BY w1, w2
      |), c1 AS (
      |  SELECT w1, COUNT(*) AS c1 FROM bg WHERE doc_id % 5 <> 0 GROUP BY w1
      |), v AS (
      |  SELECT COUNT(DISTINCT w) AS V FROM (
      |    SELECT unnest(toks) AS w FROM t2 WHERE doc_id % 5 <> 0)
      |), s AS (
      |  SELECT bg.doc_id,
      |    COALESCE(c2.c2, 0) + 1 AS num,
      |    greatest(COALESCE(c1.c1, 0) + v.V, 1) AS den
      |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
      |  CROSS JOIN v
      |  WHERE bg.doc_id % 5 = 0
      |), e AS (
      |  SELECT doc_id, num, den,
      |    greatest(CAST(FLOOR(LN(CAST(den AS DOUBLE) / num) / LN(2.0)) AS INT) - 1, 0) AS eraw
      |  FROM s
      |), b AS (
      |  SELECT doc_id,
      |    CASE WHEN (num << eraw) >= den THEN eraw
      |         WHEN (num << (eraw + 1)) >= den THEN eraw + 1
      |         WHEN (num << (eraw + 2)) >= den THEN eraw + 2
      |         ELSE eraw + 3 END AS bits
      |  FROM e
      |)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |  CAST(SUM(bits) AS BIGINT) AS bits,
      |  CAST(CAST(SUM(bits) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_bits
      |FROM b GROUP BY doc_id
      |ORDER BY avg_bits DESC, doc_id ASC
      |LIMIT 100""".stripMargin

  /** Interpolated Kneser–Ney smoothed bigram probabilities (Kneser &
    * Ney 1995; Chen & Goodman 1998 — the standard n-gram LM smoothing):
    *
    *   P_KN(w2|w1) = max(c(w1 w2) − D, 0)/c(w1·)
    *               + (D · N1+(w1·)/c(w1·)) · N1+(·w2)/T
    *
    * with absolute discount D = 0.75, continuation counts N1+ and total
    * bigram-type count T. The corpus is touched ONCE (the bigram
    * count); every other aggregate runs over the vocabulary²-bounded
    * bigram-type table — corpus-size-independent, the same scale shape
    * as [[PipelineQueries.qBpeMerges]]. All inputs are exact integers
    * and the closing formula is one fixed IEEE op tree (sub, div, mul,
    * add — no libm), so probabilities are bit-identical cross-engine:
    * top-50 by (P_KN desc, w1, w2). */
  def qKneserNey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(filter(split($"text", " "), t => t =!= "").as("toks"))
      .filter(size($"toks") >= 2)
    val bg = toks.select(explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("w1"),
          element_at($"toks", i + 1).as("w2")))).as("b"))
      .select($"b.w1", $"b.w2")
    val c = bg.groupBy($"w1", $"w2").agg(count(lit(1)).as("c"))
    val left = c.groupBy($"w1")
      .agg(sum($"c").as("c1"), count(lit(1)).as("n1f"))
    val rightC = c.groupBy($"w2").agg(count(lit(1)).as("n1b"))
    val types = c.agg(count(lit(1)).as("T"))
    c.join(left, "w1").join(rightC, "w2").crossJoin(broadcast(types))
      .withColumn("pkn",
        (greatest($"c" - lit(0.75), lit(0.0)) / $"c1") +
          ((lit(0.75) * $"n1f" / $"c1") * ($"n1b" / $"T")))
      .select($"w1", $"w2", $"c", $"c1", $"n1f", $"n1b", $"pkn")
      .orderBy($"pkn".desc, $"w1".asc, $"w2".asc)
      .limit(50)
  }

  val qKneserNeySql: String =
    """WITH t AS (
      |  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), bg AS (
      |  SELECT toks[i] AS w1, toks[i+1] AS w2
      |  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM t WHERE len(toks) >= 2)
      |), c AS (
      |  SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2
      |), l AS (
      |  SELECT w1, CAST(SUM(c) AS BIGINT) AS c1, COUNT(*) AS n1f
      |  FROM c GROUP BY w1
      |), r AS (
      |  SELECT w2, COUNT(*) AS n1b FROM c GROUP BY w2
      |), ty AS (
      |  SELECT COUNT(*) AS T FROM c
      |)
      |SELECT w1, w2, c, c1, n1f, n1b,
      |  (greatest(c - 0.75, 0.0) / c1) + ((0.75 * n1f / c1) * (n1b / T)) AS pkn
      |FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN ty
      |ORDER BY pkn DESC, w1 ASC, w2 ASC
      |LIMIT 50""".stripMargin

  /** Cross-document duplicated-span detection — the ExactSubstr signal
    * from the "Deduplicating Training Data Makes Language Models
    * Better" (Lee et al., ACL 2022) methodology at 8-token span
    * granularity: per doc, how many of its distinct 8-gram spans occur
    * in at least one OTHER document (within-doc repetition is
    * [[qNgramRepeat]]'s job; corpus-dominant boilerplate is
    * [[qBoilerplate]]'s). dup_frac near 1 marks a doc that is
    * substantially a copy. Shape: native codegen'd shingling, one
    * partial+final df agg, and a gram-keyed shuffle join for the flag —
    * the df≥2 gram set is unbounded at scale, so it is deliberately
    * NOT broadcast. */
  def qDupSpans(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 8)).as("gram"))
    val dup = grams.groupBy($"gram").agg(count(lit(1)).as("df"))
      .filter($"df" >= 2)
      .select($"gram", lit(1L).as("is_dup"))
    grams.join(dup, Seq("gram"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce($"is_dup", lit(0L))).as("n_dup"))
      .withColumn("dup_frac", $"n_dup".cast("double") / $"n_spans")
      .orderBy($"doc_id")
  }

  val qDupSpansSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+8], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-8, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) > 0
      |), g AS (
      |  SELECT doc_id, unnest(grams) AS gram FROM t
      |), dup AS (
      |  SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
      |)
      |SELECT g.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_spans,
      |  CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS dup_frac
      |FROM g LEFT JOIN dup d ON g.gram = d.gram
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin

  /** Collocation mining via PMI-style LIFT over adjacent token pairs:
    * lift(a,b) = p(ab) / (p(a)·p(b)) — how much more often the pair
    * occurs than independence predicts, the classic phrase-detection
    * score with its log dropped (log is monotone, so the top-k by lift
    * IS the top-k by PMI — and unlike libm log, the ratio is
    * cross-engine exact: two exact bigint products, then two
    * correctly-rounded double divisions in a fixed tree). Pairs seen
    * < 5 times are noise-filtered. Shape: two partial+final aggs
    * (unigrams, bigrams), one broadcast-able unigram join, one 1-row
    * totals broadcast; top-50 via TakeOrderedAndProject. Integer
    * products stay < 2^63 at any tested SF (ANSI would throw loudly,
    * not corrupt); at 100 TB flip the products to double — still
    * deterministic, same tree. */
  def qPmiLift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", filter(split($"text", " "), t => t =!= "").as("toks"))
    val uni = toks.select(explode($"toks").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
    val bg = toks.filter(size($"toks") >= 2)
      .select(explode(transform(
        sequence(lit(1), size($"toks") - 1),
        i => struct(element_at($"toks", i).as("a"), element_at($"toks", i + 1).as("b"))))
        .as("p"))
      .select($"p.a", $"p.b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("cab"))
      .filter($"cab" >= 5)
    // n_pairs must count ALL bigrams, not just the freq-filtered ones
    val np = toks.filter(size($"toks") >= 2)
      .agg(sum(size($"toks") - 1).as("np"))
    val nt = uni.agg(sum($"c").as("nt"))
    bg.join(uni.select($"tok".as("a"), $"c".as("ca")), Seq("a"))
      .join(uni.select($"tok".as("b"), $"c".as("cb")), Seq("b"))
      .crossJoin(broadcast(nt)).crossJoin(broadcast(np))
      .select($"a", $"b", $"cab",
        (($"cab" * $"nt").cast("double") / ($"ca" * $"cb").cast("double") *
          ($"nt".cast("double") / $"np".cast("double"))).as("lift"))
      .orderBy($"lift".desc, $"a", $"b")
      .limit(50)
  }

  val qPmiLiftSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents
      |), uni AS (
      |  SELECT tok, COUNT(*) AS c
      |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY tok
      |), bg AS (
      |  SELECT a, b, COUNT(*) AS cab FROM (
      |    SELECT toks[i] AS a, toks[i+1] AS b
      |    FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
      |          FROM t WHERE len(toks) >= 2))
      |  GROUP BY a, b HAVING COUNT(*) >= 5
      |), nt AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
      |np AS (SELECT CAST(SUM(len(toks) - 1) AS BIGINT) AS np
      |       FROM t WHERE len(toks) >= 2)
      |SELECT a, b, cab,
      |  CAST(cab * nt.nt AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) *
      |    (CAST(nt.nt AS DOUBLE) / CAST(np.np AS DOUBLE)) AS lift
      |FROM bg
      |JOIN uni ua ON ua.tok = bg.a
      |JOIN uni ub ON ub.tok = bg.b
      |CROSS JOIN nt CROSS JOIN np
      |ORDER BY lift DESC, a, b
      |LIMIT 50""".stripMargin

  /** Tokenizer vocabulary coverage: per-document out-of-vocabulary rate
    * against the corpus top-20 vocabulary (freq desc, token asc — the
    * deterministic rank [[qEncodeIds]] uses). The coverage metric that
    * sizes a vocabulary before training; integer counts + one division.
    * Shape: vocab is a 20-row broadcast; the flag join is map-side;
    * one partial+final per-doc agg. */
  def qOovRate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .filter($"tok" =!= "")
    val vocab = tok.groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(20)
      .select($"tok", lit(1L).as("in_vocab"))
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"in_vocab".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", $"n_oov".cast("double") / $"n_tokens")
      .orderBy($"doc_id")
  }

  val qOovRateSql: String =
    """WITH tok AS (
      |  SELECT doc_id, tok
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  WHERE tok <> ''
      |), vocab AS (
      |  SELECT tok FROM (
      |    SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok
      |    ORDER BY c DESC, tok LIMIT 20)
      |)
      |SELECT tok.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
      |    AS oov_rate
      |FROM tok LEFT JOIN vocab v ON tok.tok = v.tok
      |GROUP BY tok.doc_id
      |ORDER BY tok.doc_id""".stripMargin

  /** Per-document token-repetition scoring via the unbiased Simpson
    * index: sum c_i(c_i-1) / (n(n-1)) — the probability two tokens drawn
    * without replacement are equal. The Gopher-style repetition signal
    * with an EXACT cross-engine value: numerator and denominator are pure
    * integer aggregates, and the single double division of identical
    * operands is correctly rounded in both engines (no logs, no float
    * sums — the reason this is registered instead of Shannon entropy,
    * whose ln() is not correctly rounded in either libm). Shape: two
    * partial+final aggs (token counts, then per-doc moments); docs with
    * n <= 1 report 0.0 by definition. */
  def qTokenDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"doc_id", $"token")
      .agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum($"c" * ($"c" - 1)).as("rep_pairs"))
      .withColumn("simpson",
        when($"n_tokens" > 1,
          $"rep_pairs".cast("double") /
            ($"n_tokens" * ($"n_tokens" - 1)).cast("double"))
          .otherwise(lit(0.0)))
      .orderBy($"doc_id")
  }

  val qTokenDiversitySql: String =
    """WITH tc AS (
      |  SELECT doc_id, token, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  WHERE token <> ''
      |  GROUP BY doc_id, token
      |)
      |SELECT doc_id,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_distinct,
      |  CAST(SUM(c * (c - 1)) AS BIGINT) AS rep_pairs,
      |  CASE WHEN SUM(c) > 1
      |       THEN CAST(SUM(c * (c - 1)) AS DOUBLE) /
      |            CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE)
      |       ELSE 0.0 END AS simpson
      |FROM tc
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Asymmetric containment pairs ([[Dedup.containmentPairs]]) at 0.9
    * within (lang, source): directional quote/excerpt detection that
    * symmetric Jaccard misses. Top-50 by containment for a bounded,
    * deterministic oracle surface. */
  def qContainment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.containmentPairs(Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("lang", "source"), threshold = 0.9)
      .orderBy($"containment".desc, $"id_a".asc, $"id_b".asc)
      .limit(50)
      .select($"id_a", $"id_b", $"n_a", $"n_inter", $"containment")
  }

  /** The asymmetric PREFIX-FILTERED containment plan, driver-verified on
    * the real corpus (mirrors q_jaccard_prefix vs q_jaccard_pairs: the
    * dispatched key picks the block join on this pruning-hostile
    * vocabulary, so this key forces the prefix funnel so the oracle
    * validates the scale plan's VALUES, not just its unit tests). Same
    * oracle SQL as q_containment — the result is plan-independent. */
  def qContainmentPrefix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.containmentPairs(Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("lang", "source"), threshold = 0.9, strategy = "prefix")
      .orderBy($"containment".desc, $"id_a".asc, $"id_b".asc)
      .limit(50)
      .select($"id_a", $"id_b", $"n_a", $"n_inter", $"containment")
  }

  val qContainmentSql: String =
    """WITH t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents)
      |SELECT * FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    len(a.toks) AS n_a,
      |    len(list_intersect(a.toks, b.toks)) AS n_inter,
      |    CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) / len(a.toks)
      |      AS containment
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id <> b.doc_id)
      |WHERE containment >= 0.9
      |ORDER BY containment DESC, id_a ASC, id_b ASC
      |LIMIT 50""".stripMargin

  /** End-to-end near-dup corpus prune ([[Dedup.neardupPrune]]): the
    * deliverable of a dedup pass — unclustered docs + one min-id
    * representative per exact-Jaccard-0.5 cluster. Value-verifies
    * pairs -> connected components -> prune as ONE pipeline against the
    * DuckDB transitive-closure recursion. */
  def qNeardupPrune(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Dedup.neardupPrune(Tables.documents(spark, sfDir), "doc_id", "text",
        Seq("lang", "source"), threshold = 0.5)
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  val qNeardupPruneSql: String =
    """WITH RECURSIVE reach AS (
      |    SELECT s AS id, s AS r FROM und
      |    UNION
      |    SELECT reach.id, und.d FROM reach JOIN und ON reach.r = und.s
      |), t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), e0 AS MATERIALIZED (
      |  SELECT a.doc_id AS s, b.doc_id AS d
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      |), und AS MATERIALIZED (
      |  SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0
      |), labels AS (
      |  SELECT id, MIN(r) AS label FROM reach GROUP BY id
      |)
      |SELECT doc_id, lang, source FROM documents
      |WHERE doc_id NOT IN (SELECT id FROM labels WHERE label <> id)
      |ORDER BY doc_id""".stripMargin

  /** Near-dup dedup with a QUALITY-BASED canonical policy: instead of
    * keeping each duplicate cluster's min-id doc (q_neardup_prune), keep
    * the doc that maximizes a quality signal (here n_chars, ties to the
    * smaller id) — the policy real curation uses, where the longest /
    * highest-scoring variant of a near-dup family survives and the rest
    * are dropped. Cluster ids come from the same banded-pair + star-CC
    * funnel; the canonical pick is one min_by struct aggregate per
    * cluster (map-side partial, no window over the corpus).
    * Output: one row per cluster with the kept doc, its quality, and
    * the cluster size — integer-exact. */
  def qDedupKeepBest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      Seq("lang", "source"), threshold = 0.5)
    val labels = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
    docs.join(labels, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce($"label", $"doc_id"))
      .groupBy($"cluster")
      .agg(min_by($"doc_id", struct((-$"n_chars").as("neg"), $"doc_id"))
          .as("keep_id"),
        max($"n_chars").as("best_chars"),
        count(lit(1)).as("cluster_size"))
      .orderBy($"cluster")
  }

  val qDedupKeepBestSql: String =
    """WITH RECURSIVE reach AS (
      |    SELECT s AS id, s AS r FROM und
      |    UNION
      |    SELECT reach.id, und.d FROM reach JOIN und ON reach.r = und.s
      |), t AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      |  FROM documents
      |), e0 AS MATERIALIZED (
      |  SELECT a.doc_id AS s, b.doc_id AS d
      |  FROM t a JOIN t b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
      |), und AS MATERIALIZED (
      |  SELECT s, d FROM e0 UNION SELECT d AS s, s AS d FROM e0
      |), labels AS (
      |  SELECT id, MIN(r) AS label FROM reach GROUP BY id
      |), lab2 AS (
      |  SELECT d.doc_id, d.n_chars, COALESCE(l.label, d.doc_id) AS cluster
      |  FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
      |), r2 AS (
      |  SELECT cluster, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY cluster
      |      ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM lab2)
      |SELECT cluster,
      |  CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS keep_id,
      |  CAST(MAX(n_chars) AS BIGINT) AS best_chars,
      |  CAST(COUNT(*) AS BIGINT) AS cluster_size
      |FROM r2 GROUP BY cluster ORDER BY cluster""".stripMargin

  /** Batched BM25 retrieval: top-10 docs PER QUERY for a 3-query set,
    * selected with the bounded map-side top-k UDAF
    * ([[pystreamsspark.operators.TopKAgg]]) — |queries|·k rows per task
    * cross the shuffle, no per-query window sort (the batch twin of
    * [[qBm25]]; same libm-free fixed-order IEEE score tree, so scores
    * hash-match the oracle bit-for-bit). */
  def qBm25Topk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("join", "stream", "window") // qid 1, 2, 3
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id" +: TextOps.tokens($"text").as("toks") +: Nil: _*)
      .select(($"doc_id" +: size($"toks").cast("long").as("dl") +:
        terms.map(t => size(filter($"toks", x => x === t)).cast("long").as(s"tf_$t"))): _*)
    val aggCols = count(lit(1)).as("n_docs") +: sum($"dl").as("sum_dl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    def score(t: String) = {
      val idf = ($"n_docs".cast("double") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      val norm = lit(1.5) * (lit(0.25) + lit(0.75) *
        ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs".cast("double"))))
      when(col(s"tf_$t") > 0,
        idf * (col(s"tf_$t") * lit(2.5)) / (col(s"tf_$t") + norm)).otherwise(lit(0.0))
    }
    val perQuery = terms.zipWithIndex.map { case (t, i) =>
      scored.select(lit(i + 1).as("qid"), $"doc_id", score(t).as("s"))
    }.reduce(_ unionByName _)
    perQuery
      .groupBy($"qid")
      .agg(pystreamsspark.operators.TopKAgg.topK(10)($"s", $"doc_id").as("top"))
      .select($"qid", posexplode($"top"))
      .select($"qid", $"col._2".as("doc_id"), $"col._1".as("bm25"),
        ($"pos" + 1).cast("long").as("rn"))
      .orderBy($"qid", $"rn")
  }

  val qBm25TopkSql: String = {
    def scoreSql(t: String): String =
      s"""CASE WHEN tf_$t > 0 THEN
         |      ((CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5))
         |      * (tf_$t * 2.5)
         |      / (tf_$t + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
         |    ELSE 0.0 END""".stripMargin
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS dl,
       |    CAST(len(list_filter(string_split(text,' '), x -> x = 'join')) AS BIGINT) AS tf_join,
       |    CAST(len(list_filter(string_split(text,' '), x -> x = 'stream')) AS BIGINT) AS tf_stream,
       |    CAST(len(list_filter(string_split(text,' '), x -> x = 'window')) AS BIGINT) AS tf_window
       |  FROM documents
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
       |    CAST(SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
       |    CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_stream,
       |    CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window
       |  FROM base
       |), perq AS (
       |  SELECT 1 AS qid, doc_id, ${scoreSql("join")} AS s FROM base CROSS JOIN stats
       |  UNION ALL
       |  SELECT 2, doc_id, ${scoreSql("stream")} FROM base CROSS JOIN stats
       |  UNION ALL
       |  SELECT 3, doc_id, ${scoreSql("window")} FROM base CROSS JOIN stats
       |)
       |SELECT qid, doc_id, s AS bm25, rn FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY qid
       |                                    ORDER BY s DESC, doc_id ASC) AS BIGINT) AS rn
       |  FROM perq)
       |WHERE rn <= 10
       |ORDER BY qid, rn""".stripMargin
  }

  /** Large-star/small-star connected components
    * ([[pystreamsspark.llm.Dedup.connectedComponentsStar]], Kiveris et
    * al. SoCC 2014) on a DEEP graph: each (lang, source) block's docs
    * chained by consecutive doc_id — components of diameter ~|block|
    * (~100 at sf0.1), where the O(diameter) label-propagation loop
    * would need ~100 rounds and the star loop needs O(log²)≈8 (the
    * round count is asserted in LlmOpsSpec). The oracle knows each
    * chain's answer analytically: label = min doc_id of the block —
    * so every node's label is value-checked without recursion. */
  def qCcChain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"source").orderBy($"doc_id")
    val edges = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"source")
      .withColumn("prev", lag($"doc_id", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"prev".as("id_a"), $"doc_id".as("id_b"))
    Dedup.connectedComponentsStar(edges)
      .select($"id", $"label")
      .orderBy($"id")
  }

  val qCcChainSql: String =
    """WITH b AS (
      |  SELECT doc_id,
      |    count(*)    OVER (PARTITION BY lang, source) AS n,
      |    min(doc_id) OVER (PARTITION BY lang, source) AS mn
      |  FROM documents)
      |SELECT doc_id AS id, mn AS label FROM b
      |WHERE n >= 2
      |ORDER BY id""".stripMargin

  /** MinHash-LSH with an md5-derived hash family — the ORACLE-CHECKABLE
    * twin of [[qMinhashDedup]]. Works on distinct word 3-SHINGLES like
    * the production path (single tokens are useless here: the synthetic
    * corpus has a ~40-word vocabulary, so token-level signatures collide
    * globally and the pair set goes quadratic — measured 6.6M pairs/41 s
    * at sf0.1). ONE md5 per shingle, split into two 40-bit halves
    * (a, b); hash family h_i = (a + i*b) mod 2^40 — exact in BIGINT
    * (max ~2^44, no overflow in either engine), 16x fewer md5 calls than
    * hashing per seed. Signature = per-seed min over the shingle set;
    * 16 hashes in 4 bands of 4; candidates collide on a whole band;
    * est = fraction of agreeing signature positions (integer count, one
    * IEEE division). The xxhash64 family ([[qMinhashDedup]]) stays the
    * production path — this key exists so the signature/band/bucket-join
    * LOGIC is value-verified end-to-end, not just property-tested. */
  /** md5-family MinHash signatures over word 3-shingles: (doc_id,
    * sig[nH]). RELATIONAL build — explode the (already-distinct)
    * shingle array, md5 each gram ONCE in a flat projection
    * (whole-stage codegen + subexpression elimination, which lambda
    * bodies never get), then nH partial-aggregated MINs per doc.
    * Measured 30x faster than the nested-HOF formulation (interpreted
    * md5 per lambda element). Shared by [[qMinhashOracle]] and
    * [[qLshEval]]; the oracle replay is the `ab`/`s` CTE pair. */
  private def md5Sigs(spark: SparkSession, sfDir: String, nH: Int): DataFrame =
    md5SigsOf(Tables.documents(spark, sfDir), spark, nH)

  /** [[md5Sigs]] over an arbitrary (doc_id, text) relation — the
    * mutant-unioned corpora of the dedup-pipeline keys need signatures
    * too. */
  private def md5SigsOf(docs: DataFrame, spark: SparkSession, nH: Int): DataFrame = {
    import spark.implicits._
    val M = 1099511627776L // 2^40
    val hashed = docs
      .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 3)).as("g"))
      .select($"doc_id",
        conv(substring(md5($"g".cast("binary")), 1, 10), 16, 10).cast("long").as("a"),
        conv(substring(md5($"g".cast("binary")), 11, 10), 16, 10).cast("long").as("b"))
    val minCols = (0 until nH).map(i => min(($"a" + $"b" * i) % M).as(s"m$i"))
    hashed.groupBy($"doc_id")
      .agg(minCols.head, minCols.tail: _*)
      .select($"doc_id", array((0 until nH).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band keys for an nH-wide signature split into `bands` bands of
    * `rows`: (doc_id, sig, bnd, bkey). */
  private def bandKeys(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    sigs
      .select(c("doc_id"), c("sig"), posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => concat_ws(",", transform(slice(c("sig"), b * rows + 1, lit(rows)),
          v => v.cast("string"))))))
      .select(c("doc_id"), c("sig"), c("pos").as("bnd"), c("col").as("bkey"))
  }

  def qMinhashOracle(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nH = 16
    val bands = 4
    val rows = nH / bands
    val sigs = md5Sigs(spark, sfDir, nH)
    val banded = bandKeys(sigs, bands, rows)
    val a = banded.select($"bnd", $"bkey", $"doc_id".as("id_a"), $"sig".as("sig_a"))
    val b = banded.select($"bnd", $"bkey", $"doc_id".as("id_b"), $"sig".as("sig_b"))
    a.join(b, Seq("bnd", "bkey"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sig_a", $"sig_b").distinct()
      // codegen'd agree count (r9 sig_agree native) — same integer as
      // the HOF zip_with/aggregate chain it replaces (bit-parity
      // property-tested in DedupSigSpec), minus the interpreted lambda
      // dispatch per candidate pair
      .select($"id_a", $"id_b",
        (call_function("sig_agree", $"sig_a", $"sig_b")
          .cast("double") / nH).as("est"))
      .filter($"est" >= 0.5)
      .orderBy($"id_a", $"id_b")
  }

  val qMinhashOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) > 0
      |), ab AS (
      |  SELECT doc_id,
      |    [ { a: CAST(concat('0x', substring(md5(g),1,10)) AS BIGINT),
      |        b: CAST(concat('0x', substring(md5(g),11,10)) AS BIGINT) }
      |      FOR g IN grams ] AS ab
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    [ list_min([ (x.a + i*x.b) % 1099511627776 FOR x IN ab ])
      |      FOR i IN range(0,16) ] AS sig
      |  FROM ab
      |), b AS (
      |  SELECT doc_id, sig, bnd,
      |    array_to_string(sig[bnd*4+1:bnd*4+4], ',') AS bkey
      |  FROM s, UNNEST(range(0,4)) AS u(bnd)
      |), p AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sig AS sig_a, b2.sig AS sig_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
      |)
      |SELECT id_a, id_b,
      |  CAST(len([i FOR i IN range(0,16) IF sig_a[i+1] = sig_b[i+1]]) AS DOUBLE)/16.0 AS est
      |FROM p
      |WHERE CAST(len([i FOR i IN range(0,16) IF sig_a[i+1] = sig_b[i+1]]) AS DOUBLE)/16.0 >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Signature-verify MinHash-LSH (md5 family) — the oracle-checkable
    * twin of `Dedup.minHashLsh(verify = "signature")`, exercising the
    * SHARED library path `Dedup.lshPairsFromSigs` at the production
    * shape (32 hashes, 8 bands of 4) rather than inline query code.
    * This is the declared 100 TB near-dup form: nothing wider than the
    * fixed 32×8-byte signature crosses the bucket shuffle (DedupSigSpec
    * plan-asserts no shingle array in any exchange), and the per-pair
    * estimate is the codegen'd `sig_agree` count over the carried
    * signatures — no join back to exact shingle sets. est = agree/32 is
    * an exact dyadic rational in both engines; the md5→(a,b) 40-bit
    * family replays verbatim in DuckDB. */
  def qMinhashSigverify(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nH = 32
    val bands = 8
    val sigs = md5Sigs(spark, sfDir, nH).select($"doc_id".as("id"), $"sig")
    Dedup.lshPairsFromSigs(sigs, nH, bands, threshold = 0.7)
      .select($"id_a", $"id_b", $"jaccard".as("est"))
      .orderBy($"id_a", $"id_b")
  }

  val qMinhashSigverifySql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |  WHERE len(toks) > 0
      |), ab AS (
      |  SELECT doc_id,
      |    [ { a: CAST(concat('0x', substring(md5(g),1,10)) AS BIGINT),
      |        b: CAST(concat('0x', substring(md5(g),11,10)) AS BIGINT) }
      |      FOR g IN grams ] AS ab
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    [ list_min([ (x.a + i*x.b) % 1099511627776 FOR x IN ab ])
      |      FOR i IN range(0,32) ] AS sig
      |  FROM ab
      |), b AS (
      |  SELECT doc_id, sig, bnd,
      |    array_to_string(sig[bnd*4+1:bnd*4+4], ',') AS bkey
      |  FROM s, UNNEST(range(0,8)) AS u(bnd)
      |), p AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
      |    a.sig AS sig_a, b2.sig AS sig_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bkey = b2.bkey
      |                    AND a.doc_id < b2.doc_id
      |)
      |SELECT id_a, id_b,
      |  CAST(len([i FOR i IN range(0,32) IF sig_a[i+1] = sig_b[i+1]]) AS DOUBLE)/32.0 AS est
      |FROM p
      |WHERE CAST(len([i FOR i IN range(0,32) IF sig_a[i+1] = sig_b[i+1]]) AS DOUBLE)/32.0 >= 0.7
      |ORDER BY id_a, id_b""".stripMargin

  /** Precision/recall of MinHash-LSH candidate generation against exact
    * shingle-Jaccard ground truth at τ=0.8 — the dedup twin of
    * [[PipelineQueries.qIvfRecall]]: before trusting a banding scheme to
    * prune a 100 TB corpus, measure what it surfaces and what it misses.
    * Deliberately uses WEAK bands (8 bands × 2 rows over the same
    * 16-hash md5 signature as q_minhash_oracle) so false candidates
    * actually occur and precision is exercised; at J≈1 (the planted
    * dups) every band matches, so recall stays 1.0 — both facts are
    * pinned in the spec.
    *
    * All counts are integers (candidate pairs, truth pairs, overlap),
    * divisions are single correctly-rounded ops, and both the signature
    * family and the exact-Jaccard side replay in DuckDB — the whole
    * eval is hash-exact cross-engine.
    *
    * Scale shape: candidates come from the band-bucket equi-join (never
    * doc×doc); ground truth is gram-keyed intersection counting — the
    * contamination funnel shape — which on a real run you'd restrict to
    * an eval sample; the synthetic corpus is small enough to measure
    * exactly. */
  def qLshEval(spark: SparkSession, sfDir: String): DataFrame =
    lshEval(Tables.documents(spark, sfDir), spark)

  /** [[qLshEval]] restricted to a deterministic 25% document sample
    * (md5(doc_id) first hex < '4' — the [[PipelineQueries.qSampleHash]]
    * idiom: a pure function of the key, reproducible on any cluster
    * layout, pushed to the scan). This is the 100 TB shape of the eval:
    * the banded candidate funnel is linear, but exact ground truth is
    * inherently quadratic in the matched-gram groups, so a full-corpus
    * run can never scale — a production recall eval ALWAYS runs on a
    * sample. StressSpec pins the linear-vs-quadratic contrast at ×10. */
  def qLshEvalSampled(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lshEval(Tables.documents(spark, sfDir)
      .filter(substring(md5($"doc_id".cast("string").cast("binary")), 1, 1) < "4"),
      spark)
  }

  private[pystreamsspark] def lshEval(docs: DataFrame, spark: SparkSession): DataFrame = {
    import spark.implicits._
    val bands = 8
    val rows = 2
    val tau = 0.8
    // both pair lists are referenced twice (the hit join + their own
    // count); truncate so the signature funnel and the gram-intersection
    // funnel each execute exactly once (r5 snapshot: 12 parquet scans)
    val cand = pystreamsspark.operators.Lineage.truncate {
      val banded = bandKeys(md5SigsOf(docs, spark, bands * rows), bands, rows)
      val ca = banded.select($"bnd", $"bkey", $"doc_id".as("id_a"))
      val cb = banded.select($"bnd", $"bkey", $"doc_id".as("id_b"))
      ca.join(cb, Seq("bnd", "bkey")).filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b").distinct()
    }
    val grams = docs
      .select($"doc_id", explode(Dedup.shinglesNative(spark, $"text", 3)).as("g"))
    val sizes = grams.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val truth = pystreamsspark.operators.Lineage.truncate(
      grams.select($"g", $"doc_id".as("id_a"))
        .join(grams.select($"g", $"doc_id".as("id_b")), "g")
        .filter($"id_a" < $"id_b")
        .groupBy($"id_a", $"id_b").agg(count(lit(1)).as("inter"))
        .join(sizes.select($"doc_id".as("id_a"), $"sz".as("sza")), "id_a")
        .join(sizes.select($"doc_id".as("id_b"), $"sz".as("szb")), "id_b")
        .filter($"inter".cast("double") /
          ($"sza" + $"szb" - $"inter").cast("double") >= tau)
        .select($"id_a", $"id_b"))
    val hits = truth.join(cand, Seq("id_a", "id_b"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hit")))
      .select($"n_truth", $"n_cand", $"n_hit",
        ($"n_hit".cast("double") / $"n_cand".cast("double")).as("precision"),
        ($"n_hit".cast("double") / $"n_truth".cast("double")).as("recall"))
  }

  private def lshEvalSql(src: String): String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM $src)
      |  WHERE len(toks) > 0
      |), ab AS (
      |  SELECT doc_id,
      |    [ { a: CAST(concat('0x', substring(md5(g),1,10)) AS BIGINT),
      |        b: CAST(concat('0x', substring(md5(g),11,10)) AS BIGINT) }
      |      FOR g IN grams ] AS ab
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    [ list_min([ (x.a + i*x.b) % 1099511627776 FOR x IN ab ])
      |      FOR i IN range(0,16) ] AS sig
      |  FROM ab
      |), b AS (
      |  SELECT doc_id, bnd,
      |    array_to_string(sig[bnd*2+1:bnd*2+2], ',') AS bkey
      |  FROM s, UNNEST(range(0,8)) AS u(bnd)
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bkey = b2.bkey
      |                    AND a.doc_id < b2.doc_id
      |), g AS (SELECT doc_id, unnest(grams) AS g FROM t),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
      |pi AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      |  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), tr AS (
      |  SELECT id_a, id_b
      |  FROM pi
      |  JOIN sz sa ON sa.doc_id = pi.id_a
      |  JOIN sz sb ON sb.doc_id = pi.id_b
      |  WHERE CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE)
      |        >= 0.8
      |), h AS (
      |  SELECT COUNT(*) AS n_hit
      |  FROM tr JOIN cand ON cand.id_a = tr.id_a AND cand.id_b = tr.id_b)
      |SELECT
      |  CAST((SELECT COUNT(*) FROM tr) AS BIGINT) AS n_truth,
      |  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand,
      |  CAST(h.n_hit AS BIGINT) AS n_hit,
      |  CAST(h.n_hit AS DOUBLE) /
      |    CAST((SELECT COUNT(*) FROM cand) AS DOUBLE) AS precision,
      |  CAST(h.n_hit AS DOUBLE) /
      |    CAST((SELECT COUNT(*) FROM tr) AS DOUBLE) AS recall
      |FROM h""".stripMargin

  val qLshEvalSql: String = lshEvalSql("documents")

  val qLshEvalSampledSql: String = lshEvalSql(
    "(SELECT doc_id, text FROM documents " +
      "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4')")

  /** One-row dataset card — the corpus summary a curation pipeline
    * publishes with every training-data release (docs, languages,
    * sources, token volume, vocabulary, mean length, exact-dup rate,
    * empties). Composes only exact aggregates: counts, distincts over
    * normalized text, and two correctly-rounded divisions — the whole
    * card is hash-exact cross-engine. Shape: one scan for doc-level
    * stats + one exploded scan for token stats (each a partial+final
    * agg to a single row), crossed driver-free; at 100 TB the cost is
    * two reads of the corpus and nothing else. */
  def qDatasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val d = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct($"lang").as("n_langs"),
      countDistinct($"source").as("n_sources"),
      countDistinct(lower(trim($"text"))).as("n_uniq"),
      sum(when(length(trim($"text")) === 0, 1L).otherwise(0L)).as("n_empty"))
    val t = docs
      .select(explode(filter(split($"text", " "), x => x =!= "")).as("tok"))
      .agg(count(lit(1)).as("n_tokens"), countDistinct($"tok").as("n_vocab"))
    d.crossJoin(t).select(
      $"n_docs", $"n_langs", $"n_sources", $"n_tokens", $"n_vocab",
      ($"n_tokens".cast("double") / $"n_docs".cast("double"))
        .as("mean_doc_tokens"),
      (lit(1.0) - $"n_uniq".cast("double") / $"n_docs".cast("double"))
        .as("dup_rate"),
      $"n_empty")
  }

  val qDatasetCardSql: String =
    """WITH d AS (
      |  SELECT COUNT(*) AS n_docs,
      |    COUNT(DISTINCT lang) AS n_langs,
      |    COUNT(DISTINCT source) AS n_sources,
      |    COUNT(DISTINCT lower(trim(text))) AS n_uniq,
      |    SUM(CASE WHEN len(trim(text)) = 0 THEN 1 ELSE 0 END) AS n_empty
      |  FROM documents),
      |t AS (
      |  SELECT COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_vocab
      |  FROM (SELECT unnest(list_filter(string_split(text, ' '),
      |                x -> x <> '')) AS tok
      |        FROM documents))
      |SELECT CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_langs AS BIGINT) AS n_langs,
      |  CAST(n_sources AS BIGINT) AS n_sources,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  CAST(n_vocab AS BIGINT) AS n_vocab,
      |  CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean_doc_tokens,
      |  1.0 - CAST(n_uniq AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate,
      |  CAST(n_empty AS BIGINT) AS n_empty
      |FROM d CROSS JOIN t""".stripMargin

  /** Train/test contamination detection ([[Contamination]]): eval docs
    * (md5-split, first hex digit < '2' ≈ 12.5%) that share >= 2 distinct
    * word 3-grams with a training doc, with the standard heavy-hitter df
    * cap (grams in > 50 training docs are banned as signal-free). The
    * gram→pairs funnel shuffles on the gram key only — never test×train
    * all-pairs. */
  def qContamination(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text",
        substring(md5($"doc_id".cast("string").cast("binary")), 1, 1).as("hc"))
    val test = docs.filter($"hc" < "2")
    val train = docs.filter($"hc" >= "2")
    Contamination.contaminationPairs(train, test, "doc_id", "text",
        n = 3, minShared = 2, maxDf = 50L)
      .orderBy($"test_id", $"train_id")
  }

  val qContaminationSql: String =
    """WITH tok AS (
      |  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)),1,1) AS hc,
      |    list_filter(string_split(text,' '), x -> x <> '') AS toks
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, hc, g
      |  FROM (
      |    SELECT doc_id, hc,
      |      list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                      FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS gs
      |    FROM tok WHERE len(toks) > 0
      |  ), UNNEST(gs) AS u(g)
      |), tr AS (
      |  SELECT doc_id AS train_id, g FROM grams WHERE hc >= '2'
      |), te AS (
      |  SELECT doc_id AS test_id, g FROM grams WHERE hc < '2'
      |), banned AS (
      |  SELECT g FROM tr GROUP BY g HAVING COUNT(*) > 50
      |), kept AS (
      |  SELECT * FROM tr WHERE g NOT IN (SELECT g FROM banned)
      |)
      |SELECT te.test_id, kept.train_id, COUNT(*) AS n_shared
      |FROM te JOIN kept ON te.g = kept.g
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 2
      |ORDER BY test_id, train_id""".stripMargin

  /** BM25 relevance scoring for a fixed 3-term query ("join window
    * stream") over the document corpus — the retrieval/reranking pass of
    * a RAG or data-curation pipeline.
    *
    * Cross-engine float determinism by construction (see SKILL.md):
    * k1 = 1.5 and b = 0.75 are exactly representable; idf is the raw
    * ratio (N - df + 0.5)/(df + 0.5) (no ln — libm differs across
    * engines); every scalar is computed by the SAME parenthesized op
    * tree in Spark and DuckDB; the 3 per-term scores are added in one
    * FIXED order (s1 + s2) + s3, never a reduction.
    *
    * Scale shape: tf/dl are per-row HOFs (map-side); the corpus stats
    * (df per term, total length, N) are ONE map-side-combined global
    * aggregate, broadcast back with a 1-row cross join — no window over
    * an unpartitioned frame, no second scan shuffle. */
  def qBm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val terms = Seq("join", "window", "stream")
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id" +: TextOps.tokens($"text").as("toks") +: Nil: _*)
      .select(($"doc_id" +: size($"toks").cast("long").as("dl") +:
        terms.map(t => size(filter($"toks", x => x === t)).cast("long").as(s"tf_$t"))): _*)
    val aggCols = count(lit(1)).as("n_docs") +: sum($"dl").as("sum_dl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    def score(t: String) = {
      val idf = ($"n_docs".cast("double") - col(s"df_$t") + lit(0.5)) /
        (col(s"df_$t") + lit(0.5))
      val norm = lit(1.5) * (lit(0.25) + lit(0.75) *
        ($"dl".cast("double") / ($"sum_dl".cast("double") / $"n_docs".cast("double"))))
      when(col(s"tf_$t") > 0,
        idf * (col(s"tf_$t") * lit(2.5)) / (col(s"tf_$t") + norm)).otherwise(lit(0.0))
    }
    scored
      .select(($"doc_id" +: terms.map(t => col(s"tf_$t"))) :+
        ((score("join") + score("window")) + score("stream")).as("bm25"): _*)
      .orderBy($"bm25".desc, $"doc_id".asc)
      .limit(100)
  }

  val qBm25Sql: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS dl,
      |    CAST(len(list_filter(string_split(text,' '), x -> x = 'join')) AS BIGINT) AS tf_join,
      |    CAST(len(list_filter(string_split(text,' '), x -> x = 'window')) AS BIGINT) AS tf_window,
      |    CAST(len(list_filter(string_split(text,' '), x -> x = 'stream')) AS BIGINT) AS tf_stream
      |  FROM documents
      |), stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl,
      |    CAST(SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
      |    CAST(SUM(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_window,
      |    CAST(SUM(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_stream
      |  FROM base
      |)
      |SELECT doc_id, tf_join, tf_window, tf_stream,
      |  ((CASE WHEN tf_join > 0 THEN
      |      ((CAST(n_docs AS DOUBLE) - df_join + 0.5) / (df_join + 0.5))
      |      * (tf_join * 2.5)
      |      / (tf_join + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |    ELSE 0.0 END
      |  + CASE WHEN tf_window > 0 THEN
      |      ((CAST(n_docs AS DOUBLE) - df_window + 0.5) / (df_window + 0.5))
      |      * (tf_window * 2.5)
      |      / (tf_window + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |    ELSE 0.0 END)
      |  + CASE WHEN tf_stream > 0 THEN
      |      ((CAST(n_docs AS DOUBLE) - df_stream + 0.5) / (df_stream + 0.5))
      |      * (tf_stream * 2.5)
      |      / (tf_stream + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
      |    ELSE 0.0 END) AS bm25
      |FROM base CROSS JOIN stats
      |ORDER BY bm25 DESC, doc_id ASC
      |LIMIT 100""".stripMargin

  /** SimHash with an md5-derived hash family — the ORACLE-CHECKABLE twin
    * of [[qSimhashPairs]], closing the last unverified sketch family:
    * 32-bit sketch from the first 40 bits of md5(token) (sign votes per
    * bit, ties set the bit — same rule as [[Dedup.simHash]]), banded into
    * 4 8-bit chunks, bucket-join candidates, exact hamming <= 6 verify.
    * Relational build like [[Dedup.simHashBulk]]: explode tokens, md5
    * once per token in codegen, 32 partial-agg vote sums. Zero-token
    * docs are excluded symmetrically on both sides. */
  def qSimhashOracle(spark: SparkSession, sfDir: String): DataFrame =
    md5SimhashPairs(Tables.documents(spark, sfDir).select(
      col("doc_id"), col("text")), spark, nbits = 32, maxDist = 6)

  /** md5-family SimHash sketch per doc: (doc_id, sk). `nbits` sign
    * votes come from the top `nbits/4` hex chars of ONE md5 per token
    * (nbits <= 60 keeps the sketch a positive BIGINT in both engines —
    * no sign-bit edge case). Relational build like [[Dedup.simHashBulk]]
    * — explode tokens, md5 once per token in codegen, nbits partial-agg
    * vote sums. Zero-token docs drop (no rows to vote), matching the
    * oracle's `len(toks) > 0` filter. Shared by [[qSimhash]],
    * [[qSimhashOracle]] and [[qSimhashPairs]]. */
  private def md5SimhashSketches(docs: DataFrame, spark: SparkSession,
                                 nbits: Int): DataFrame = {
    import spark.implicits._
    val votes = docs
      .select($"doc_id", explode(TextOps.tokens($"text")).as("t"))
      .select($"doc_id",
        conv(substring(md5($"t".cast("binary")), 1, nbits / 4), 16, 10)
          .cast("long").as("h"))
    val sumCols = (0 until nbits).map(j => sum(
      when(shiftrightunsigned($"h", j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$j"))
    votes.groupBy($"doc_id")
      .agg(sumCols.head, sumCols.tail: _*)
      .select($"doc_id",
        (0 until nbits).map(j =>
          when(col(s"v$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("sk"))
  }

  /** Banded hamming-pairs over [[md5SimhashSketches]]: 4 chunks of
    * nbits/4 bits, bucket-join candidates, exact hamming <= maxDist
    * verify. At 60 bits the 15-bit buckets are selective on this
    * corpus (~1k pairs at sf0.01); the 32-bit variant's 8-bit buckets
    * are deliberately weak so false candidates exercise the verify. */
  private def md5SimhashPairs(docs: DataFrame, spark: SparkSession,
                              nbits: Int, maxDist: Int): DataFrame = {
    import spark.implicits._
    val chunkBits = nbits / 4
    val chunkMask = (1L << chunkBits) - 1
    val sk = md5SimhashSketches(docs, spark, nbits)
    val banded = sk.select($"doc_id", $"sk",
        explode(array((0 until 4).map(c => struct(lit(c).as("c"),
          shiftrightunsigned($"sk", chunkBits * c).bitwiseAND(lit(chunkMask)).as("ck"))): _*)).as("b"))
      .select($"doc_id", $"sk", $"b.c".as("c"), $"b.ck".as("ck"))
    val a = banded.select($"c", $"ck", $"doc_id".as("id_a"), $"sk".as("sk_a"))
    val b = banded.select($"c", $"ck", $"doc_id".as("id_b"), $"sk".as("sk_b"))
    a.join(b, Seq("c", "ck"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"sk_a", $"sk_b").distinct()
      .select($"id_a", $"id_b",
        bit_count($"sk_a".bitwiseXOR($"sk_b")).as("dist"))
      .filter($"dist" <= maxDist)
      .orderBy($"id_a", $"id_b")
  }

  /** The sketch/band/pair SQL shared by the simhash oracles — `src` is
    * the corpus relation ("documents" or the mutant-union CTE `e`),
    * `extraCte` an optional leading CTE definition (with trailing
    * comma) prepended inside the WITH. */
  private def simhashPairsSql(src: String, extraCte: String = "",
                              nbits: Int = 32): String = {
    val chunkBits = nbits / 4
    val chunkMask = (1L << chunkBits) - 1
    s"""WITH $extraCte t AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
      |  FROM $src WHERE len(list_filter(string_split(text,' '), x -> x <> '')) > 0
      |), h AS (
      |  SELECT doc_id,
      |    [ CAST(concat('0x', substring(md5(tk),1,${nbits / 4})) AS BIGINT) FOR tk IN toks ] AS hs
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    CAST(list_sum([ CASE WHEN
      |        list_sum([ CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END FOR x IN hs ]) >= 0
      |      THEN (CAST(1 AS BIGINT) << j) ELSE 0 END FOR j IN range(0, $nbits) ]) AS BIGINT) AS sk
      |  FROM h
      |), b AS (
      |  SELECT doc_id, sk, c, (sk >> (c*$chunkBits)) & $chunkMask AS ck
      |  FROM s, UNNEST(range(0,4)) AS u(c)
      |), p AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sk AS sk_a, b2.sk AS sk_b
      |  FROM b a JOIN b b2 ON a.c = b2.c AND a.ck = b2.ck AND a.doc_id < b2.doc_id
      |)
      |SELECT id_a, id_b, bit_count(xor(sk_a, sk_b)) AS dist
      |FROM p WHERE bit_count(xor(sk_a, sk_b)) <= 6
      |ORDER BY id_a, id_b""".stripMargin
  }

  val qSimhashOracleSql: String = simhashPairsSql("documents")

  /** docs ∪ deterministic near-duplicates: each doc re-emitted with its
    * last token dropped under id + 10_000_000 — the planted-pair corpus
    * the dedup keys demonstrate on (same construction the DuckDB oracles
    * replay in their `e` CTE). */
  private def withMutants(docs: DataFrame): DataFrame =
    docs.unionByName(docs.select(
      (col("doc_id") + 10000000L).as("doc_id"),
      // drop the last token: deterministic near-duplicate
      expr("concat_ws(' ', slice(filter(split(text, ' '), t -> t != ''), 1, " +
        "greatest(size(filter(split(text, ' '), t -> t != '')) - 1, 1)))").as("text")))

  /** Shared DuckDB CTE: the mutant-unioned corpus (`e`) — replays
    * [[withMutants]] exactly. */
  private val mutantCteSql: String =
    """e AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id,
      |    array_to_string(toks[1:greatest(len(toks)-1, 1)], ' ') AS text
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |)""".stripMargin

  /** MinHash-LSH near-dup detection, demonstrated on docs + engineered
    * near-duplicates: LSH must surface those planted pairs.
    *
    * ORACLE-CHECKED since round 7: banding runs on the md5-derived hash
    * family of [[qMinhashOracle]] (16 hashes, 4 bands of 4) and the
    * verify is the EXACT word-3-shingle Jaccard over the candidate pairs
    * (integer set-intersection/union counts, one IEEE division) — every
    * step replays in DuckDB. [[Dedup.minHashLsh]] with the xxhash64
    * family (and the fused native shingle_hash/minhash_sig expressions)
    * stays the production fast path — ~4× cheaper per gram (see the
    * BASELINE.md md5-vs-xxhash64 micro row) — and remains value-tested
    * in SketchesSpec; this key pins the identical banded-LSH + verify
    * LOGIC to the oracle. */
  def qMinhashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = withMutants(Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    // shingle_strings is per-row distinct, so array sizes are set counts
    val grams = docs
      .select($"doc_id", Dedup.shinglesNative(spark, $"text", 3).as("grams"))
      .filter(size($"grams") > 0)
    // SLIM band join (r14, guide §2.3 — same discipline as
    // Dedup.jaccardPairsPrefix): candidates are decided from
    // (bnd, bkey, doc_id) alone, deduped on the id pair, and the gram
    // arrays attach once per SURVIVING pair — the old shape shipped each
    // doc's gram array once per band (4×) and deduped over array
    // columns. grams is truncated so the shingle pass runs once for both
    // attach sides; md5SigsOf feeds only the banding (computed once).
    val gramsT = pystreamsspark.operators.Lineage.truncate(grams)
    val banded = bandKeys(md5SigsOf(docs, spark, 16), 4, 4)
    val a = banded.select($"bnd", $"bkey", $"doc_id".as("id_a"))
    val b = banded.select($"bnd", $"bkey", $"doc_id".as("id_b"))
    a.join(b, Seq("bnd", "bkey"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
      // spread the CPU-heavy verify: the slim pair list AQE-coalesces to
      // ~1 partition (tiny bytes) and the broadcast attach would verify
      // everything in one task — repartition by the pair key first
      .repartition(spark.sessionState.conf.numShufflePartitions,
        $"id_a", $"id_b")
      // inner attach joins also re-impose the size>0 filter the old
      // banded⋈grams join applied (md5SigsOf already excludes gramless
      // docs, so the candidate set is unchanged)
      // array_sort at the attach (once per doc row per side) lets the
      // verify run the zero-allocation sorted_inter_count merge instead
      // of two hash-set passes per pair; |∪| derives as |a|+|b|−|∩|
      // (grams are distinct) — identical integers, identical division
      .join(gramsT.select($"doc_id".as("id_a"),
        array_sort($"grams").as("g_a")), "id_a")
      .join(gramsT.select($"doc_id".as("id_b"),
        array_sort($"grams").as("g_b")), "id_b")
      .select($"id_a", $"id_b",
        call_function("sorted_inter_count", $"g_a", $"g_b").as("__ni"),
        (size($"g_a") + size($"g_b")).as("__sz"))
      .select($"id_a", $"id_b",
        ($"__ni".cast("double") / ($"__sz" - $"__ni")).as("jaccard"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"id_a".asc, $"id_b".asc)
  }

  /** DuckDB replay of [[qMinhashDedup]]: mutant union, md5 signature and
    * band CTEs of [[qMinhashOracleSql]], then exact gram-set Jaccard on
    * the deduped candidate pairs. */
  val qMinhashDedupSql: String =
    s"""WITH $mutantCteSql, t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM e)
      |  WHERE len(toks) > 0
      |), ab AS (
      |  SELECT doc_id,
      |    [ { a: CAST(concat('0x', substring(md5(g),1,10)) AS BIGINT),
      |        b: CAST(concat('0x', substring(md5(g),11,10)) AS BIGINT) }
      |      FOR g IN grams ] AS ab
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    [ list_min([ (x.a + i*x.b) % 1099511627776 FOR x IN ab ])
      |      FOR i IN range(0,16) ] AS sig
      |  FROM ab
      |), b AS (
      |  SELECT s.doc_id, t.grams, bnd,
      |    array_to_string(sig[bnd*4+1:bnd*4+4], ',') AS bkey
      |  FROM s JOIN t USING (doc_id), UNNEST(range(0,4)) AS u(bnd)
      |), p AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b,
      |    a.grams AS g_a, b2.grams AS g_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
      |)
      |SELECT id_a, id_b,
      |  CAST(len(list_intersect(g_a, g_b)) AS DOUBLE)
      |    / len(list_distinct(list_concat(g_a, g_b))) AS jaccard
      |FROM p
      |WHERE CAST(len(list_intersect(g_a, g_b)) AS DOUBLE)
      |    / len(list_distinct(list_concat(g_a, g_b))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Full dedup pipeline: MinHash-LSH pairs → connected components →
    * cluster labels. Every planted mutant must land in its original's
    * cluster; output = one row per clustered doc (id, canonical label).
    *
    * ORACLE-CHECKED end to end since round 6: signatures come from the
    * md5-derived hash family of [[qMinhashOracle]] (16 hashes, 4 bands
    * of 4, est >= 0.5), so the whole chain — shingle → signature → band
    * bucket join → distributed min-label connected components — is
    * value-verified against DuckDB, whose side replays the closure with
    * a recursive CTE (clusters are small, so the transitive closure is
    * cheap in the oracle; the Spark side stays the O(log d) iterative
    * label propagation that scales). [[Dedup.minHashLsh]] with the
    * xxhash64 family remains the production path, exercised by
    * [[qMinhashDedup]] and property-tested in SketchesSpec. */
  def qDedupClusters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val mutated = docs.select(
      ($"doc_id" + 10000000L).as("doc_id"),
      expr("concat_ws(' ', slice(filter(split(text, ' '), t -> t != ''), 1, " +
        "greatest(size(filter(split(text, ' '), t -> t != '')) - 1, 1)))").as("text"))
    // SLIM band join (r14, see qMinhashDedup): the md5 signature table is
    // the expensive parity artifact — truncate it (LAZY: the band join
    // is the materializing job, no extra serial barrier) so it computes
    // ONCE and serves the banding plus both verify attach sides, instead
    // of riding the band exchange 4× per doc and a distinct over arrays.
    val sigs = pystreamsspark.operators.Lineage.truncate(
      md5SigsOf(docs.unionByName(mutated), spark, 16), eager = false)
    val banded = bandKeys(sigs, 4, 4)
    val a = banded.select($"bnd", $"bkey", $"doc_id".as("id_a"))
    val b = banded.select($"bnd", $"bkey", $"doc_id".as("id_b"))
    val pairs = a.join(b, Seq("bnd", "bkey"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b").distinct()
      // spread the verify (see qMinhashDedup): slim pairs AQE-coalesce
      // to ~1 partition, so the sig-agreement filter would run serially
      .repartition(spark.sessionState.conf.numShufflePartitions,
        $"id_a", $"id_b")
      .join(sigs.select($"doc_id".as("id_a"), $"sig".as("sig_a")), "id_a")
      .join(sigs.select($"doc_id".as("id_b"), $"sig".as("sig_b")), "id_b")
      .filter(aggregate(zip_with($"sig_a", $"sig_b",
          (x, y) => when(x === y, lit(1)).otherwise(lit(0))),
        lit(0), (acc, v) => acc + v).cast("double") / 16 >= 0.5)
      .select($"id_a", $"id_b")
    Dedup.connectedComponents(pairs)
      .select($"id", $"label")
      .orderBy($"id")
  }

  /** DuckDB replay of [[qDedupClusters]]: the md5 signature/band CTEs of
    * [[qMinhashOracleSql]] over the mutant-unioned corpus, then
    * connected components as a recursive-CTE transitive closure over the
    * symmetric edge list (exact because near-dup clusters are tiny;
    * min(reachable ∪ self) = the component's canonical label). */
  val qDedupClustersSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id,
      |    array_to_string(toks[1:greatest(len(toks)-1, 1)], ' ') AS text
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM documents)
      |), t AS (
      |  SELECT doc_id,
      |    list_distinct([ array_to_string(toks[i+1:i+3], ' ')
      |                    FOR i IN range(0, greatest(len(toks)-3, 0)+1) ]) AS grams
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text,' '), x -> x <> '') AS toks
      |        FROM e)
      |  WHERE len(toks) > 0
      |), ab AS (
      |  SELECT doc_id,
      |    [ { a: CAST(concat('0x', substring(md5(g),1,10)) AS BIGINT),
      |        b: CAST(concat('0x', substring(md5(g),11,10)) AS BIGINT) }
      |      FOR g IN grams ] AS ab
      |  FROM t
      |), s AS (
      |  SELECT doc_id,
      |    [ list_min([ (x.a + i*x.b) % 1099511627776 FOR x IN ab ])
      |      FOR i IN range(0,16) ] AS sig
      |  FROM ab
      |), b AS (
      |  SELECT doc_id, sig, bnd,
      |    array_to_string(sig[bnd*4+1:bnd*4+4], ',') AS bkey
      |  FROM s, UNNEST(range(0,4)) AS u(bnd)
      |), p AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b, a.sig AS sig_a, b2.sig AS sig_b
      |  FROM b a JOIN b b2 ON a.bnd = b2.bnd AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
      |), pe AS (
      |  SELECT id_a, id_b FROM p
      |  WHERE CAST(len([i FOR i IN range(0,16) IF sig_a[i+1] = sig_b[i+1]]) AS DOUBLE)/16.0 >= 0.5
      |), ed AS (
      |  SELECT id_a AS src, id_b AS dst FROM pe
      |  UNION SELECT id_b, id_a FROM pe
      |), rc AS (
      |  SELECT src, dst FROM ed
      |  UNION
      |  SELECT rc.src, ed.dst FROM rc JOIN ed ON rc.dst = ed.src
      |)
      |SELECT src AS id, least(src, min(dst)) AS label
      |FROM rc GROUP BY src
      |ORDER BY id""".stripMargin

  /** SimHash sketch per document (+ pairs within hamming<=6 would be the
    * join step; the sketch itself is the verifiable artifact here).
    *
    * ORACLE-CHECKED since round 7 via the md5-derived hash family
    * ([[md5SimhashSketches]] at the production 60-bit width — 64-bit
    * is out of reach only because DuckDB's BIGINT sign bit would need
    * a special case; 60 keeps the sketch positive in both engines).
    * [[Dedup.simHash]]/[[Dedup.simHashBulk]] with the xxhash64 family
    * stay the production fast path, value-tested in SketchesSpec. */
  def qSimhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    md5SimhashSketches(
        Tables.documents(spark, sfDir).select($"doc_id", $"text"), spark, 60)
      .select($"doc_id", $"sk".as("simhash"))
      .orderBy($"doc_id")
  }

  val qSimhashSql: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks
      |  FROM documents WHERE len(list_filter(string_split(text,' '), x -> x <> '')) > 0
      |), h AS (
      |  SELECT doc_id,
      |    [ CAST(concat('0x', substring(md5(tk),1,15)) AS BIGINT) FOR tk IN toks ] AS hs
      |  FROM t
      |)
      |SELECT doc_id,
      |  CAST(list_sum([ CASE WHEN
      |      list_sum([ CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END FOR x IN hs ]) >= 0
      |    THEN (CAST(1 AS BIGINT) << j) ELSE 0 END FOR j IN range(0, 60) ]) AS BIGINT) AS simhash
      |FROM h
      |ORDER BY doc_id""".stripMargin

  /** SimHash banded hamming-pairs (the join step [[qSimhash]] only
    * sketches for): docs + planted near-duplicates → chunk-banded
    * candidate join → hamming <= 6 verify.
    *
    * ORACLE-CHECKED since round 7: [[md5SimhashPairs]] over the
    * mutant-unioned corpus at the 60-bit width (the 32-bit sketch goes
    * quadratic-dense on this small-vocabulary corpus — 5.8M pairs at
    * sf0.1; 15-bit band buckets keep candidates selective) — identical
    * banding structure to [[Dedup.simHashPairs]], which stays the
    * xxhash64 production path (SketchesSpec asserts recall on
    * hamming-close plants there). */
  def qSimhashPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    md5SimhashPairs(
      withMutants(Tables.documents(spark, sfDir).select($"doc_id", $"text")),
      spark, nbits = 60, maxDist = 6)
  }

  val qSimhashPairsSql: String = simhashPairsSql("e", mutantCteSql + ",", nbits = 60)

  /** LSH-bucketed ANN pairs on embeddings + planted exact duplicates
    * (vec_id + 10_000_000): every planted pair shares all buckets and
    * must be found with cosine 1.0. ORACLE-CHECKED since round 6 via
    * [[annMd5Pairs]] with a SINGLE 8-plane band — exactly the bucket
    * structure of [[Similarity.annPairs]] (one signature, candidates =
    * exact signature match), with the md5 plane family and quantized
    * integer verify so DuckDB replays every step. The xxhash64
    * production path stays exercised in SketchesSpec. */
  def qSimJoin(spark: SparkSession, sfDir: String): DataFrame =
    annMd5Pairs(spark, sfDir, bands = 1, planes = 8, threshold = 0.9)

  val qSimJoinSql: String = annMd5Sql(bands = 1, planes = 8, threshold = 0.9)

  /** OR-amplified multi-band sign-LSH near-dup pairs
    * ([[Similarity.annPairsMultiband]]) with planted duplicates — smoke
    * key (xxhash64 plane weights are engine-specific; recall is
    * value-asserted in SketchesSpec's planted cosine-0.72 test). */
  def qAnnMultiband(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val planted = emb.select(($"vec_id" + 10000000L).as("vec_id"), $"embedding")
    Similarity.annPairsMultiband(emb.unionByName(planted), "vec_id", "embedding",
        planesPerBand = 4, bands = 8, threshold = 0.9)
      .orderBy($"id_a".asc, $"id_b".asc)
  }

  /** ORACLE-CHECKABLE twin of [[qAnnMultiband]] — closes the last sketch
    * family with no value-verified twin of the same banding structure
    * (q_minhash_oracle covers MinHash banding, q_simhash_oracle SimHash
    * banding; this one covers multi-band OR-amplified sign-LSH).
    *
    * Same pipeline shape as [[Similarity.annPairsMultiband]] — signature
    * → per-band chunk keys → bucket self-join → exact verify — but every
    * step is replayable in DuckDB:
    *  - hyperplane weights are ±1s from the md5 family (the cross-engine
    *    md5→BIGINT idiom), not xxhash64;
    *  - the projection runs over the vector QUANTIZED to integers
    *    (floor(x·1024): float→double widening and the power-of-two scale
    *    are exact, floor is exact), so each plane's vote sum is INTEGER
    *    arithmetic — reduction-order- and engine-independent, no float
    *    sum ever crosses engines;
    *  - the verify cosine is the quantized integer dot/norms through one
    *    correctly-rounded sqrt/divide tree (the q_sparse_cosine
    *    discipline), bit-exact in both engines.
    * Planted byte-identical copies (id+10M) guarantee non-vacuous
    * recall: identical vectors share every band chunk. */
  def qAnnMultibandOracle(spark: SparkSession, sfDir: String): DataFrame =
    annMd5Pairs(spark, sfDir, bands = 8, planes = 4, threshold = 0.9)

  /** The md5-family sign-LSH ANN pair join, parameterized over banding —
    * shared by [[qAnnMultibandOracle]] (8 bands × 4 planes, the
    * OR-amplified recall shape) and [[qSimJoin]] (1 band × 8 planes, the
    * single-signature bucket join [[Similarity.annPairs]] runs in
    * production). Every step replays in DuckDB — see the
    * [[qAnnMultibandOracle]] scaladoc for the exactness discipline. */
  private def annMd5Pairs(spark: SparkSession, sfDir: String,
                          bands: Int, planes: Int, threshold: Double): DataFrame = {
    import spark.implicits._
    pystreamsspark.functions.VectorExpressions.register(spark)
    val dims = 64
    val emb = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val both = emb.unionByName(
      emb.select(($"vec_id" + 10000000L).as("vec_id"), $"embedding"))
    // quantized vector kept as a DOUBLE array holding exact integers:
    // the verify dot can then be the native codegen'd vec_dot (every
    // product/sum an exact integer < 2^53 -> order-independent and
    // engine-exact); an interpreted HOF dot over the ~16-buckets-per-
    // band candidate fan-out MEASURED 23 s at sf0.1
    val q = both.select($"vec_id",
      transform($"embedding",
        x => floor(x.cast("double") * 1024).cast("double")).as("qv"))
    val md5w = conv(substring(md5(concat($"bnd".cast("string"), lit(":"),
      $"pl".cast("string"), lit(":"), $"pos".cast("string")).cast("binary")),
      1, 10), 16, 10).cast("long")
    val w = spark.range(bands).select($"id".cast("int").as("bnd"))
      .crossJoin(spark.range(planes).select($"id".cast("int").as("pl")))
      .crossJoin(spark.range(dims).select($"id".cast("int").as("pos")))
      .select($"bnd", $"pl", $"pos",
        when(md5w % 2 === 0, 1L).otherwise(-1L).as("w"))
    // the 32 per-(band,plane) signs fold into ONE 32-bit mask per
    // dimension (64-row broadcast): all 32 integer vote sums then come
    // out of a SINGLE grouped aggregate over the |vecs|·64 exploded rows
    // — the naive (vec, dim) × (band, plane) join shape shuffles 32×
    // more rows for the identical integers (measured 9.0 → ~1 s sf0.1)
    val mask = w.groupBy($"pos")
      .agg(sum(when($"w" === 1L, expr(s"shiftleft(1L, bnd * $planes + pl)"))
        .otherwise(0L)).as("mask"))
    val votes = q.select($"vec_id", posexplode($"qv"))
      .select($"vec_id", $"pos", $"col".cast("long").as("col")) // exact
      .join(broadcast(mask), "pos")
    val sums = (0 until bands * planes).map(k => sum(
      when(shiftrightunsigned($"mask", k).bitwiseAND(lit(1L)) === 1L, $"col")
        .otherwise(-$"col")).as(s"s$k"))
    val sk = votes.groupBy($"vec_id").agg(sums.head, sums.tail: _*)
    val chunks = sk.select($"vec_id", explode(array((0 until bands).map(b =>
      struct(lit(b).as("bnd"),
        (0 until planes).map(p =>
          when(col(s"s${b * planes + p}") >= 0, lit(1L << p)).otherwise(lit(0L)))
          .reduce(_ + _).as("ck"))): _*)).as("x"))
      .select($"vec_id", $"x.bnd".as("bnd"), $"x.ck".as("ck"))
    // carry (qv, n2) through the band join — the same shape as
    // annPairsMultiband: one verify per shared band, dedup after, no
    // join-back of the multi-million-row candidate list
    val qd = q.select($"vec_id", $"qv",
      call_function("vec_dot", $"qv", $"qv").as("n2"))
    val banded = chunks.join(qd, Seq("vec_id"))
    val a = banded.select($"bnd", $"ck", $"vec_id".as("id_a"),
      $"qv".as("qa"), $"n2".as("na"))
    val b = banded.select($"bnd", $"ck", $"vec_id".as("id_b"),
      $"qv".as("qb"), $"n2".as("nb"))
    a.join(b, Seq("bnd", "ck"))
      .filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        (call_function("vec_dot", $"qa", $"qb") /
          (sqrt($"na") * sqrt($"nb"))).as("qcos"))
      .distinct()
      .filter($"qcos" >= threshold)
      .orderBy($"id_a", $"id_b")
  }

  val qAnnMultibandOracleSql: String = annMd5Sql(bands = 8, planes = 4, threshold = 0.9)

  /** DuckDB replay of [[annMd5Pairs]] for any banding. */
  private def annMd5Sql(bands: Int, planes: Int, threshold: Double): String =
    s"""WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 10000000, embedding FROM embeddings
      |), q AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT) FOR x IN embedding] AS qv
      |  FROM e
      |), w AS (
      |  SELECT CAST(b.range AS INT) AS bnd, CAST(p.range AS INT) AS pl,
      |    CAST(d.range AS INT) AS pos,
      |    CASE WHEN CAST(concat('0x',
      |        substring(md5(concat(b.range, ':', p.range, ':', d.range)), 1, 10))
      |        AS BIGINT) % 2 = 0
      |      THEN 1 ELSE -1 END AS w
      |  FROM range(0,$bands) b, range(0,$planes) p, range(0,64) d
      |), v AS (
      |  SELECT q.vec_id, w.bnd, w.pl, SUM(w.w * qv[w.pos + 1]) AS s
      |  FROM q CROSS JOIN w GROUP BY 1, 2, 3
      |), ck AS (
      |  SELECT vec_id, bnd,
      |    CAST(SUM(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << pl) ELSE 0 END)
      |      AS BIGINT) AS ck
      |  FROM v GROUP BY 1, 2
      |), p2 AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b2.vec_id AS id_b
      |  FROM ck a JOIN ck b2
      |    ON a.bnd = b2.bnd AND a.ck = b2.ck AND a.vec_id < b2.vec_id
      |), scored AS (
      |  SELECT id_a, id_b,
      |    list_dot_product(CAST(qa.qv AS DOUBLE[]), CAST(qb.qv AS DOUBLE[])) AS qdot,
      |    list_dot_product(CAST(qa.qv AS DOUBLE[]), CAST(qa.qv AS DOUBLE[])) AS na,
      |    list_dot_product(CAST(qb.qv AS DOUBLE[]), CAST(qb.qv AS DOUBLE[])) AS nb
      |  FROM p2 JOIN q qa ON p2.id_a = qa.vec_id JOIN q qb ON p2.id_b = qb.vec_id
      |)
      |SELECT id_a, id_b, qdot / (sqrt(na) * sqrt(nb)) AS qcos
      |FROM scored
      |WHERE qdot / (sqrt(na) * sqrt(nb)) >= $threshold
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_multiband" -> (qAnnMultiband _),
    "q_ann_multiband_oracle" -> (qAnnMultibandOracle _),
    "q_dedup_exact"   -> (qDedupExact _),
    "q_dedup_delta"   -> (qDedupDelta _),
    "q_neardup_delta" -> (qNeardupDelta _),
    "q_kneser_ney"    -> (qKneserNey _),
    "q_lm_score"      -> (qLmScore _),
    "q_tokens_topk"   -> (qTokensTopk _),
    "q_tfidf"         -> (qTfidf _),
    "q_lang_stats"    -> (qLangStats _),
    "q_quality_score" -> (qQualityScore _),
    "q_hash_classifier" -> (qHashClassifier _),
    "q_langid"        -> (qLangid _),
    "q_fingerprint"   -> (qFingerprint _),
    "q_knn_cosine"    -> (qKnnCosine _),
    "q_embed_neardup" -> (qEmbedNeardup _),
    "q_jaccard_pairs" -> (qJaccardPairs _),
    "q_jaccard_prefix" -> (qJaccardPrefix _),
    "q_cc_clusters"   -> (qCcClusters _),
    "q_leak_split"    -> (qLeakSplit _),
    "q_cc_chain"      -> (qCcChain _),
    "q_containment"   -> (qContainment _),
    "q_containment_prefix" -> (qContainmentPrefix _),
    "q_boilerplate"   -> (qBoilerplate _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_token_diversity" -> (qTokenDiversity _),
    "q_sparse_cosine" -> (qSparseCosine _),
    "q_bigram_lm"     -> (qBigramLm _),
    "q_dup_spans"     -> (qDupSpans _),
    "q_pmi_lift"      -> (qPmiLift _),
    "q_oov_rate"      -> (qOovRate _),
    "q_neardup_prune" -> (qNeardupPrune _),
    "q_dedup_keep_best" -> (qDedupKeepBest _),
    "q_bm25_topk"     -> (qBm25Topk _),
    "q_minhash_oracle" -> (qMinhashOracle _),
    "q_minhash_sigverify" -> (qMinhashSigverify _),
    "q_lsh_eval" -> (qLshEval _),
    "q_lsh_eval_sampled" -> (qLshEvalSampled _),
    "q_dataset_card" -> (qDatasetCard _),
    "q_contamination" -> (qContamination _),
    "q_bm25"          -> (qBm25 _),
    "q_simhash_oracle" -> (qSimhashOracle _),
    "q_minhash_dedup" -> (qMinhashDedup _),
    "q_dedup_clusters" -> (qDedupClusters _),
    "q_simhash"       -> (qSimhash _),
    "q_simhash_pairs" -> (qSimhashPairs _),
    "q_sim_join"      -> (qSimJoin _))

  val oracle: Map[String, String] = Map(
    "q_dedup_exact"   -> qDedupExactSql,
    "q_dedup_delta"   -> qDedupDeltaSql,
    "q_neardup_delta" -> qNeardupDeltaSql,
    "q_kneser_ney"    -> qKneserNeySql,
    "q_lm_score"      -> qLmScoreSql,
    "q_tokens_topk"   -> qTokensTopkSql,
    "q_tfidf"         -> qTfidfSql,
    "q_lang_stats"    -> qLangStatsSql,
    "q_quality_score" -> qQualityScoreSql,
    "q_hash_classifier" -> qHashClassifierSql,
    "q_langid"        -> qLangidSql,
    "q_fingerprint"   -> qFingerprintSql,
    "q_knn_cosine"    -> qKnnCosineSql,
    "q_embed_neardup" -> qEmbedNeardupSql,
    "q_jaccard_pairs" -> qJaccardPairsSql,
    "q_jaccard_prefix" -> qJaccardPrefixSql,
    "q_cc_clusters"   -> qCcClustersSql,
    "q_leak_split"    -> qLeakSplitSql,
    "q_cc_chain"      -> qCcChainSql,
    "q_containment"   -> qContainmentSql,
    "q_containment_prefix" -> qContainmentSql,
    "q_boilerplate"   -> qBoilerplateSql,
    "q_inverted_index" -> qInvertedIndexSql,
    "q_heavy_hitters" -> qHeavyHittersSql,
    "q_token_diversity" -> qTokenDiversitySql,
    "q_sparse_cosine" -> qSparseCosineSql,
    "q_bigram_lm"     -> qBigramLmSql,
    "q_dup_spans"     -> qDupSpansSql,
    "q_pmi_lift"      -> qPmiLiftSql,
    "q_oov_rate"      -> qOovRateSql,
    "q_neardup_prune" -> qNeardupPruneSql,
    "q_dedup_keep_best" -> qDedupKeepBestSql,
    "q_bm25_topk"     -> qBm25TopkSql,
    "q_minhash_oracle" -> qMinhashOracleSql,
    "q_minhash_sigverify" -> qMinhashSigverifySql,
    "q_lsh_eval" -> qLshEvalSql,
    "q_lsh_eval_sampled" -> qLshEvalSampledSql,
    "q_dataset_card" -> qDatasetCardSql,
    "q_contamination" -> qContaminationSql,
    "q_bm25"          -> qBm25Sql,
    "q_simhash_oracle" -> qSimhashOracleSql,
    "q_minhash_dedup" -> qMinhashDedupSql,
    "q_simhash"       -> qSimhashSql,
    "q_simhash_pairs" -> qSimhashPairsSql,
    "q_ann_multiband_oracle" -> qAnnMultibandOracleSql,
    "q_dedup_clusters" -> qDedupClustersSql,
    "q_sim_join"      -> qSimJoinSql)
}
