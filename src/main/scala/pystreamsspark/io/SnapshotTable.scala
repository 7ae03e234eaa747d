package pystreamsspark.io

import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** A minimal SNAPSHOT-MANIFEST table layer over parquet — the ACID
  * piece (MERGE / time travel / snapshot-isolated compaction) that
  * LayoutQueries' q_upsert/q_scd2/q_compaction implement as bare
  * dataframe primitives, here made durable with versioned metadata.
  * Same public design space as the Delta/Iceberg logs (a table is an
  * ordered sequence of manifest files, each listing immutable data
  * files); this is an original, deliberately small implementation, not
  * a port of either.
  *
  * Layout:
  * {{{
  *   tableDir/_manifests/v%08d.manifest   // one per committed snapshot
  *   tableDir/data/<batch-uuid>/part-*.parquet
  * }}}
  *
  * Manifest = a text file: header line `op=<op>\tparent=<n>`, then one
  * RELATIVE data-file path per line. Commit protocol = write all data
  * files first, then CREATE_NEW the next manifest — creation is the
  * atomic publish point. A losing concurrent committer gets
  * [[ConcurrentCommitException]] and its orphaned data files are
  * reclaimed by [[vacuum]]; a crash before the manifest exists leaves
  * the table state untouched (the RegistrySink abort discipline, at the
  * table level).
  *
  * Why this scales:
  *  - manifests list FILES, not rows — O(#files) driver metadata, all
  *    row work distributed;
  *  - [[merge]] is file-granular COPY-ON-WRITE: one distributed
  *    semi-join finds the files that contain matched keys, only those
  *    are rewritten; untouched files are carried by reference;
  *  - time travel ([[read]] with `versionAsOf`) is manifest selection —
  *    data files are immutable, so old snapshots stay readable until
  *    [[vacuum]] drops the versions that reference them;
  *  - [[compact]] rewrites small files into `target` larger ones under
  *    a NEW snapshot: concurrent readers of older versions never see a
  *    half-compacted state;
  *  - SCHEMA EVOLUTION is a manifest property: each manifest records
  *    the table schema (Spark schema JSON), so adding a column is pure
  *    metadata — pre-evolution files are never rewritten and null-fill
  *    through the recorded schema at read time, and snapshot reads are
  *    O(1) metadata (no per-file footer merge);
  *  - [[appendEpoch]] makes a `foreachBatch` streaming sink
  *    EXACTLY-ONCE: commits are idempotent per epoch id, so a replayed
  *    batch lands at most once.
  */
object SnapshotTable {

  final class ConcurrentCommitException(v: Int)
    extends RuntimeException(s"version $v was committed concurrently")

  private def manifestDir(dir: String): Path = Paths.get(dir, "_manifests")
  private def manifestPath(dir: String, v: Int): Path =
    manifestDir(dir).resolve(f"v$v%08d.manifest")

  /** Highest committed version, 0 if the table does not exist yet. */
  def latestVersion(dir: String): Int = {
    val md = manifestDir(dir)
    if (!Files.isDirectory(md)) 0
    else Files.list(md).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toInt }
      .foldLeft(0)(math.max)
  }

  private case class Manifest(version: Int, op: String, parent: Int,
                              files: Seq[String],
                              header: Map[String, String]) {
    def schema: Option[StructType] =
      header.get("schema").map(j =>
        DataType.fromJson(j).asInstanceOf[StructType])
  }

  private def readManifest(dir: String, v: Int): Manifest = {
    val lines = Files.readAllLines(manifestPath(dir, v), StandardCharsets.UTF_8)
      .asScala.toSeq
    val header = lines.head.split("\t").map { kv =>
      val Array(k, value) = kv.split("=", 2); k -> value
    }.toMap
    Manifest(v, header("op"), header("parent").toInt,
      lines.tail.filter(_.nonEmpty), header)
  }

  /** Atomic publish: CREATE_NEW is the commit point. The manifest
    * header records the table SCHEMA (as Spark's schema JSON) so a
    * snapshot read is `O(1)` metadata — no per-file footer merge at
    * 100 TB — and so SCHEMA EVOLUTION is a manifest property: files
    * written before a column existed are simply read through the newer
    * schema (missing columns null-fill). `extras` carries op-specific
    * header fields (e.g. the streaming epoch id). */
  private def commit(dir: String, v: Int, op: String, parent: Int,
                     files: Seq[String], schema: Option[StructType] = None,
                     extras: Seq[(String, String)] = Nil): Unit = {
    Files.createDirectories(manifestDir(dir))
    val header = (Seq("op" -> op, "parent" -> parent.toString) ++ extras ++
      schema.map(s => "schema" -> s.json)) // JSON escapes tabs/newlines
      .map { case (k, value) => s"$k=$value" }.mkString("\t")
    val body = (header +: files).mkString("\n")
    try
      Files.write(manifestPath(dir, v), body.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(v)
    }
  }

  /** Widest common schema after an evolution step: existing columns
    * keep their position and type (a type CHANGE is refused — that
    * would need a rewrite, not metadata), new columns append, and
    * everything becomes nullable (pre-evolution files null-fill the
    * new columns). */
  private def unionSchema(a: StructType, b: StructType): StructType = {
    a.fields.foreach { f =>
      b.fields.find(_.name == f.name).foreach { g =>
        require(g.dataType == f.dataType,
          s"schema evolution cannot change ${f.name}: ${f.dataType} -> ${g.dataType}")
      }
    }
    val extra = b.fields.filterNot(f => a.fieldNames.contains(f.name))
    StructType((a.fields ++ extra).map(_.copy(nullable = true)))
  }

  /** Write `df` as a fresh immutable file batch; returns the RELATIVE
    * paths of the parquet files produced. */
  private def writeBatch(df: DataFrame, dir: String,
                         numFiles: Option[Int] = None): Seq[String] = {
    val batch = s"data/${java.util.UUID.randomUUID().toString.take(8)}"
    val out = Paths.get(dir, batch)
    val shaped = numFiles.map(df.repartition(_)).getOrElse(df)
    shaped.write.parquet(out.toString)
    Files.list(out).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map(n => s"$batch/$n").toSeq.sorted
  }

  /** Create the table at version 1 (fails if it already has commits). */
  def create(spark: SparkSession, dir: String, df: DataFrame,
             numFiles: Int = 4): Int = {
    val files = writeBatch(df, dir, Some(numFiles))
    commit(dir, 1, "create", 0, files, Some(df.schema))
    1
  }

  /** Create PRESERVING the caller's partitioning — the key-clustered
    * layout (`repartitionByRange` / z-order upstream) that makes
    * file-granular copy-on-write effective: an update batch touching a
    * narrow key range rewrites only the files covering that range,
    * while [[create]]'s round-robin shaping smears every key range
    * across all files (any merge then rewrites the whole table). */
  def createClustered(spark: SparkSession, dir: String, df: DataFrame): Int = {
    val files = writeBatch(df, dir, None)
    commit(dir, 1, "create", 0, files, Some(df.schema))
    1
  }

  /** Snapshot read; `versionAsOf = Some(v)` time-travels. An empty file
    * list (everything deleted) still needs the schema — kept by always
    * carrying at least the latest batch's directory; callers with an
    * empty table read an empty relation with the create-time schema. */
  def read(spark: SparkSession, dir: String,
           versionAsOf: Option[Int] = None): DataFrame = {
    val v = versionAsOf.getOrElse(latestVersion(dir))
    require(v >= 1, s"no committed version at $dir")
    val m = readManifest(dir, v)
    val paths = m.files.map(f => Paths.get(dir, f).toString)
    // the manifest-recorded schema makes the read O(1) metadata and
    // null-fills columns a file predates (schema evolution)
    m.schema.map(spark.read.schema).getOrElse(spark.read).parquet(paths: _*)
  }

  /** Append-only commit: prior files carried by reference.
    * `fromVersion` pins the snapshot this transaction read (optimistic
    * concurrency): if someone else committed after it, the CREATE_NEW
    * publish loses and throws [[ConcurrentCommitException]] instead of
    * silently building on state the caller never saw. */
  def append(spark: SparkSession, dir: String, df: DataFrame,
             numFiles: Int = 4, fromVersion: Option[Int] = None): Int = {
    val base = fromVersion.getOrElse(latestVersion(dir))
    val m = readManifest(dir, base)
    val files = writeBatch(df, dir, Some(numFiles))
    val v = base + 1
    // appending a batch with NEW columns evolves the table schema as
    // pure metadata: prior files are untouched and null-fill on read
    val evolved = m.schema.map(unionSchema(_, df.schema)).getOrElse(df.schema)
    commit(dir, v, "append", base, m.files ++ files, Some(evolved))
    v
  }

  /** EXACTLY-ONCE streaming ingestion: append `df` under `epochId`,
    * SKIPPING the commit when any manifest already records this epoch.
    * `foreachBatch` replays a failed epoch with the same batch id and
    * (for replayable sources) the same data, so epoch-idempotent
    * commits turn at-least-once delivery into an exactly-once table —
    * the same discipline as RegistrySink's two-phase commit, at the
    * table-format level. A racing replay of the SAME epoch is
    * arbitrated by CREATE_NEW (the loser's batch becomes a vacuumable
    * orphan). Returns the version holding the epoch. */
  def appendEpoch(spark: SparkSession, dir: String, df: DataFrame,
                  epochId: Long, numFiles: Int = 2): Int = {
    val latest = latestVersion(dir)
    val seen = (1 to latest).find(v =>
      readManifest(dir, v).header.get("epoch").contains(epochId.toString))
    seen.getOrElse {
      val prior =
        if (latest == 0) Seq.empty else readManifest(dir, latest).files
      val evolved =
        if (latest == 0) df.schema
        else readManifest(dir, latest).schema
          .map(unionSchema(_, df.schema)).getOrElse(df.schema)
      val files = writeBatch(df, dir, Some(numFiles))
      val v = latest + 1
      commit(dir, v, "append", latest, prior ++ files, Some(evolved),
        Seq("epoch" -> epochId.toString))
      v
    }
  }

  /** MERGE (upsert by `keyCols`): file-granular copy-on-write.
    * One distributed semi-join over the current snapshot finds the
    * files containing matched keys (driver collects only the FILE
    * list); those files are rewritten as (their rows anti-joined on
    * the update keys) ∪ updates — so updates replace matches and
    * unmatched update rows are inserts — and every untouched file is
    * carried by reference. If no file matches, the updates batch is a
    * pure append. */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
            keyCols: Seq[String], numFiles: Int = 4,
            fromVersion: Option[Int] = None): Int = {
    val base = fromVersion.getOrElse(latestVersion(dir))
    val m = readManifest(dir, base)
    val abs = m.files.map(f => Paths.get(dir, f).toString)
    val reader = m.schema.map(spark.read.schema).getOrElse(spark.read)
    val current = reader.parquet(abs: _*)
    val touchedAbs = current
      .withColumn("_src_file", input_file_name())
      .join(updates.select(keyCols.map(col): _*).distinct(), keyCols, "left_semi")
      .select(col("_src_file")).distinct()
      .collect().map(_.getString(0)).toSet
    // input_file_name yields URIs (file://…); the relative manifest
    // path data/<batch>/part-… is a suffix of the URI
    val touchedRel = m.files.filter(f => touchedAbs.exists(_.endsWith(f)))
    val untouched = m.files.filterNot(touchedRel.contains)
    val touchedDf =
      if (touchedRel.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], current.schema)
      else reader.parquet(
        touchedRel.map(f => Paths.get(dir, f).toString): _*)
    // allowMissingColumns: updates may EVOLVE the schema (new columns
    // null-fill in carried rows, and in carried FILES via the manifest
    // schema) or omit columns (null-filled in the rewritten rows)
    val rewritten = touchedDf.join(updates, keyCols, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
    val files = writeBatch(rewritten, dir, Some(numFiles))
    val v = base + 1
    val evolved = m.schema.map(unionSchema(_, updates.schema))
      .getOrElse(rewritten.schema)
    commit(dir, v, "merge", base, untouched ++ files, Some(evolved))
    v
  }

  /** DELETE rows matching `predicate`: copy-on-write on the files that
    * contain at least one matching row. */
  def delete(spark: SparkSession, dir: String, predicate: String,
             numFiles: Int = 4, fromVersion: Option[Int] = None): Int = {
    val base = fromVersion.getOrElse(latestVersion(dir))
    val m = readManifest(dir, base)
    val abs = m.files.map(f => Paths.get(dir, f).toString)
    val reader = m.schema.map(spark.read.schema).getOrElse(spark.read)
    val current = reader.parquet(abs: _*)
    val touchedAbs = current
      .withColumn("_src_file", input_file_name())
      .filter(predicate)
      .select(col("_src_file")).distinct()
      .collect().map(_.getString(0)).toSet
    val touchedRel = m.files.filter(f => touchedAbs.exists(_.endsWith(f)))
    val untouched = m.files.filterNot(touchedRel.contains)
    val files =
      if (touchedRel.isEmpty) Seq.empty
      else writeBatch(
        reader.parquet(touchedRel.map(f => Paths.get(dir, f).toString): _*)
          .filter(s"NOT ($predicate)"),
        dir, Some(numFiles))
    val v = base + 1
    commit(dir, v, "delete", base, untouched ++ files, m.schema)
    v
  }

  /** Compaction: rewrite the CURRENT snapshot into `target` files under
    * a new version. Content-identical by construction; older versions
    * keep reading their original files (snapshot isolation). */
  def compact(spark: SparkSession, dir: String, target: Int): Int = {
    val base = latestVersion(dir)
    val snapshot = read(spark, dir)
    val files = writeBatch(snapshot, dir, Some(target))
    val v = base + 1
    commit(dir, v, "compact", base, files, Some(snapshot.schema))
    v
  }

  /** Drop every data file not referenced by the latest `keepVersions`
    * manifests, and the older manifests themselves — after vacuum,
    * time travel reaches only the kept versions. Also reclaims orphan
    * batches from aborted/losing commits. */
  def vacuum(dir: String, keepVersions: Int = 1): Unit = {
    val latest = latestVersion(dir)
    val keep = (math.max(1, latest - keepVersions + 1) to latest)
    val referenced = keep.flatMap(v => readManifest(dir, v).files).toSet
    val dataRoot = Paths.get(dir, "data")
    if (Files.isDirectory(dataRoot)) {
      Files.list(dataRoot).iterator().asScala.toSeq.foreach { batch =>
        Files.list(batch).iterator().asScala.toSeq.foreach { f =>
          val rel = s"data/${batch.getFileName}/${f.getFileName}"
          val isData = f.getFileName.toString.endsWith(".parquet")
          if (isData && !referenced.contains(rel)) Files.delete(f)
          else if (!isData) Files.delete(f) // _SUCCESS / .crc clutter
        }
        if (!Files.list(batch).iterator().hasNext) Files.delete(batch)
      }
    }
    (1 until keep.head).foreach { v =>
      Files.deleteIfExists(manifestPath(dir, v))
    }
  }

  /** Commit history as a DataFrame:
    * (version, op, parent, n_files, epoch). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    (1 to latestVersion(dir))
      .map(v => readManifest(dir, v))
      .map(m => (m.version, m.op, m.parent, m.files.size,
        m.header.get("epoch").map(_.toLong)))
      .toDF("version", "op", "parent", "n_files", "epoch")
  }
}
