package pystreamsspark.io

import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming READ of a snapshot table — `spark.readStream.table(
  * "graft.ns.t")` consumes the table's APPENDS as micro-batches, the
  * Delta-style "table as a stream" contract:
  *
  *  - offsets are VERSIONS (engine-checkpointed as plain ints), so
  *    restart-exactly-once comes from deterministic manifest replay —
  *    batch (start, end] reads exactly the files `end`'s manifest added
  *    over `start`'s;
  *  - the table must evolve APPEND-ONLY across the consumed range:
  *    a version that removed/rewrote files or attached deletion vectors
  *    (merge/delete/update/compact/deleteVectors) fails the stream with
  *    a clear error — `option("ignoreChanges", "true")` instead emits
  *    only the ADDED files of such versions (Delta's semantics: rewrites
  *    may re-emit carried rows; the option name says you accepted that);
  *  - vacuumed start offsets fail loudly (the manifest the offset pins
  *    no longer exists) rather than silently skipping data;
  *  - actual file reading is Spark's own vectorized parquet batch
  *    machinery: per range a ParquetScan over just the added files
  *    plans the partitions, and ONE schema-bound reader factory serves
  *    every batch (factories are file-agnostic).
  */
private[io] class SnapshotMicroBatchStream(dir: String, schema: StructType,
                                           options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val startingVersion: Int =
    Option(options.get("startingversion")).map(_.toInt).getOrElse(1)
  private val ignoreChanges: Boolean =
    Option(options.get("ignorechanges")).exists(_.toBoolean)

  private case class VOffset(v: Int) extends Offset {
    override def json: String = v.toString
  }

  // Trigger.AvailableNow: pin the table's latest version at query start;
  // the run drains up to the pin and terminates even if writers keep
  // committing behind it.
  @volatile private var availableNowPin: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowPin = Some(SnapshotTable.latestVersion(dir))
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    VOffset(availableNowPin.getOrElse(SnapshotTable.latestVersion(dir)))
  override def reportLatestOffset(): Offset =
    VOffset(SnapshotTable.latestVersion(dir))

  override def initialOffset(): Offset =
    VOffset(math.max(0, startingVersion - 1))
  override def latestOffset(): Offset =
    VOffset(SnapshotTable.latestVersion(dir))
  override def deserializeOffset(json: String): Offset = VOffset(json.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** The files version `b` holds that version `a` did not — the batch's
    * input. Append-only enforcement: removed/rewritten entries or DV
    * attachments in the range are CHANGES, refused unless opted into. */
  private def addedFiles(a: Int, b: Int): Seq[String] = {
    val bm = SnapshotTable.manifestEntries(dir, b)
    val am = if (a == 0) Seq.empty else SnapshotTable.manifestEntries(dir, a)
    val aPaths = am.map(_._1).toSet
    val removed = am.filterNot { case (p, dv) =>
      bm.exists(e => e._1 == p && e._2 == dv) }
    if (removed.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"snapshot stream over $dir: versions ($a, $b] removed or " +
          s"rewrote ${removed.size} file(s) (merge/delete/compact/DV) — " +
          "a streaming source consumes APPENDS; pass " +
          "option(\"ignoreChanges\",\"true\") to emit only added files")
    val added = bm.filterNot { case (p, _) => aPaths.contains(p) }
    val dvd = added.filter(_._2.isDefined)
    if (dvd.nonEmpty && !ignoreChanges)
      throw new IllegalStateException(
        s"snapshot stream over $dir: files added in ($a, $b] carry " +
          "deletion vectors; pass option(\"ignoreChanges\",\"true\") to " +
          "emit their raw rows")
    added.map { case (p, _) =>
      java.nio.file.Paths.get(dir, p).toString }
  }

  private def scanOver(paths: Seq[String]): Scan =
    ParquetTable(s"graft-stream:$dir", GraftSqlShims.activeClassic(),
      CaseInsensitiveStringMap.empty(), paths, Some(schema),
      classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[VOffset].v, end.asInstanceOf[VOffset].v)
    if (b <= a) return Array.empty
    val paths = addedFiles(a, b)
    if (paths.isEmpty) Array.empty
    else scanOver(paths).toBatch.planInputPartitions()
  }

  // schema-bound and FILE-AGNOSTIC: one factory serves every batch's
  // partitions (built over an empty relation — partitions carry files)
  override def createReaderFactory(): PartitionReaderFactory =
    scanOver(Seq.empty).toBatch.createReaderFactory()
}

/** ScanBuilder for catalog snapshot tables: a `ParquetScanBuilder`
  * subclass, so the whole native pushdown surface (filters, column
  * pruning, aggregate pushdown) is INHERITED for batch reads, and
  * `build()` re-wraps the built scan as a [[GraftParquetScan]] so
  * streaming reads get [[SnapshotMicroBatchStream]] from the same
  * table. */
private[io] class GraftScanBuilder(dir: String,
                                   fileIndex: PartitioningAwareFileIndex,
                                   schema: StructType,
                                   dataSchema: StructType,
                                   options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(GraftSqlShims.activeClassic(), fileIndex,
    schema, dataSchema, options) {

  override def build(): ParquetScan = {
    val s = super.build()
    new GraftParquetScan(dir, schema, options, s)
  }
}

/** A [[ParquetScan]] carrying the SAME pushed-down state as the scan it
  * re-wraps (every batch behavior inherited verbatim — the copy
  * constructor below passes the built scan's fields through), plus the
  * streaming entry point. */
private[io] class GraftParquetScan(dir: String, tableSchema: StructType,
                                   tblOptions: CaseInsensitiveStringMap,
                                   s: ParquetScan)
  extends ParquetScan(s.sparkSession, s.hadoopConf, s.fileIndex,
    s.dataSchema, s.readDataSchema, s.readPartitionSchema, s.pushedFilters,
    s.options, s.pushedAggregate, s.partitionFilters, s.dataFilters,
    s.pushedVariantExtractions) {

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SnapshotMicroBatchStream(dir, tableSchema, tblOptions)
}
