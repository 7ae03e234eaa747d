package pystreamsspark.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK — the write half of the connector story
  * (`SynthSource` is the read half): `SupportsWrite` / `WriteBuilder` /
  * `BatchWrite` with the full two-phase COMMIT PROTOCOL that gives a V2
  * sink exactly-once semantics:
  *
  *  - each task's `DataWriter` accumulates partial statistics (row
  *    count + an order-insensitive XOR checksum of the first column)
  *    and surrenders them as its `WriterCommitMessage` on task commit;
  *  - only the driver-side `BatchWrite.commit` publishes — it folds
  *    the partials of the ONE successful attempt per task into the
  *    registry, so speculative/retried attempts never double-count
  *    (their messages are simply not in the commit set);
  *  - `abort` publishes nothing and records the abort, so a failed
  *    job is observable as "absent", not "partially written".
  *
  * The registry is an in-JVM map because local[N] executors share the
  * driver JVM; on a real cluster the same protocol would target an
  * external transactional store (object-store manifest, JDBC txn) —
  * the commit/abort flow, which is the part Spark owns, is identical.
  */
class RegistrySink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // sink accepts whatever schema the query provides

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val target = Option(properties.get("target")).getOrElse("default")
    new RegistryTable(target, schema)
  }
}

/** Driver-visible results of committed writes, keyed by target name. */
object SinkRegistry {
  final case class Committed(rows: Long, checksum: Long, commits: Int)
  val committed = new TrieMap[String, Committed]()
  val aborted = new TrieMap[String, Int]()
  def clear(): Unit = { committed.clear(); aborted.clear() }
}

class RegistryTable(target: String, writeSchema: StructType)
  extends Table with SupportsWrite {
  override def name(): String = s"registry($target)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite mode arrives as truncate-then-append; the registry
      // entry is replaced on commit either way, so truncate is a no-op
      // accept (returning this keeps the builder chain intact)
      override def truncate(): WriteBuilder = this
      override def build(): Write = new RegistryWrite(target)
    }
}

class RegistryWrite(target: String) extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new RegistryWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val partials = messages.collect { case p: PartialStats => p }
    SinkRegistry.committed.put(target, SinkRegistry.Committed(
      rows = partials.map(_.rows).sum,
      checksum = partials.map(_.checksum).foldLeft(0L)(_ ^ _),
      commits = partials.length))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    SinkRegistry.aborted.updateWith(target) {
      case Some(n) => Some(n + 1)
      case None    => Some(1)
    }
    () // publish nothing — a failed job must look absent, not partial
  }
}

/** Per-task partial statistics — the WriterCommitMessage. */
final case class PartialStats(rows: Long, checksum: Long)
  extends WriterCommitMessage

class RegistryWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      override def write(record: InternalRow): Unit = {
        rows += 1
        // mix the first column (long) through a 64-bit finalizer so the
        // XOR fold detects both missing and duplicated rows
        val v = record.getLong(0)
        var h = v * -7046029254386353131L
        h ^= h >>> 32
        checksum ^= h
      }
      override def commit(): WriterCommitMessage = PartialStats(rows, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
