package pystreamsspark.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2: a deterministic synthetic table generator with
  * REAL pushdown — the §2.2 extension point for sources Spark has no
  * built-in reader for (an internal service, a range-keyed KV store, a
  * generated benchmark relation).
  *
  * What it demonstrates, all through the public connector API:
  *  - `TableProvider` / `SupportsRead` / `TableCapability.BATCH_READ`;
  *  - `SupportsPushDownFilters`: id-range predicates narrow the
  *    GENERATED range — the scan never materializes filtered-out rows
  *    (the analogue of parquet row-group pruning / a KV range read; at
  *    100 TB this is the difference between reading a partition and
  *    reading everything). Accepted id-range filters are FULLY pushed
  *    (the narrowed range emits exactly the surviving rows); anything
  *    else goes back to Spark for post-scan evaluation;
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY
  *    the pruned schema (column projection at the source);
  *  - range splitting into `InputPartition`s — parallelism is decided
  *    at planning time from the (post-pushdown) range.
  *
  * Usage: `spark.read.format("pystreamsspark.sources.SynthSource")
  * .option("rows", n).option("partitions", p).load()`.
  * Columns: id BIGINT (0..rows-1), value BIGINT (an LCG step of id —
  * replayable arithmetic, so a DuckDB oracle can regenerate the exact
  * table), bucket INT (id mod 32).
  */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties arrive in ORIGINAL case (asCaseSensitiveMap) — wrap so
    // .option("keyedBy", …) and .option("keyedby", …) both resolve
    val opts = new CaseInsensitiveStringMap(properties)
    val rows = Option(opts.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(opts.get("partitions")).map(_.toInt).getOrElse(4)
    val batchRows = Option(opts.get("batchrows")).map(_.toLong).getOrElse(100L)
    val keyed = Option(opts.get("keyedby")).contains("bucket")
    new SynthTable(rows, parts, batchRows, keyed)
  }
}

object SynthTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))

  /** One LCG step (Knuth/glibc constants) bounded to [0, 1e6) — pure
    * integer arithmetic a SQL oracle replays verbatim. */
  def valueOf(id: Long): Long = (id * 1103515245L + 12345L) % 1000000L
  def bucketOf(id: Long): Int = (id % 32L).toInt
}

class SynthTable(rows: Long, parts: Int, batchRows: Long = 100L,
                 keyed: Boolean = false)
  extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts, batchRows, keyed)
}

/** Streaming offset = how many ids have been emitted so far. */
case class SynthOffset(emitted: Long) extends Offset {
  override def json(): String = emitted.toString
}

/** The custom MICRO-BATCH stream over the same generated relation: each
  * trigger advances the offset by `batchRows` ids (capped at `rows`),
  * the planner splits the [start, end) id range into partitions, and
  * the engine checkpoints the offsets — restart-exactly-once comes from
  * the offset log, not from the source (the source only needs
  * deterministic replay of a given range, which a generator has by
  * construction; a real system-backed source replays from its log the
  * same way). */
class SynthMicroBatchStream(rows: Long, parts: Int, batchRows: Long,
                            required: StructType, base: Long = 0L) extends MicroBatchStream {
  override def initialOffset(): Offset = SynthOffset(0L)
  override def latestOffset(): Offset =
    SynthOffset(math.min(rows, ledger() + batchRows))
  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)
  override def commit(end: Offset): Unit =
    committed = end.asInstanceOf[SynthOffset].emitted
  @volatile private var committed = 0L
  @volatile private var planned = 0L
  private def ledger(): Long = math.max(committed, planned)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SynthOffset].emitted
    val hi = end.asInstanceOf[SynthOffset].emitted - 1
    planned = math.max(planned, hi + 1)
    if (hi < lo) Array.empty
    else {
      // offsets count EMITTED rows; the generated ids are base-shifted so
      // a pushed-down id-range scan streams ids [base, base+rows-1], not
      // [0, rows-1] — otherwise the post-scan re-evaluation of the same
      // predicate would silently drop every row above rows-1
      val per = math.max(1L, (hi - lo + 1 + parts - 1) / parts)
      Iterator.iterate(lo)(_ + per).takeWhile(_ <= hi)
        .map(s => SynthPartition(base + s, base + math.min(hi, s + per - 1)): InputPartition)
        .toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
  override def stop(): Unit = ()
}

class SynthScanBuilder(rows: Long, parts: Int, batchRows: Long = 100L,
                       keyed: Boolean = false)
  extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {

  private var lo = 0L
  private var hi = rows - 1
  private var accepted = Array.empty[Filter]
  private var required: StructType = SynthTable.schema
  private var pushedAgg: Option[Aggregation] = None
  private var topNDesc: Option[Boolean] = None
  private var limited = false

  private def refName(
      e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }

  /** PARTIAL aggregate pushdown (`supportCompletePushDown` stays at the
    * default false): the source computes ONE partial row per range
    * split in closed form — COUNT(*) is the range length, MIN/MAX(id)
    * are the range endpoints, MIN/MAX(bucket) fall out of modular
    * arithmetic — and Spark's final aggregate merges the per-partition
    * partials. For a generated/range-keyed source this is the whole
    * point of the API: an `agg` over 10^9 rows ships `partitions` rows
    * to Spark instead of 10^9 (the connector analogue of parquet
    * footer-stats aggregate pushdown). Anything the closed forms can't
    * answer (SUM/AVG over the LCG value, grouped aggs) returns false
    * and falls back to the full scan — pushdown must never change
    * results, only row movement. */
  override def pushAggregation(agg: Aggregation): Boolean = {
    val globalOk = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => refName(m.column).exists(c => c == "id" || c == "bucket")
        case m: Max => refName(m.column).exists(c => c == "id" || c == "bucket")
        case _ => false
      }
    // GROUP BY bucket: per-bucket COUNT/MIN(id)/MAX(id) also have O(1)
    // closed forms over a contiguous id range (modular arithmetic) —
    // each split emits ≤32 partial rows instead of its row count
    val groupedOk = agg.groupByExpressions.toSeq.flatMap(refName) == Seq("bucket") &&
      agg.groupByExpressions.length == 1 &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => refName(m.column).contains("id")
        case m: Max => refName(m.column).contains("id")
        case _ => false
      }
    // empty range → decline: a pushed global COUNT(*) over zero
    // partitions would make Spark's final SUM of partials NULL, where
    // the unpushed plan yields 0 — pushdown must never change results.
    // keyed mode declines too: its contract is bucket-grouped ROWS.
    val ok = !keyed && agg.aggregateExpressions.nonEmpty && hi >= lo &&
      (globalOk || groupedOk)
    if (ok) pushedAgg = Some(agg)
    ok
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def num(v: Any): Option[Long] = v match {
      case i: Int  => Some(i.toLong)
      case l: Long => Some(l)
      case _       => None
    }
    accepted = filters.filter {
      case GreaterThan("id", v)        => num(v).exists { n => lo = math.max(lo, n + 1); true }
      case GreaterThanOrEqual("id", v) => num(v).exists { n => lo = math.max(lo, n); true }
      case LessThan("id", v)           => num(v).exists { n => hi = math.min(hi, n - 1); true }
      case LessThanOrEqual("id", v)    => num(v).exists { n => hi = math.min(hi, n); true }
      case EqualTo("id", v)            => num(v).exists { n => lo = math.max(lo, n); hi = math.min(hi, n); true }
      case _ => false
    }
    // accepted id-range filters are FULLY satisfied by the narrowed
    // generator range (the scan emits exactly [lo, hi] — there is no
    // row the predicate could still reject), so only the unaccepted
    // remainder goes back for post-scan evaluation. Full pushdown also
    // matters structurally: a leftover post-scan Filter would sit
    // between a Sort and the relation and block TopN pushdown.
    filters.filterNot(accepted.contains)
  }

  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT k over a contiguous id range is the range's first k ids —
    * any k rows satisfy LIMIT semantics, and clamping the generated
    * range means the scan emits EXACTLY min(k, n) rows, so the limit is
    * FULLY pushed (`isPartiallyPushed` = false → Spark removes the
    * Limit node; the 100 TB value is that a `LIMIT 10` probe reads 10
    * rows, not one full partition per task). */
  override def pushLimit(limit: Int): Boolean = {
    if (keyed) return false // keyed mode keeps whole bucket groups intact
    if (hi >= lo) hi = math.min(hi, lo + math.max(limit, 0) - 1)
    limited = true
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT k is answerable in O(1) from range
    * arithmetic: ASC → [lo, lo+k-1], DESC → [hi-k+1, hi], emitted in
    * the requested order from ONE partition (k rows by construction) —
    * so the TopN is FULLY pushed and Spark removes BOTH the Sort and
    * the Limit (the connector analogue of a JDBC ORDER BY..LIMIT; at
    * scale this turns a full-relation sort into a constant-time seek).
    * Any other sort key falls back (return false → Spark keeps its own
    * Sort+Limit above the scan). */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (keyed) return false
    val onId = orders.length == 1 && (orders(0).expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _                  => false
    })
    if (!onId || hi < lo) return false
    val desc = orders(0).direction() == SortDirection.DESCENDING
    val k = math.max(limit, 0).toLong
    if (desc) lo = math.max(lo, hi - k + 1)
    else hi = math.min(hi, lo + k - 1)
    topNDesc = Some(desc)
    true
  }

  /** OFFSET m drops the first m rows of the EMITTED order, in O(1)
    * range arithmetic: ASC ranges (and bare LIMIT/OFFSET chains)
    * advance `lo`; a pushed DESC TopN emits from `hi` downward, so the
    * drop comes off the top instead. Spark pushes `LIMIT k OFFSET m`
    * as pushLimit/pushTopN(k+m) followed by pushOffset(m), so the
    * surviving range is exactly result rows [m, m+k) — fully pushed,
    * the Offset node is removed (pagination over 10^9 generated rows
    * reads k rows, not a prefix scan). */
  override def pushOffset(offset: Int): Boolean = {
    if (keyed) return false // keyed mode keeps whole bucket groups intact
    val m = math.max(offset, 0).toLong
    if (hi >= lo) {
      if (topNDesc.contains(true)) hi -= m else lo += m
    }
    true
  }

  // one override serves both SupportsPushDownLimit and
  // SupportsPushDownTopN: the pushdowns above are always complete
  override def isPartiallyPushed(): Boolean = false

  override def build(): Scan = (pushedAgg, topNDesc) match {
    case _ if keyed         => new SynthKeyedScan(lo, hi, required)
    case (Some(agg), _)     => new SynthAggScan(lo, hi, parts, agg)
    case (None, Some(desc)) => new SynthTopNScan(lo, hi, desc, required)
    case (None, None)       => new SynthScan(lo, hi, parts, required, batchRows)
  }
}

/** The KEY-GROUPED scan behind `option("keyedBy", "bucket")`: one input
  * partition per bucket value (ids ≡ b mod 32 in the surviving range,
  * an arithmetic progression), each reporting its key via
  * [[org.apache.spark.sql.connector.read.HasPartitionKey]], the scan
  * reporting `KeyGroupedPartitioning(identity(bucket), 32)`. Two such
  * relations joined on `bucket` are STORAGE-PARTITIONED: with
  * `spark.sql.sources.v2.bucketing.enabled` Spark plans the join with
  * ZERO shuffle exchanges — the modern (SPARK-37375) exchange-free
  * co-located join that bucketed tables approximate, asserted in
  * SynthSourceSpec and exercised by q_spj_join. At 100 TB this is the
  * difference between joining in place and re-shuffling both sides. */
class SynthKeyedScan(lo: Long, hi: Long, required: StructType)
  extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthKeyedScan range=[$lo,$hi] keyedBy=bucket"
  override def toBatch: Batch = this
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("bucket")), 32)
  override def planInputPartitions(): Array[InputPartition] =
    (0 until 32).map(b => SynthBucketPartition(b, lo, hi): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthBucketReaderFactory(required)
}

case class SynthBucketPartition(bucket: Int, lo: Long, hi: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class SynthBucketReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[SynthBucketPartition]
    val fields = required.fieldNames
    // ids ≡ bucket (mod 32) within [lo, hi]: arithmetic progression
    val first = bp.lo + (((bp.bucket - bp.lo % 32) % 32 + 32) % 32)
    new PartitionReader[InternalRow] {
      private var cur = first - 32
      override def next(): Boolean = { cur += 32; cur <= bp.hi }
      override def get(): InternalRow = {
        val vals: Array[Any] = fields.map[Any] {
          case "id"     => java.lang.Long.valueOf(cur)
          case "value"  => java.lang.Long.valueOf(SynthTable.valueOf(cur))
          case "bucket" => java.lang.Integer.valueOf(bp.bucket)
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

/** Post-TopN-pushdown scan: the clamped range as a SINGLE partition in
  * the requested order — the k result rows are tiny by construction, so
  * one task both preserves the global order Spark no longer enforces
  * (the Sort was removed) and avoids scheduling k tasks for k rows. */
class SynthTopNScan(lo: Long, hi: Long, desc: Boolean, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthTopNScan range=[$lo,$hi] order=${if (desc) "id DESC" else "id ASC"}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    if (hi < lo) Array.empty
    else Array(SynthPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthTopNReaderFactory(required, desc)
}

class SynthTopNReaderFactory(required: StructType, desc: Boolean)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var cur = if (desc) sp.end + 1 else sp.start - 1
      override def next(): Boolean = {
        if (desc) { cur -= 1; cur >= sp.start }
        else { cur += 1; cur <= sp.end }
      }
      override def get(): InternalRow = {
        val vals: Array[Any] = fields.map[Any] {
          case "id"     => java.lang.Long.valueOf(cur)
          case "value"  => java.lang.Long.valueOf(SynthTable.valueOf(cur))
          case "bucket" => java.lang.Integer.valueOf(SynthTable.bucketOf(cur))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}

/** The post-aggregation-pushdown scan: emits one closed-form partial
  * row per range split, in the order of `agg.aggregateExpressions`
  * (Spark matches scan output to partial aggregates POSITIONALLY —
  * names are cosmetic, types must be the agg inputs' types). */
class SynthAggScan(lo: Long, hi: Long, parts: Int, agg: Aggregation)
  extends Scan with Batch {

  private def colName(f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): String =
    f match {
      case m: Min => m.column.asInstanceOf[NamedReference].fieldNames()(0)
      case m: Max => m.column.asInstanceOf[NamedReference].fieldNames()(0)
      case _      => ""
    }

  override def readSchema(): StructType = {
    // Spark matches positionally: group-by columns FIRST, then one
    // field per aggregate function
    val groupFields = agg.groupByExpressions.toSeq.map(_ =>
      StructField("bucket", IntegerType, nullable = false))
    val aggFields = agg.aggregateExpressions.zipWithIndex.toSeq.map {
      case (_: CountStar, i) => StructField(s"agg$i", LongType, nullable = false)
      case (f, i) =>
        val t = if (colName(f) == "bucket") IntegerType else LongType
        StructField(s"agg$i", t, nullable = false)
    }
    StructType(groupFields ++ aggFields)
  }

  override def description(): String =
    s"SynthAggScan range=[$lo,$hi] pushedAggs=[${agg.aggregateExpressions.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    if (hi < lo) Array.empty
    else {
      val n = hi - lo + 1
      val per = math.max(1L, (n + parts - 1) / parts)
      Iterator.iterate(lo)(_ + per).takeWhile(_ <= hi)
        .map(s => SynthPartition(s, math.min(hi, s + per - 1)): InputPartition)
        .toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory(agg)
}

class SynthAggReaderFactory(agg: Aggregation) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    val (s, e) = (sp.start, sp.end)
    val len = e - s + 1
    // closed-form per-split partials — no row in [s, e] is materialized
    def bucketMin: Int =
      if (len >= 32L || (s % 32) + len > 32L) 0 else (s % 32).toInt
    def bucketMax: Int =
      if (len >= 32L || (s % 32) + len > 32L) 31 else ((s % 32) + len - 1).toInt
    def globalValue(
        f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): Any =
      f match {
        case _: CountStar => java.lang.Long.valueOf(len)
        case m: Min =>
          m.column.asInstanceOf[NamedReference].fieldNames()(0) match {
            case "id"     => java.lang.Long.valueOf(s)
            case "bucket" => java.lang.Integer.valueOf(bucketMin)
          }
        case m: Max =>
          m.column.asInstanceOf[NamedReference].fieldNames()(0) match {
            case "id"     => java.lang.Long.valueOf(e)
            case "bucket" => java.lang.Integer.valueOf(bucketMax)
          }
      }
    if (agg.groupByExpressions.isEmpty)
      new PartitionReader[InternalRow] {
        private var done = false
        override def next(): Boolean = { val r = !done; done = true; r }
        override def get(): InternalRow =
          InternalRow.fromSeq(
            agg.aggregateExpressions.toIndexedSeq.map(globalValue))
        override def close(): Unit = ()
      }
    else {
      // GROUP BY bucket: for each residue b, the ids ≡ b (mod 32) in
      // [s, e] form an arithmetic progression — count and endpoints in
      // O(1), ≤32 rows out regardless of range size
      val rows: IndexedSeq[InternalRow] = (0 until 32).flatMap { b =>
        val first = s + (((b - s % 32) % 32 + 32) % 32)
        if (first > e) None
        else {
          val last = first + ((e - first) / 32) * 32
          val cnt = (last - first) / 32 + 1
          def grpValue(
              f: org.apache.spark.sql.connector.expressions.aggregate.AggregateFunc): Any =
            f match {
              case _: CountStar => java.lang.Long.valueOf(cnt)
              case _: Min       => java.lang.Long.valueOf(first)
              case _: Max       => java.lang.Long.valueOf(last)
            }
          Some(InternalRow.fromSeq(
            java.lang.Integer.valueOf(b) +:
              agg.aggregateExpressions.toIndexedSeq.map(grpValue)))
        }
      }
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < rows.length }
        override def get(): InternalRow = rows(i)
        override def close(): Unit = ()
      }
    }
  }
}

class SynthScan(val lo: Long, val hi: Long, parts: Int,
                required: StructType, batchRows: Long = 100L)
  extends Scan with Batch with SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def description(): String =
    s"SynthScan range=[$lo,$hi] cols=[${required.fieldNames.mkString(",")}]"
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(hi - lo + 1, parts, batchRows, required, base = lo)

  // Join-time (DPP, SPARK-35779) narrowing — None until Spark delivers
  // a runtime filter, then the exact surviving id set
  @volatile private var runtimeIds: Option[Array[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("id"))

  /** RUNTIME (dynamic) filtering: when this scan is the probe side of a
    * join whose build side is small, Spark evaluates the build side's
    * join-key set FIRST and hands it here as `In("id", …)` before input
    * partitions are planned. The generator answers with exact POINT
    * SEEKS — only the ids that can survive the join are ever emitted
    * (the connector analogue of dynamic partition pruning; at 100 TB
    * it's the difference between scanning the fact relation and seeking
    * the ~k dimension keys). Runtime filters are best-effort by
    * contract — unhandled shapes are ignored and the join re-verifies
    * every row, so narrowing can only remove rows the join would drop. */
  override def filter(filters: Array[Filter]): Unit = {
    val idSets = filters.collect {
      case In("id", vs) => vs.iterator.collect {
        case i: Int  => i.toLong
        case l: Long => l
      }.toArray
      case EqualTo("id", v: Long) => Array(v)
      case EqualTo("id", v: Int)  => Array(v.toLong)
    }
    if (idSets.nonEmpty) {
      val conj = idSets.reduce(_ intersect _)
      runtimeIds = Some(conj.filter(id => id >= lo && id <= hi).distinct.sorted)
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    runtimeIds match {
      case Some(ids) if ids.isEmpty => Array.empty
      case Some(ids) =>
        // point seeks, chunked so ≤ `parts` tasks share the key list
        val per = math.max(1, (ids.length + parts - 1) / parts)
        ids.grouped(per).map(g => SynthIdsPartition(g): InputPartition).toArray
      case None =>
        if (hi < lo) Array.empty
        else {
          val n = hi - lo + 1
          val per = math.max(1L, (n + parts - 1) / parts)
          Iterator.iterate(lo)(_ + per).takeWhile(_ <= hi)
            .map(s => SynthPartition(s, math.min(hi, s + per - 1)): InputPartition)
            .toArray
        }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

case class SynthPartition(start: Long, end: Long) extends InputPartition

/** A runtime-filtered partition: an explicit (sorted) id list — the
  * point-seek shape a DPP In-set produces. */
case class SynthIdsPartition(ids: Array[Long]) extends InputPartition

class SynthReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    // project exactly the pruned columns — a column never requested is
    // never computed (source-side projection)
    val fields = required.fieldNames
    // explicit per-branch boxing: an unascribed match would WIDEN
    // the Int branch to Long (weak conformance) and corrupt the
    // IntegerType column
    def rowFor(id: Long): InternalRow = {
      val vals: Array[Any] = fields.map[Any] {
        case "id"     => java.lang.Long.valueOf(id)
        case "value"  => java.lang.Long.valueOf(SynthTable.valueOf(id))
        case "bucket" => java.lang.Integer.valueOf(SynthTable.bucketOf(id))
      }
      InternalRow.fromSeq(vals.toIndexedSeq)
    }
    p match {
      case sp: SynthPartition =>
        new PartitionReader[InternalRow] {
          private var cur = sp.start - 1
          override def next(): Boolean = { cur += 1; cur <= sp.end }
          override def get(): InternalRow = rowFor(cur)
          override def close(): Unit = ()
        }
      case SynthIdsPartition(ids) =>
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < ids.length }
          override def get(): InternalRow = rowFor(ids(i))
          override def close(): Unit = ()
        }
    }
  }
}
