package pystreamsspark.streams

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.col

/** The reference library's fluent stream surface (SURVEY.md §2.1, §3.3) —
  * `map / filter / flatMap / groupByKey / reduce / sum / distinct /
  * sorted / take / any / all / foreach` — as a thin façade over
  * `Dataset[T]`.
  *
  * Design: every intermediate op appends to the Catalyst logical plan
  * (the analogue of the reference's fused per-chunk closure — Spark's
  * WholeStageCodegen does the fusion), and every terminal op triggers
  * one distributed job. Nothing materializes on the driver except
  * terminal results, so the same pipeline runs unchanged on a 1000-
  * executor cluster. Typed lambdas do cost encoder round-trips; for
  * relational-shaped work prefer the DataFrame queries in
  * `pystreamsspark.relational` (those stay in codegen end-to-end).
  */
final class Stream[T](val ds: Dataset[T]) {

  // ---- intermediate (lazy) ----

  def map[U: Encoder](f: T => U): Stream[U] = new Stream(ds.map(f))

  def filter(p: T => Boolean): Stream[T] = new Stream(ds.filter(p))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): Stream[U] =
    new Stream(ds.flatMap(f))

  def distinct: Stream[T] = new Stream(ds.distinct())

  /** Total order over the element's encoded columns (natural order for
    * primitives, lexicographic field order for case classes) —
    * range-partitioned SortExec, no driver materialization. */
  def sorted: Stream[T] = new Stream(ds.sort(ds.columns.map(col).toIndexedSeq: _*))

  def sortedDesc: Stream[T] =
    new Stream(ds.sort(ds.columns.map(c => col(c).desc).toIndexedSeq: _*))

  /** Hash-redistribute into `n` partitions — the reference's shuffle. */
  def shuffle(n: Int): Stream[T] = new Stream(ds.repartition(n))

  def groupByKey[K: Encoder](f: T => K): KeyedStream[K, T] =
    new KeyedStream(ds.groupByKey(f))

  def union(other: Stream[T]): Stream[T] = new Stream(ds.union(other.ds))

  /** Side-effect tap (Java Streams `peek`): applies `f` to every element
    * as it flows through, passing the element on unchanged. `f` runs on
    * the EXECUTORS at action time — use a Spark accumulator (not a
    * closed-over driver variable) to observe anything from the driver. */
  def peek(f: T => Unit): Stream[T] =
    new Stream(ds.map { x => f(x); x }(ds.encoder))

  /** Elements paired with their global encounter-order index (0-based).
    * The pairing is map-side (no shuffle); `RDD.zipWithIndex` runs one
    * lightweight job to count per-partition sizes first, so per-element
    * indices are exact without any global sort. */
  def zipWithIndex: Stream[(T, Long)] =
    new Stream(ds.sparkSession.createDataset(ds.rdd.zipWithIndex())(
      org.apache.spark.sql.Encoders.tuple(
        ds.encoder, org.apache.spark.sql.Encoders.scalaLong)))

  /** Drop the first `n` elements in encounter order (Java Streams
    * `skip`) — index stamp + map-side filter, no shuffle. */
  def skip(n: Long): Stream[T] =
    new Stream(zipWithIndex.ds.filter(_._2 >= n).map(_._1)(ds.encoder))

  /** Indexed elements PERSISTED before use, so the cut-finding job and
    * the downstream filter job of [[takeWhile]]/[[dropWhile]] see the
    * SAME index assignment: after a shuffle the upstream's encounter
    * order is not guaranteed stable across job re-executions, so
    * comparing indices computed in two independent jobs over the raw
    * lineage could mis-cut. MEMORY_AND_DISK spills instead of evicting;
    * the ContextCleaner unpersists when the RDD becomes unreachable. */
  private def idxedStable: (org.apache.spark.rdd.RDD[(T, Long)], Dataset[(T, Long)]) = {
    val rdd = ds.rdd.zipWithIndex()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (rdd, ds.sparkSession.createDataset(rdd)(org.apache.spark.sql.Encoders.tuple(
      ds.encoder, org.apache.spark.sql.Encoders.scalaLong)))
  }

  /** Longest prefix on which `p` holds (ordered takeWhile). Distributed
    * form: stamp encounter indices once (persisted — see [[idxedStable]]),
    * find the first failing index with one tiny aggregate (min over
    * failures — `fold`, so an all-pass stream yields the identity and
    * keeps everything), keep rows below it. Two jobs at build time;
    * never materializes data on the driver. */
  def takeWhile(p: T => Boolean): Stream[T] = {
    val (rdd, idxed) = idxedStable
    val cut = rdd.filter(x => !p(x._1)).map(_._2)
      .fold(Long.MaxValue)(math.min)
    new Stream(idxed.filter(_._2 < cut).map(_._1)(ds.encoder))
  }

  /** Complement of [[takeWhile]]: drop the longest all-pass prefix, keep
    * the rest (ordered dropWhile). Same two-job shape. */
  def dropWhile(p: T => Boolean): Stream[T] = {
    val (rdd, idxed) = idxedStable
    val cut = rdd.filter(x => !p(x._1)).map(_._2)
      .fold(Long.MaxValue)(math.min)
    new Stream(idxed.filter(_._2 >= cut).map(_._1)(ds.encoder))
  }

  // ---- terminal (eager) ----

  def reduce(f: (T, T) => T): T = ds.reduce(f)

  def fold(zero: T)(f: (T, T) => T)(implicit enc: Encoder[T]): T =
    ds.mapPartitions(it => Iterator.single(it.foldLeft(zero)(f)))
      .collect().foldLeft(zero)(f)

  def count(): Long = ds.count()

  def sum(implicit num: Numeric[T]): T =
    ds.reduce((a, b) => num.plus(a, b))

  def min(implicit ord: Ordering[T]): T = ds.reduce(ord.min _)

  def max(implicit ord: Ordering[T]): T = ds.reduce(ord.max _)

  def mean(implicit num: Numeric[T]): Double = {
    // single pass: per-partition (sum, count) partials, tiny final combine
    val (s, n) = ds.mapPartitions { it =>
      var acc = 0.0; var c = 0L
      it.foreach { x => acc += num.toDouble(x); c += 1 }
      Iterator.single((acc, c))
    }(org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaDouble,
      org.apache.spark.sql.Encoders.scalaLong))
      .collect().foldLeft((0.0, 0L)) { case ((s1, n1), (s2, n2)) => (s1 + s2, n1 + n2) }
    s / n
  }

  def any(p: T => Boolean): Boolean = !ds.filter(p).isEmpty

  def all(p: T => Boolean): Boolean = ds.filter(x => !p(x)).isEmpty

  def take(n: Int): Seq[T] = ds.take(n).toIndexedSeq

  def foreach(f: T => Unit): Unit = ds.foreach(f)

  def collect(): Seq[T] = ds.collect().toIndexedSeq
}

/** Keyed stream: the reference's chunk-by-key surface over
  * `KeyValueGroupedDataset` — one hash shuffle on the key, then per-key
  * processing local to each partition. */
final class KeyedStream[K, T](val kv: org.apache.spark.sql.KeyValueGroupedDataset[K, T]) {

  def reduceByKey(f: (T, T) => T): Stream[(K, T)] =
    new Stream(kv.reduceGroups(f))

  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Stream[U] =
    new Stream(kv.mapGroups(f))

  def countByKey()(implicit enc: Encoder[(K, Long)]): Stream[(K, Long)] =
    new Stream(kv.mapGroups((k, it) => (k, it.size.toLong)))
}

object Stream {
  /** Partition an in-memory collection — `Stream(data)` in the reference. */
  def apply[T: Encoder](spark: SparkSession, data: Seq[T]): Stream[T] =
    new Stream(spark.createDataset(data))

  def apply[T](ds: Dataset[T]): Stream[T] = new Stream(ds)

  def range(spark: SparkSession, n: Long): Stream[java.lang.Long] =
    new Stream(spark.range(n))
}
