package pystreamsspark.llm

import org.apache.spark.sql.functions._
import pystreamsspark.SparkSpec

/** IVF ANN: clustered data → high recall with a fraction of the corpus
  * scanned. Fixed seed, deterministic outcome. */
class IvfSpec extends SparkSpec {

  test("ivf knn: recall on clustered vectors, cells restrict the scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 16
    val nClusters = 8
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    // 400 points, 50 per cluster, small jitter
    val points = (0 until 400).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val emb = points.toDF("vec_id", "embedding")
    // deterministic centroids: one representative point per cluster
    val centroids = points.take(nClusters)
      .map { case (id, v) => (id, v) }.toDF("cid", "cvec")
    val probe = emb.filter($"vec_id" === 100).select($"embedding".as("probe"))

    val exact = Similarity.knn(emb, "vec_id", "embedding", probe, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfKnn(emb, "vec_id", "embedding",
        centroids, probe, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall exact=$exact approx=$approx")

    // the scan really is restricted: 2 of 8 cells ≈ 1/4 of the corpus
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", centroids)
    val cellSizes = assigned.groupBy("cell").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cellSizes.size === nClusters)
    val scanned = cellSizes.values.toSeq.sorted(Ordering[Long].reverse).take(2).sum
    assert(scanned < 200, s"scanned=$scanned of 400")
  }

  test("kmeans: partition-invariant centroids, monotone objective, fitted IVF recall") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val nClusters = 8
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian()))
    val points = (0 until 400).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val emb = points.toDF("vec_id", "embedding")

    // Det decimal means -> centroids are BIT-identical at any partition count
    def centMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val f1 = centMap(Similarity.kmeansFit(emb, "vec_id", "embedding", 8, 3))
    val f2 = centMap(Similarity.kmeansFit(
      emb.repartition(7), "vec_id", "embedding", 8, 3))
    assert(f1 === f2)
    assert(f1.size === 8)

    // Lloyd's objective (mean best-centroid cosine) strictly improves on
    // clustered data from the md5 seeds to the fitted centroids
    def objective(cents: Map[Int, Seq[Double]]): Double = {
      def cos(a: Seq[Double], b: Seq[Double]): Double = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      }
      points.map { case (_, v) =>
        val vd = v.map(_.toDouble).toSeq
        cents.values.map(c => cos(vd, c)).max
      }.sum / points.size
    }
    val seeds = centMap(Similarity.kmeansFit(emb, "vec_id", "embedding", 8, 0))
    assert(objective(f1) > objective(seeds) + 0.01,
      s"fit=${objective(f1)} seeds=${objective(seeds)}")

    // fitted centroids drive the IVF funnel: high recall at nprobe=3
    val fittedF = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, 3)
      .select($"cid", transform($"cvec", x => x.cast("float")).as("cvec"))
    val probe = emb.filter($"vec_id" === 100).select($"embedding".as("probe"))
    val exact = Similarity.knn(emb, "vec_id", "embedding", probe, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfKnn(emb, "vec_id", "embedding",
        fittedF, probe, k = 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("persisted IVF index: pruned probe reads equal the recomputed search; stats confine each cell to covering files") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 16
    val points = (0 until 400).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian() + (i % 8)).toFloat))
    }
    val emb = points.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", k = 8, iters = 1, dir)
    val probes = emb.filter($"vec_id" < 2)
      .select($"vec_id".as("pid"), $"embedding".as("probe"))
    val got = Similarity.ivfQueryIndexed(s, dir, "vec_id", "embedding",
        probes, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // equivalence: the indexed query answers exactly what the
    // recompute-per-query path answers from the SAME fit
    val centroids = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, 1)
    for (pid <- Seq(0L, 1L)) {
      val probe = emb.filter($"vec_id" === pid).select($"embedding".as("probe"))
      val expect = Similarity.ivfKnn(emb, "vec_id", "embedding",
          centroids, probe, k = 5, nprobe = 2)
        .collect().zipWithIndex
        .map { case (r, i) => (pid, i + 1, r.getLong(0)) }.toSet
      assert(got.filter(_._1 == pid) === expect,
        s"indexed != recomputed for pid $pid")
    }
    // the index genuinely prunes: each cell's covering files are a
    // strict subset of the cells table (8 range-clustered files, one
    // cell each up to range boundaries)
    val total = pystreamsspark.io.SnapshotTable
      .read(s, s"$dir/cells").inputFiles.length
    val cand = pystreamsspark.io.SnapshotTable
      .readCandidates(s"$dir/cells", "cell", "3", "3")
    assert(cand.size < total, s"cell read not pruned: ${cand.size} of $total")
    // and the index is a durable table: a second session-free read works
    assert(pystreamsspark.io.SnapshotTable.read(s, s"$dir/cells").count() === 400)
    assert(pystreamsspark.io.SnapshotTable.read(s, s"$dir/centroids").count() === 8)
  }

  test("incremental index refresh: ivfAppend lands new vectors in their cells, pruning and answers stay correct") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    def mk(id: Long) =
      (id, Array.fill(dim)((rnd.nextGaussian() + (id % 8)).toFloat))
    val base = (0L until 400L).map(mk)
    val emb = base.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("ivfinc").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", k = 8, iters = 1, dir)
    // refresh with a new batch assigned against the STORED centroids
    val extra = (1000L until 1100L).map(mk)
    val v = Similarity.ivfAppend(s, dir,
      extra.toDF("vec_id", "embedding"), "vec_id", "embedding")
    assert(v === 2)
    val cellsNow = pystreamsspark.io.SnapshotTable.read(s, s"$dir/cells")
    assert(cellsNow.count() === 500)
    // the indexed query over the refreshed index equals the recompute
    // path over the UNION with the ORIGINAL (stored) centroids
    val all = (base ++ extra).toDF("vec_id", "embedding")
    val centroids = Similarity.kmeansFit(emb, "vec_id", "embedding", 8, 1)
    val probes = all.filter($"vec_id" === 1005L)
      .select($"vec_id".as("pid"), $"embedding".as("probe"))
    val got = Similarity.ivfQueryIndexed(s, dir, "vec_id", "embedding",
        probes, k = 5, nprobe = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    val probe = all.filter($"vec_id" === 1005L).select($"embedding".as("probe"))
    val expect = Similarity.ivfKnn(all, "vec_id", "embedding",
        centroids, probe, k = 5, nprobe = 2)
      .collect().zipWithIndex.map { case (r, i) => (i + 1, r.getLong(0)) }.toSet
    assert(got === expect, s"refreshed-index query diverged: $got vs $expect")
    // the appended rows surfaced (some of the neighbors are new ids)
    assert(got.exists(_._2 >= 1000L), s"no appended vector in top-5: $got")
    // pruning still holds after the append: one cell's candidates are a
    // strict subset of the grown file set
    val total = cellsNow.inputFiles.length
    val cand = pystreamsspark.io.SnapshotTable
      .readCandidates(s"$dir/cells", "cell", "3", "3")
    assert(cand.size < total, s"refresh broke pruning: ${cand.size} of $total")
  }

  test("streaming index refresh: ivfAppendEpoch is exactly-once across a checkpointed restart") {
    val s = spark
    import s.implicits._
    val dim = 16
    // per-id seeding: mk(id) is a pure function, so the probe below IS
    // the streamed vector (a shared mutable Random would drift)
    def mk(id: Long) = {
      val r = new scala.util.Random(47 * id + 1)
      (id, Array.fill(dim)((r.nextGaussian() + (id % 8)).toFloat))
    }
    val emb = (0L until 400L).map(mk).toDF("vec_id", "embedding")
    val base = java.nio.file.Files.createTempDirectory("ivfstream")
    val dir = base.resolve("index").toString
    val inDir = base.resolve("in"); java.nio.file.Files.createDirectories(inDir)
    val ckpt = base.resolve("ckpt").toString
    Similarity.ivfBuild(emb, "vec_id", "embedding", k = 8, iters = 1, dir)

    var nf = 0
    def addFile(rows: Seq[(Long, Array[Float])]): Unit = {
      nf += 1
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.parquet(inDir.resolve(s"b$nf").toString)
    }
    def startQuery() =
      s.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("recursiveFileLookup", "true").parquet(inDir.toString)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
          Similarity.ivfAppendEpoch(s, dir, df, "vec_id", "embedding", epoch)
          ()
        }
        .option("checkpointLocation", ckpt).start()

    addFile((1000L until 1050L).map(mk))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    addFile((1050L until 1100L).map(mk)) // arrives while the query is DOWN
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val cells = pystreamsspark.io.SnapshotTable.read(s, s"$dir/cells")
    assert(cells.count() === 500)
    assert(cells.select(countDistinct($"vec_id")).head.getLong(0) === 500,
      "a replayed epoch double-applied a vector batch")
    // the refreshed index still answers and still prunes
    val probes = (1060L to 1060L).map(mk).toDF("vec_id", "embedding")
      .select($"vec_id".as("pid"), $"embedding".as("probe"))
    val got = Similarity.ivfQueryIndexed(s, dir, "vec_id", "embedding",
      probes, k = 3, nprobe = 2).collect()
    assert(got.length === 3)
    assert(got.exists(_.getLong(2) == 1060L), "the streamed vector must find itself")
  }

  test("ivf assignment is deterministic and total") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 60).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 3 + j).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = vecs.take(4).toDF("cid", "cvec")
    val a1 = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val a2 = Similarity.ivfAssign(emb.repartition(7), "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a1 === a2)
    assert(a1.size === 60)
  }
}
