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
