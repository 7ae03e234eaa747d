package pystreamsspark.streams

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import pystreamsspark.SparkSpec

/** Property laws: the streams façade must agree with Scala collections
  * on every operator (SURVEY.md §5.4). Uses ScalaCheck generators with a
  * fixed seed (deterministic; the scalatestplus bridge isn't in the
  * offline cache, so sampling is driven manually).
  */
class StreamLawsSpec extends SparkSpec {
  import org.apache.spark.sql.Encoders

  implicit val intEnc: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
  implicit val tupLongEnc: org.apache.spark.sql.Encoder[(Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
  implicit val tupIntEnc: org.apache.spark.sql.Encoder[(Int, Int)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaInt)

  /** Deterministically sample `n` values from `gen` and run the check. */
  private def check[A](gen: Gen[A], n: Int = 6)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val smallLists = Gen.listOfN(50, Gen.chooseNum(-1000, 1000))
  private val tinyNonEmpty =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000)).map(_.take(50))

  test("map.sum law") {
    check(tinyNonEmpty) { data =>
      assert(Stream(spark, data).map(_ * 2).sum === data.map(_ * 2).sum)
    }
  }

  test("filter law") {
    check(smallLists) { data =>
      assert(Stream(spark, data).filter(_ % 3 == 0).collect().sorted ===
        data.filter(_ % 3 == 0).sorted)
    }
  }

  test("fusion: map∘filter∘map ≡ composed") {
    check(smallLists) { data =>
      val viaStream =
        Stream(spark, data).map(_ + 1).filter(_ % 2 == 0).map(_ * 3).collect().sorted
      assert(viaStream === data.map(_ + 1).filter(_ % 2 == 0).map(_ * 3).sorted)
    }
  }

  test("flatMap law") {
    check(Gen.listOfN(20, Gen.chooseNum(0, 5))) { data =>
      assert(Stream(spark, data).flatMap(n => Seq.fill(n)(n)).collect().sorted ===
        data.flatMap(n => Seq.fill(n)(n)).sorted)
    }
  }

  test("distinct idempotent + set-equal") {
    check(Gen.listOfN(50, Gen.chooseNum(0, 10))) { data =>
      val once = Stream(spark, data).distinct
      assert(once.collect().sorted === data.distinct.sorted)
      assert(once.distinct.collect().sorted === data.distinct.sorted)
    }
  }

  test("sorted is a total order") {
    check(smallLists) { data =>
      assert(Stream(spark, data).sorted.collect().toList === data.sorted)
    }
  }

  test("reduce/min/max/count/mean terminals") {
    check(tinyNonEmpty) { data =>
      val s = Stream(spark, data)
      assert(s.reduce(_ + _) === data.sum)
      assert(s.min === data.min)
      assert(s.max === data.max)
      assert(s.count() === data.length)
      assert(math.abs(s.mean - data.map(_.toDouble).sum / data.length) < 1e-9)
    }
  }

  test("any/all short-circuit terminals") {
    check(smallLists) { data =>
      val s = Stream(spark, data)
      assert(s.any(_ > 500) === data.exists(_ > 500))
      assert(s.all(_ > -2000) === data.forall(_ > -2000))
    }
  }

  test("groupByKey.reduceByKey ≡ groupBy.mapValues(reduce)") {
    check(Gen.nonEmptyListOf(Gen.chooseNum(0, 1000)).map(_.take(60))) { data =>
      val got = Stream(spark, data).groupByKey(_ % 5).reduceByKey(_ + _)
        .collect().toMap
      assert(got === data.groupBy(_ % 5).view.mapValues(_.sum).toMap)
    }
  }

  test("countByKey ≡ groupBy.size") {
    check(Gen.nonEmptyListOf(Gen.chooseNum(0, 9)).map(_.take(60))) { data =>
      val got = Stream(spark, data).groupByKey(_ % 3).countByKey().collect().toMap
      assert(got === data.groupBy(_ % 3).view.mapValues(_.size.toLong).toMap)
    }
  }

  test("shuffle preserves the multiset") {
    check(smallLists) { data =>
      assert(Stream(spark, data).shuffle(7).collect().sorted === data.sorted)
    }
  }

  test("union = concatenation (bag semantics)") {
    check(Gen.zip(smallLists, smallLists)) { case (a, b) =>
      assert(Stream(spark, a).union(Stream(spark, b)).collect().sorted ===
        (a ++ b).sorted)
    }
  }

  test("take returns n elements") {
    check(smallLists) { data =>
      assert(Stream(spark, data).take(10).length === math.min(10, data.length))
    }
  }

  test("fold with zero") {
    check(smallLists) { data =>
      assert(Stream(spark, data).fold(0)(_ + _) === data.sum)
    }
  }

  test("takeWhile/dropWhile laws (ordered, partition them exactly)") {
    check(smallLists) { data =>
      val p = (x: Int) => x < 200
      assert(Stream(spark, data).takeWhile(p).collect().toList === data.takeWhile(p))
      assert(Stream(spark, data).dropWhile(p).collect().toList === data.dropWhile(p))
      // all-pass predicate: takeWhile keeps everything, dropWhile nothing
      assert(Stream(spark, data).takeWhile(_ => true).collect().toList === data)
      assert(Stream(spark, data).dropWhile(_ => true).collect().isEmpty)
    }
  }

  test("takeWhile after a shuffle: kept set is a consistent prefix") {
    // upstream with a shuffle has no stable encounter order across job
    // re-executions; the persisted index (idxedStable) must make the
    // cut-finding and filter jobs agree. Invariants that hold for ANY
    // observed order: every kept element passes p, take ∪ drop = input.
    val data = (1 to 500).toList
    val p = (x: Int) => x % 7 != 0
    val shuffled = Stream(spark.createDataset(data)(
      org.apache.spark.sql.Encoders.scalaInt).repartition(13))
    val kept = shuffled.takeWhile(p).collect()
    assert(kept.forall(p), "takeWhile kept an element failing the predicate")
    val dropped = Stream(spark.createDataset(data)(
      org.apache.spark.sql.Encoders.scalaInt).repartition(13)).dropWhile(p).collect()
    assert(dropped.nonEmpty && !p(dropped.head),
      "dropWhile head must be the first failing element")
  }

  test("skip law (encounter order)") {
    check(smallLists) { data =>
      assert(Stream(spark, data).skip(7).collect().toList === data.drop(7))
      assert(Stream(spark, data).skip(10000).collect().isEmpty)
    }
  }

  test("zipWithIndex law: exact 0-based encounter indices") {
    check(smallLists) { data =>
      assert(Stream(spark, data).zipWithIndex.collect().toList ===
        data.zipWithIndex.map { case (x, i) => (x, i.toLong) })
    }
  }

  test("peek: passthrough unchanged, side-effect runs once per element") {
    check(tinyNonEmpty) { data =>
      val acc = spark.sparkContext.longAccumulator("peeked")
      val out = Stream(spark, data).peek(_ => acc.add(1)).collect().toList
      assert(out.sorted === data.sorted)
      assert(acc.value === data.length)
    }
  }
}
