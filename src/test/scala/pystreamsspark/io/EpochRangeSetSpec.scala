package pystreamsspark.io

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven laws for the committed-epoch range-set — the
  * metadata that makes `appendEpoch` exactly-once. A bug here silently
  * re-applies (or permanently refuses) a streaming batch, so the whole
  * encode/parse/add/contains algebra is pinned against the naive Set
  * model over arbitrary id sequences, not just the monotonic case the
  * streaming runtime produces. ScalaCheck generators with a fixed seed,
  * sampled manually (the scalatestplus bridge isn't in the offline
  * cache — same pattern as StreamLawsSpec). */
class EpochRangeSetSpec extends AnyFunSuite {

  private val idsGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 200L))

  /** 200 deterministic samples of the generator. */
  private def samples: Seq[List[Long]] =
    (0 until 200).flatMap(i =>
      idsGen(Gen.Parameters.default, Seed(42L + i)))

  private def build(ids: Seq[Long]): Seq[(Long, Long)] =
    ids.foldLeft(Seq.empty[(Long, Long)])(SnapshotTable.addToRanges)

  test("rangesContain ≡ Set membership for arbitrary insertion orders") {
    for (ids <- samples) {
      val rs = build(ids)
      val model = ids.toSet
      for (probe <- 0L to 201L)
        assert(SnapshotTable.rangesContain(rs, probe) === model.contains(probe),
          s"ids=$ids probe=$probe ranges=$rs")
    }
  }

  test("ranges are sorted, disjoint, and maximally coalesced") {
    for (ids <- samples) {
      val rs = build(ids)
      assert(rs.forall { case (a, b) => a <= b }, s"malformed: $rs")
      assert(rs.sliding(2).forall {
        case Seq((_, b1), (a2, _)) => a2 > b1 + 1 // gap ≥ 1 → no merge missed
        case _ => true
      }, s"not coalesced: $rs for $ids")
    }
  }

  test("encode/parse round-trips every built range-set") {
    for (ids <- samples) {
      val rs = build(ids)
      val back = SnapshotTable.parseRanges(SnapshotTable.encodeRanges(rs))
      assert(back === rs, s"roundtrip broke: $rs -> $back")
    }
  }

  test("insertion is idempotent and order-independent") {
    for (ids <- samples) {
      val rs = build(ids)
      assert(ids.foldLeft(rs)(SnapshotTable.addToRanges) === rs,
        s"re-insertion changed: $ids")
      assert(build(ids.reverse) === rs, s"order-dependent: $ids")
    }
  }

  test("monotonic streaming epochs collapse to ONE range (the O(1)-header claim)") {
    for (n <- 1 to 100) {
      val rs = build(0L until n.toLong)
      assert(rs === Seq((0L, n - 1L)), s"monotonic 0..${n - 1} gave $rs")
      assert(SnapshotTable.encodeRanges(rs) === (
        if (n == 1) "0" else s"0-${n - 1}"))
    }
  }
}
