package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Generated-input properties for the slice planners: coverage is the one
  * invariant a slicer must never lose — every source row falls in at least
  * one slice (Mongo's inclusive/overlapping convention) or exactly one
  * (Metabase's half-open convention), for ANY min/max/size. A missed value
  * is silent data loss at extraction time.
  */
class SlicerPropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop, Test => SCTest}

  private def check(prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val genRange = for {
    min <- Gen.chooseNum(-1000000L, 1000000L)
    span <- Gen.chooseNum(1L, 500000L)
    size <- Gen.chooseNum(1L, 600000L)
  } yield (min, min + span, size)

  test("Mongo slices: contiguous at boundaries, full [min,max] coverage, width-bounded") {
    check(Prop.forAll(genRange) { case (min, max, size) =>
      val ss = MongoSliceReader.slices(min, max, size)
      ss.nonEmpty &&
      ss.head._1 == min && ss.last._2 == max &&
      // each slice starts where the previous ENDED (the overlapping-
      // boundary convention the keep-last _id dedup absorbs)
      ss.sliding(2).forall { case Seq((_, e), (s, _)) => s == e; case _ => true } &&
      ss.forall { case (lo, hi) => lo < hi && hi - lo <= size }
    })
  }

  test("Mongo slices: every value in [min,max] is selected by >= 1 slice's inclusive filter") {
    check(Prop.forAll(for {
      r <- genRange; v <- Gen.chooseNum(0L, r._2 - r._1)
    } yield (r, r._1 + v)) { case ((min, max, size), value) =>
      val hit = MongoSliceReader.slices(min, max, size)
        .count { case (lo, hi) => value >= lo && value <= hi }
      hit >= 1 && hit <= 2 // boundary values land in at most two
    })
  }

  test("Metabase half-open slices: exact partition of [min,max) — every value in exactly ONE slice") {
    check(Prop.forAll(for {
      r <- genRange; v <- Gen.chooseNum(0L, r._2 - r._1 - 1)
    } yield (r, r._1 + v)) { case ((min, max, size), value) =>
      val intSize = math.min(size, Int.MaxValue.toLong).toInt
      val ss = MetabaseReader.halfOpenSlices(min, max, intSize)
      ss.count { case (lo, hi) => value >= lo && value < hi } == 1
    })
  }

  test("Metabase slice-size shrink: positive, never grows, exact ratio division") {
    check(Prop.forAll(for {
      rows <- Gen.chooseNum(0L, 100000000L)
      size <- Gen.chooseNum(1, 1000000)
    } yield (rows, size)) { case (rows, size) =>
      val adj = MetabaseReader.adjustSliceSize(rows, size)
      val linesPerId = rows / size
      adj >= 1 && adj <= size &&
      (if (linesPerId <= 1) adj == size
       else adj == math.max(1L, size / linesPerId).toInt)
    })
  }

  test("keep-last dedup: unique ids, last value wins, first-seen order") {
    val genDocs = Gen.listOf(for {
      id <- Gen.chooseNum(0, 30); v <- Gen.chooseNum(0, 1000000)
    } yield (id, v)).map(_.map { case (id, v) => s"""{"_id":"$id","v":$v}""" })
    check(Prop.forAll(genDocs) { docs =>
      val out = MongoSliceReader.dedupKeepLast(docs, "_id")
      def idOf(d: String) = d.split("\"")(3)
      val outIds = out.map(idOf)
      outIds.distinct == outIds &&                      // unique
      outIds == docs.map(idOf).distinct &&              // first-seen order
      out.forall { d =>                                 // last value wins
        docs.reverse.find(x => idOf(x) == idOf(d)).contains(d)
      }
    }, n = 200)
  }
}
