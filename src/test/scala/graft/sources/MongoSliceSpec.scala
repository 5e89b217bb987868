package graft.sources

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkSpec

/** Mongo sliced extraction against a LIVE canned-cursor fake: the fake
  * parses the actual find-filter JSON the reader builds and honors
  * `$gte`/`$lte` (plus base equality fields) over an in-memory collection,
  * serving documents through a batch_size'd cursor — the seam the real
  * MongoClient occupies, driven end-to-end with reconciliation.
  */
class MongoSliceSpec extends SparkSpec {

  /** 530 docs, ids 0..529, slice variable `seq` = id, a `src` equality
    * field, and a payload. One boundary-colliding pair: two VERSIONS of
    * the same _id (id 77) — keep-last must win inside a flush.
    */
  private def collection: Seq[String] =
    (0 until 530).flatMap { i =>
      val v1 =
        s"""{"_id":"$i","seq":$i,"src":"${if (i % 4 == 0) "app" else "web"}","v":1}"""
      // id 77 was rewritten in place: its v2 follows immediately in cursor
      // order, so both versions share a flush and keep-last must win there
      if (i == 77) Seq(v1, """{"_id":"77","seq":77,"src":"web","v":2}""")
      else Seq(v1)
    }

  /** Canned-cursor fake: find(filterJson, batchSize) → Iterator[String].
    * Honors $gte/$lte on any field plus string equality fields, exactly
    * like a Mongo find document. Counts queries for assertions.
    */
  private final class FakeMongo(docs: Seq[String]) {
    var findCalls = 0
    var lastBatchSize = -1
    def count(filterJson: Option[String]): Long = select(filterJson).size.toLong
    private def select(filterJson: Option[String]): Seq[String] = {
      val conds = filterJson.map(JsonMethods.parse(_)) match {
        case Some(JObject(fields)) => fields
        case _ => Nil
      }
      docs.filter { d =>
        val j = JsonMethods.parse(d)
        conds.forall {
          case (field, JObject(ops)) => ops.forall {
            case ("$gte", bound) => num(j \ field) >= num(bound)
            case ("$lte", bound) => num(j \ field) <= num(bound)
            case other => fail(s"fake does not speak $other")
          }
          case (field, JString(v)) => (j \ field) == JString(v)
          case other => fail(s"fake does not speak $other")
        }
      }
    }
    private def num(v: JValue): Long = v match {
      case JInt(n) => n.toLong; case JLong(n) => n
      case other => fail(s"non-numeric comparison on $other")
    }
    def find(filterJson: String, batchSize: Int = 101): Iterator[String] = {
      findCalls += 1
      lastBatchSize = batchSize
      // batched cursor: documents arrive in batch_size groups
      select(Some(filterJson)).grouped(batchSize).flatten
    }
    def minMax(field: String): (Long, Long) = {
      val vals = select(None).map(d => num(JsonMethods.parse(d) \ field))
      (vals.min, vals.max)
    }
  }

  test("slices mirror the reference: fixed size, overlapping boundaries, clipped tail") {
    assert(MongoSliceReader.slices(0, 10, 4) == Seq((0L, 4L), (4L, 8L), (8L, 10L)))
    assert(MongoSliceReader.slices(5, 6, 100) == Seq((5L, 6L)))
    // single-distinct-value window drains as one inclusive slice
    // (deliberate divergence: the reference raises here)
    assert(MongoSliceReader.slices(3, 3, 1) == Seq((3L, 3L)))
    intercept[IllegalArgumentException](MongoSliceReader.slices(4, 3, 1))
    intercept[IllegalArgumentException](MongoSliceReader.slices(0, 10, 0))
  }

  test("slice-union ≡ collection: full extraction through the canned cursor reconciles and lands exactly") {
    val mongo = new FakeMongo(collection)
    val landed = scala.collection.mutable.ArrayBuffer.empty[String]
    val (min, max) = mongo.minMax("seq")
    assert((min, max) == (0L, 529L))
    val expected = mongo.count(None)
    val results = MongoSliceReader.slices(min, max, 200).map { case (g, l) =>
      val filter = MongoSliceReader.sliceFilterJson(None, "seq", g, l)
      MongoSliceReader.extractSlice(mongo.find(filter, batchSize = 64),
        landed ++= _, flushThreshold = 150)
    }
    // boundary overlap: seq=200 and seq=400 land twice (sent > expected),
    // still within the ±5% reconciliation band — the reference's exact
    // situation, resolved by id-dedup downstream
    MongoSliceReader.validateTotal(expected, results.map(_.sent))
    assert(results.map(_.sent).sum == expected + 2 - 1) // +2 boundaries, -1 in-flush _id dup
    // 530 docs / threshold 150 across 3 slices => multiple flushes happened
    assert(results.map(_.flushes).sum >= 4 && mongo.findCalls == 3)
    // lake-level view: dedup by _id keep-last ≡ the collection's live docs
    import spark.implicits._
    val df = spark.read.json(spark.createDataset(landed.toSeq))
      .groupBy("_id").agg(org.apache.spark.sql.functions.max("v").as("v"))
    assert(df.count() == 530)
    // the id-77 rewrite kept the LAST version
    assert(df.where("_id = '77'").head().getAs[Long]("v") == 2L)
  }

  test("base equality query merges with the slice predicate and restricts the cursor") {
    val mongo = new FakeMongo(collection)
    val filter = MongoSliceReader.sliceFilterJson(
      Some("""{"src":"app"}"""), "seq", 0, 99)
    val got = mongo.find(filter).toSeq
    assert(got.size == 25) // ids 0,4,...,96
    val parsed = JsonMethods.parse(filter)
    assert((parsed \ "src") == JString("app"))
    assert((parsed \ "seq" \ "$gte") == JInt(0)) // json4s parses ints as JInt
  }

  test("flush failure keeps the buffer intact; a slice retry is exact after downstream dedup") {
    val mongo = new FakeMongo(collection)
    val landed = scala.collection.mutable.ArrayBuffer.empty[String]
    var attempts = 0
    def flakyFlush(batch: Seq[String]): Unit = {
      attempts += 1
      if (attempts == 2) throw new java.io.IOException("upload failed")
      landed ++= batch
    }
    val filter = MongoSliceReader.sliceFilterJson(None, "seq", 0, 529)
    intercept[java.io.IOException] {
      MongoSliceReader.extractSlice(mongo.find(filter), flakyFlush _,
        flushThreshold = 100)
    }
    // retry the slice whole (the reference's task-level retry)
    val r = MongoSliceReader.extractSlice(mongo.find(filter), flakyFlush _,
      flushThreshold = 100)
    assert(r.sent == 530) // 531 raw minus the in-flush _id-77 keep-last dup
    import spark.implicits._
    val distinct = spark.read.json(spark.createDataset(landed.toSeq))
      .select("_id").distinct().count()
    assert(distinct == 530) // first attempt's partial flush is absorbed
  }

  test("±5% reconciliation trips on silent loss") {
    val e = intercept[IllegalArgumentException] {
      MongoSliceReader.validateTotal(1000, Seq(600L, 300L)) // 10% short
    }
    assert(e.getMessage.contains("count reconciliation failed"))
    MongoSliceReader.validateTotal(0, Nil) // zero expected: trivially valid
  }
}
