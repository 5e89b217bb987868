package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("__rn", row_number().over(
      Window.partitionBy("key").orderBy(col("v").desc, col("id").asc)))
      .filter(col("__rn") <= k).drop("__rn")

  private val data = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 7.0),
    ("c", 7L, 1.0)
  ).toDF("key", "id", "v")

  test("matches the window row_number formulation (total order, ties included)") {
    for (k <- Seq(1, 2, 3, 10)) {
      val fast = TopKPerKey(data, Seq(col("key")), Seq(col("v").desc, col("id").asc), k)
        .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val ref = windowTopK(data, k)
        .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(fast == ref, s"k=$k")
    }
  }

  test("survives repartitioning (partial heaps merge correctly across partitions)") {
    val spread = data.repartition(7)
    val fast = TopKPerKey(spread, Seq(col("key")), Seq(col("v").desc, col("id").asc), 2)
      .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(fast == Seq(("a", 2L), ("a", 4L), ("b", 5L), ("b", 6L), ("c", 7L)))
  }

  test("plan shape: partial + final custom operators, one exchange, no sort/window") {
    val q = TopKPerKey(data, Seq(col("key")), Seq(col("v").desc, col("id").asc), 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), plan)
    assert(plan.contains("TopKPerKeyFinal"), plan)
    assert(!plan.contains("Window"), plan)
    assert("Sort ".r.findAllIn(plan).isEmpty, plan)
  }

  test("larger randomized agreement with window formulation") {
    val rnd = new scala.util.Random(11)
    val big = Seq.fill(5000)((rnd.nextInt(40).toString, rnd.nextLong(), rnd.nextDouble()))
      .toDF("key", "id", "v").repartition(13)
    val fast = TopKPerKey(big, Seq(col("key")), Seq(col("v").desc, col("id").asc), 3)
      .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val ref = windowTopK(big, 3)
      .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(fast == ref)
  }

  test("partial key cap: pass-through stays correct at tiny caps") {
    val rnd = new scala.util.Random(23)
    val big = Seq.fill(3000)((rnd.nextInt(50).toString, rnd.nextLong(), rnd.nextDouble()))
      .toDF("key", "id", "v").repartition(5)
    for (cap <- Seq(1, 3)) {
      val capped = TopKPerKey(big, Seq(col("key")),
        Seq(col("v").desc, col("id").asc), 2, maxPartialKeys = cap)
        .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      val ref = windowTopK(big, 2)
        .select("key", "id").collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
      assert(capped == ref, s"cap=$cap")
    }
  }

  test("k larger than any group returns everything; k must be positive") {
    val all = TopKPerKey(data, Seq(col("key")), Seq(col("id").asc), 100).count()
    assert(all == data.count())
    intercept[IllegalArgumentException](
      TopKPerKey(data, Seq(col("key")), Seq(col("id").asc), 0).count())
  }
}
