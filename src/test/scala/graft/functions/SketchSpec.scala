package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV distinct sketch: exact below k, bounded-error estimate above k,
  * dedup/merge/partitioning invariance, and the SQL surface.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact count when distinct values < k") {
    val df = (1 to 500).map(i => i % 37).toDF("v")
    val r = df.agg(SketchFunctions.kmvDistinct(col("v"), 128)).first().getLong(0)
    assert(r == 37L)
  }

  test("estimate within KMV error bound for many distinct values") {
    val n = 20000
    val df = (1 to n).toDF("v")
    val est = df.agg(SketchFunctions.kmvDistinct(col("v"), 256)).first().getLong(0)
    // relative std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 5 sigma
    assert(math.abs(est.toDouble / n - 1.0) < 0.32, s"est=$est for n=$n")
  }

  test("duplicates collapse: repeated values don't change the estimate") {
    val base = (1 to 5000).toDF("v")
    val dup = (1 to 5000).flatMap(i => Seq(i, i, i)).toDF("v")
    val a = base.agg(SketchFunctions.kmvDistinct(col("v"), 128)).first().getLong(0)
    val b = dup.agg(SketchFunctions.kmvDistinct(col("v"), 128)).first().getLong(0)
    assert(a == b)
  }

  test("estimate is invariant to partitioning (merge path)") {
    val df = (1 to 10000).toDF("v")
    val est = (1 to 4).map(p =>
      df.repartition(p * 3).agg(SketchFunctions.kmvDistinct(col("v"), 128))
        .first().getLong(0)).distinct
    assert(est.size == 1, s"partitioning changed the estimate: $est")
  }

  test("nulls are ignored") {
    val df = Seq[Option[Int]](Some(1), None, Some(2), None, Some(3)).toDF("v")
    val r = df.agg(SketchFunctions.kmvDistinct(col("v"), 16)).first().getLong(0)
    assert(r == 3L)
  }

  test("grouped sketch: per-group buffers stay independent") {
    val df = (1 to 6000).map(i => (i % 3, i)).toDF("g", "v")
    val r = df.groupBy("g")
      .agg(SketchFunctions.kmvDistinct(col("v"), 64).as("est"),
        countDistinct(col("v")).as("exact"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2))).toSeq
    r.foreach { case (_, est, exact) =>
      assert(math.abs(est.toDouble / exact - 1.0) < 0.7, s"est=$est exact=$exact")
    }
  }

  test("heavy hitters: superset guarantee and error bound hold") {
    // zipf-ish: item i appears (500 / i) times, i = 1..100 → n ≈ 2594
    val rows = (1 to 100).flatMap(i => Seq.fill(500 / i)(s"item$i"))
    val n = rows.size
    val k = 40
    val df = rows.toDF("v").repartition(7)
    val hh = df.agg(SketchFunctions.heavyHitters(col("v"), k).as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val threshold = n / (k + 1)
    val trueCounts = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every item above n/(k+1) must be reported
    trueCounts.filter(_._2 > threshold).foreach { case (item, c) =>
      assert(hh.contains(item), s"missing heavy hitter $item (count $c, threshold $threshold)")
    }
    // estimates never overcount and undercount by at most n/(k+1) per merge level;
    // with one repartition there are two levels — allow 2× the single-level bound
    hh.foreach { case (item, est) =>
      val truth = trueCounts(item)
      assert(est <= truth, s"$item overcounted: $est > $truth")
      assert(truth - est <= 2L * threshold, s"$item undercounted beyond bound: $est vs $truth")
    }
  }

  test("heavy hitters: fewer distinct values than k is exact") {
    val df = (1 to 300).map(i => s"v${i % 5}").toDF("v").repartition(3)
    val hh = df.agg(SketchFunctions.heavyHitters(col("v"), 16).as("hh"))
      .selectExpr("explode(hh) AS e").select("e.item", "e.est_count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == (0 to 4).map(i => s"v$i" -> 60L).toMap)
  }

  test("SQL registration: kmv_distinct usable from spark.sql") {
    graft.GraftExtensions.register(spark)
    (1 to 1000).toDF("v").createOrReplaceTempView("kmv_in")
    val sql = spark.sql(
      "SELECT kmv_distinct(CAST(conv(substring(md5(CAST(v AS STRING)), 1, 15), 16, 10) AS BIGINT), 64) FROM kmv_in")
      .first().getLong(0)
    val api = (1 to 1000).toDF("v")
      .agg(SketchFunctions.kmvDistinct(col("v"), 64)).first().getLong(0)
    assert(sql == api)
  }
}
