package graft.flows

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ModelRunnerSpec extends SparkSpec {
  import spark.implicits._

  private def mkRunner(martPath: String) = new ModelRunner(Seq(
    Model("stg_sales",
      "SELECT id, region, amount, sale_date FROM raw_sales WHERE amount > 0",
      tests = Seq(ModelTest("no_null_region",
        "SELECT * FROM stg_sales WHERE region IS NULL"))),
    Model("int_region_daily",
      "SELECT region, sale_date, sum(amount) AS amount FROM stg_sales GROUP BY region, sale_date"),
    Model("mart_region_totals",
      "SELECT region, sum(amount) AS total FROM int_region_daily GROUP BY region",
      materialization = Materialization.Table(martPath))))

  private def registerRaw(): Unit =
    Seq((1L, "north", 10.0, "2024-01-01"), (2L, "south", 5.0, "2024-01-02"),
      (3L, "north", -1.0, "2024-01-02"), (4L, "south", 7.0, "2024-01-03"))
      .toDF("id", "region", "amount", "sale_date")
      .createOrReplaceTempView("raw_sales")

  test("topo order respects the ref graph; run materializes in order") {
    val mart = Files.createTempDirectory("graft-mart").toString
    registerRaw()
    val runner = mkRunner(s"$mart/t")
    assert(runner.topoOrder.map(_.name) ==
      Seq("stg_sales", "int_region_daily", "mart_region_totals"))
    val ran = runner.run(spark)
    assert(ran == Seq("stg_sales", "int_region_daily", "mart_region_totals"))
    // the mart is readable from its WRITTEN parquet, not a recompute
    val r = spark.read.parquet(s"$mart/t").collect()
      .map(x => (x.getString(0), x.getDouble(1))).sorted.toSeq
    assert(r == Seq(("north", 10.0), ("south", 12.0)))
  }

  test("select +model pulls ancestors; model+ pulls descendants; exclude subtracts") {
    val runner = mkRunner("/unused")
    assert(runner.selection("+mart_region_totals") ==
      Set("stg_sales", "int_region_daily", "mart_region_totals"))
    assert(runner.selection("stg_sales+") ==
      Set("stg_sales", "int_region_daily", "mart_region_totals"))
    assert(runner.selection("stg_sales+", exclude = "mart_region_totals") ==
      Set("stg_sales", "int_region_daily"))
    assert(runner.selection("int_region_daily") == Set("int_region_daily"))
  }

  test("running a subset atop missing upstream state fails loudly") {
    val runner = new ModelRunner(Seq(
      Model("up_missing", "SELECT 1 AS x"),
      Model("down_m", "SELECT x FROM up_missing")))
    val e = intercept[IllegalArgumentException] {
      runner.run(spark, select = "down_m")
    }
    assert(e.getMessage.contains("up_missing"))
  }

  test("cycles fail loudly") {
    val runner = new ModelRunner(Seq(
      Model("cyc_a", "SELECT * FROM cyc_b"),
      Model("cyc_b", "SELECT * FROM cyc_a")))
    val e = intercept[IllegalArgumentException](runner.topoOrder)
    assert(e.getMessage.contains("cycle"))
  }

  test("build runs model tests in-line and fails on violations") {
    Seq((1L, null.asInstanceOf[String], 10.0, "2024-01-01"))
      .toDF("id", "region", "amount", "sale_date")
      .createOrReplaceTempView("raw_sales")
    val runner = mkRunner("/unused")
    val e = intercept[IllegalArgumentException] {
      runner.build(spark, select = "stg_sales")
    }
    assert(e.getMessage.contains("no_null_region"))
    // test() reports the same violation as a count, without throwing
    registerRaw()
    runner.run(spark, select = "stg_sales")
    assert(runner.test(spark, select = "stg_sales") ==
      Map("stg_sales.no_null_region" -> 0L))
  }

  test("incremental materialization overwrites only the partitions present") {
    val path = Files.createTempDirectory("graft-incr").toString + "/t"
    val runner = new ModelRunner(Seq(
      Model("incr_daily",
        "SELECT region, CAST(sale_date AS DATE) AS sale_date, amount FROM raw_incr",
        materialization = Materialization.Incremental(path, "sale_date"))))
    // first load: two days
    Seq(("north", "2024-01-01", 10.0), ("south", "2024-01-02", 5.0))
      .toDF("region", "sale_date", "amount").createOrReplaceTempView("raw_incr")
    runner.run(spark)
    // incremental load: day 2 restated (5.0 → 6.0) + day 3 new; day 1 untouched
    Seq(("south", "2024-01-02", 6.0), ("north", "2024-01-03", 7.0))
      .toDF("region", "sale_date", "amount").createOrReplaceTempView("raw_incr")
    runner.run(spark)
    val r = spark.read.parquet(path)
      .select(col("sale_date").cast("string"), col("amount")).collect()
      .map(x => (x.getString(0), x.getDouble(1))).sorted.toSeq
    assert(r == Seq(("2024-01-01", 10.0), ("2024-01-02", 6.0), ("2024-01-03", 7.0)))
  }
}
