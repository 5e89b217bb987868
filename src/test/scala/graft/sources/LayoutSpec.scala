package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Data-layout writes: range clustering must yield files with DISJOINT
  * key ranges (the property parquet min/max skipping needs), and
  * compaction must hit the derived file count.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("writeRangeLayout produces files with disjoint key ranges") {
    val dir = Files.createTempDirectory("graft-range").toString + "/t"
    val df = (1 to 10000).map(i => (i * 7919 % 10000, s"r$i")).toDF("k", "payload")
    LakeWriter.writeRangeLayout(df, dir, Seq(col("k")), numFiles = 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 1, "expected multiple files")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min(col("k")), max(col("k"))).first()
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"overlapping file ranges: $hi >= $lo2 in ${ranges.toSeq}")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(dir).count() == 10000)
  }

  test("zValue2 interleaves bits; writeZOrdered clusters BOTH dimensions") {
    // zValue2 spot checks: (a=1,b=0) → 1; (a=0,b=1) → 2; (a=3,b=3) → 15
    val z = Seq((1L, 0L), (0L, 1L), (3L, 3L)).toDF("a", "b")
      .select(LakeWriter.zValue2(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(z == Seq(1L, 2L, 15L))

    val dir = Files.createTempDirectory("graft-z").toString + "/t"
    // a uniform 64×64 grid of points, shuffled
    val df = (0 until 4096).map(i => (i * 2654435761L % 4096, s"r$i"))
      .toDF("h", "payload")
      .select((col("h") % 64).cast("long").as("x"),
        (col("h") / 64).cast("long").as("y"), col("payload"))
    LakeWriter.writeZOrdered(df, dir, col("x"), col("y"), numFiles = 16, bits = 6)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 4, "expected several files")
    // per-file span of EACH dimension must be far below the global span
    // (64) — a single-key range layout would cluster one dim and leave the
    // other's span at ~full width in every file
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("x"), max("x"), min("y"), max("y")).first()
      (r.getLong(1) - r.getLong(0), r.getLong(3) - r.getLong(2))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    assert(avgX < 40 && avgY < 40,
      s"z-order should bound both dims: avg x-span $avgX, y-span $avgY")
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("compact rewrites to the byte-derived file count") {
    val in = Files.createTempDirectory("graft-compact").toString + "/in"
    val out = in.stripSuffix("/in") + "/out"
    // deliberately fragmented: 50 tiny files
    (1 to 5000).toDF("v").repartition(50).write.parquet(in)
    val inFiles = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(inFiles == 50)
    val fs = new org.apache.hadoop.fs.Path(in)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(in)).getLength
    // target half the input → 2 files
    val n = LakeWriter.compact(spark, in, out, targetBytes = totalBytes / 2 + 1)
    assert(n == 2)
    val outFiles = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 2)
    assert(spark.read.parquet(out).count() == 5000)
  }

  test("exactPercentiles selects order statistics per group") {
    import graft.operators.Relational
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("b", 5.0), ("b", 1.0), ("b", 3.0))).toDF("g", "v")
    val r = Relational.exactPercentiles(df, Seq("g"), col("v"), Seq(0.5, 0.99))
      .orderBy("g").collect()
    // group a: n=100 → p50 = rank ceil(50·IEEE)=50 → 50.0; p99 = rank 99
    assert(r(0).getDouble(1) == 50.0 && r(0).getDouble(2) == 99.0)
    assert(r(0).getLong(3) == 100L)
    // group b: n=3 → p50 = rank 2 → 3.0; p99 = rank 3 → 5.0
    assert(r(1).getDouble(1) == 3.0 && r(1).getDouble(2) == 5.0)
  }

  test("exactPercentiles shares one exchange across windows and agg") {
    import graft.operators.Relational
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val plan = Relational.exactPercentiles(df, Seq("g"), col("v"), Seq(0.5))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
