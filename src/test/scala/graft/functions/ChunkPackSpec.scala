package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Relational

class ChunkPackSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens: overlapping windows, contained tail suppressed") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = df.select(explode(TextFunctions.chunkByTokens(col("text"), 4, 1)).as("c"))
      .select(col("c.start"), col("c.n_tokens"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // step = 3: the window at 6 already reaches end-of-doc, so no start at 9
    // (its 1-token tail "t10" is a pure sub-window of the chunk at 6).
    assert(chunks.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (3L, 4L, "t4 t5 t6 t7"),
      (6L, 4L, "t7 t8 t9 t10")))
  }

  test("chunkByTokens: short tail kept when it covers new tokens") {
    val text = (1 to 11).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("id", "text")
    val chunks = df.select(explode(TextFunctions.chunkByTokens(col("text"), 4, 1)).as("c"))
      .select(col("c.start"), col("c.n_tokens"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // t11 is covered by no window before start 9, so the tail survives.
    assert(chunks.toSeq == Seq(
      (0L, 4L, "t1 t2 t3 t4"),
      (3L, 4L, "t4 t5 t6 t7"),
      (6L, 4L, "t7 t8 t9 t10"),
      (9L, 2L, "t10 t11")))
  }

  test("chunkByTokens: empty text yields one empty chunk") {
    val df = Seq((1L, "")).toDF("id", "text")
    val c = df.select(explode(TextFunctions.chunkByTokens(col("text"), 4, 0)).as("c"))
      .select(col("c.n_tokens"), col("c.chunk")).collect()
    assert(c.length == 1 && c(0).getLong(0) == 0L && c(0).getString(1) == "")
  }

  test("packSequences: offset packing with integer bins, per shard") {
    val df = Seq(
      ("en", 1L, 600L), ("en", 2L, 600L), ("en", 3L, 600L), ("en", 4L, 600L),
      ("pt", 5L, 2500L), ("pt", 6L, 100L)
    ).toDF("lang", "doc_id", "n")
    val out = Relational.packSequences(df, Seq("lang"), Seq(col("doc_id")),
      col("n"), capacity = 1000L)
      .select("doc_id", "bin_id", "offset_in_bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // en cums: 0,600,1200,1800 → bins 0,0,1,1; pt cums: 0,2500 → bins 0,2
    assert(out.toSeq == Seq(
      (1L, 0L, 0L), (2L, 0L, 600L), (3L, 1L, 200L), (4L, 1L, 800L),
      (5L, 0L, 0L), (6L, 2L, 500L)))
  }

  test("splitAssign: stable, weights respected, same key same split everywhere") {
    val df = (1 to 2000).toDF("k")
      .select(col("k"), Relational.splitAssign(col("k"), 90, 5).as("split"))
    val counts = df.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("train") > 1600 && counts("val") < 200 && counts("test") < 200)
    // co-assignment: the same key in a second "table" gets the same split
    val other = (1 to 2000).toDF("k")
      .select(col("k"), Relational.splitAssign(col("k"), 90, 5).as("split2"))
    assert(df.join(other, "k").filter(col("split") =!= col("split2")).count() == 0)
  }

  test("deterministicSample compiles to TakeOrderedAndProject and is stable") {
    val df = (1 to 5000).toDF("k")
    val s1 = Relational.deterministicSample(df, col("k"), 50)
    assert(s1.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      s1.queryExecution.executedPlan.toString)
    val a = s1.collect().map(_.getInt(0)).sorted.toSeq
    val b = Relational.deterministicSample(df.repartition(13), col("k"), 50)
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(a == b && a.size == 50)
  }
}
