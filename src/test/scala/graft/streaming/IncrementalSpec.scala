package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

class IncrementalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("statePartitions policy: volume-proportional, clamped to " +
    "[2, session parallelism]; withStreamParallelism restores the conf") {
    // one partition per ~15k rows
    assert(Incremental.statePartitions(32, 100000L) == 7)
    assert(Incremental.statePartitions(32, 10000L) == 2)  // floor
    assert(Incremental.statePartitions(32, 0L) == 2)
    assert(Incremental.statePartitions(32, 10000000L) == 32) // ceiling
    assert(Incremental.statePartitions(8, 1000000L) == 8)
    // the session ceiling beats the floor: local[1] never gets 2
    assert(Incremental.statePartitions(1, 1000000L) == 1)
    intercept[IllegalArgumentException](
      Incremental.statePartitions(32, 100L, targetRows = 0L))
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val inside = Incremental.withStreamParallelism(spark, 100000L) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside == math.max(2, math.min(prev.toInt, 7)).toString)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
    // restored even when the body throws
    intercept[RuntimeException](
      Incremental.withStreamParallelism(spark, 100000L) {
        sys.error("boom")
      })
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
  }

  test("withStreamPolicy: stateful plans get volume-sized parallelism, " +
    "stateless foreachBatch relays ride session parallelism untouched") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "k", "v")

    // detection: plain relay = stateless; agg/dedup/mapGroupsWithState/
    // stream-stream join = stateful; batch frames are never stateful
    assert(!Incremental.plansStreamState(stream.filter(col("v") > 0)))
    assert(!Incremental.plansStreamState(Seq((1, "a")).toDF("a", "b")
      .groupBy("b").count()))
    assert(Incremental.plansStreamState(Incremental.windowedAgg(
      stream.withColumnRenamed("ts", "t"), "t", "1 hour", "10 minutes",
      Seq(count(lit(1)).as("n")))))
    assert(Incremental.plansStreamState(Incremental.dedupWithinWatermark(
      stream, "ts", "10 minutes", Seq("k"))))
    val evStream = stream.select(col("k").cast("long").as("user_id"),
      col("ts"), col("v").as("value"))
      .withWatermark("ts", "0 seconds")
      .as[Incremental.SessionEvent]
    assert(Incremental.plansStreamState(
      Incremental.sessionize(evStream, gapMs = 1000L)))
    val other = MemoryStream[(Timestamp, String)]
    assert(Incremental.plansStreamState(Incremental.intervalJoin(
      stream.withWatermark("ts", "1 minute").select(col("k"), col("ts")),
      other.toDF().toDF("pts", "k").withWatermark("pts", "1 minute"),
      "k", "ts", "pts", "1 minute", "0 seconds", "1 minute")))
    // a streaming relay JOINED to a static side stays stateless (the
    // static lookup is batch work, no stream-stream state)
    val dim = Seq(("a", 1)).toDF("k", "dim")
    assert(!Incremental.plansStreamState(stream.join(dim, "k")))

    // the policy applies/skips the conf accordingly; approxRows is
    // by-name and must NOT be evaluated on the stateless path
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    var counted = false
    val statelessConf = Incremental.withStreamPolicy(stream,
      { counted = true; 100000L }) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(statelessConf == prev && !counted)
    val statefulConf = Incremental.withStreamPolicy(
      Incremental.dedupWithinWatermark(stream, "ts", "10 minutes", Seq("k")),
      100000L) {
      spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(statefulConf ==
      math.max(2, math.min(prev.toInt, 7)).toString)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
  }

  test("windowedAgg: tumbling hourly counts via MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val df = input.toDF().toDF("ts", "k", "v")
    val agg = Incremental.windowedAgg(df, "ts", "1 hour", "10 minutes",
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sum_v")), Seq(col("k")))
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "a", 1.0),
        (ts("2024-01-01 10:55:00"), "a", 2.0),
        (ts("2024-01-01 11:05:00"), "a", 4.0),
        (ts("2024-01-01 10:30:00"), "b", 8.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select(col("window.start").cast("string"), col("k"), col("n"), col("sum_v"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 10:00:00", "a", 2L, 3.0),
        ("2024-01-01 11:00:00", "a", 1L, 4.0),
        ("2024-01-01 10:00:00", "b", 1L, 8.0)))
    } finally q.stop()
  }

  test("dedupWithinWatermark: duplicate keys within horizon collapse") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "id")
    val deduped = Incremental.dedupWithinWatermark(df, "ts", "1 hour", Seq("id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:00:00"), "x"),
        (ts("2024-01-01 10:05:00"), "x"),
        (ts("2024-01-01 10:06:00"), "y"))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").select("id")
        .collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y"))
    } finally q.stop()
  }

  test("toPartitionedLake: micro-batch upsert is idempotent per partition") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-lake").toString
    val input = MemoryStream[(Timestamp, Double)]
    val df = input.toDF().toDF("ts", "v")
    input.addData((ts("2024-01-01 10:00:00"), 1.0), (ts("2024-01-02 10:00:00"), 2.0))
    val q = Incremental.toPartitionedLake(df, col("ts"), s"$dir/tbl", s"$dir/ckpt").start()
    q.awaitTermination(60000)
    val back = spark.read.parquet(s"$dir/tbl")
    assert(back.count() == 2)
    assert(back.select("data_particao").distinct().count() == 2)
  }

  test("cdcToSnapshot: streaming changelog folds into the parquet snapshot") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-cdc").toString
    val snap = s"$dir/snapshot"
    val input = MemoryStream[(Int, String, Long, String)]
    val df = input.toDF().toDF("k", "payload", "seq", "op")

    // batch 1: two inserts
    input.addData((1, "a", 1L, "upsert"), (2, "b", 1L, "upsert"))
    val q1 = Incremental.cdcToSnapshot(df, Seq("k"), Seq(col("seq")),
      col("op"), Seq("payload"), snap, s"$dir/ckpt").start()
    q1.awaitTermination(60000)
    assert(spark.read.parquet(snap).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a"), (2, "b")))

    // batch 2 (same checkpoint → resumes): update 1, delete 2, insert 3
    input.addData((1, "a2", 2L, "upsert"), (2, "x", 2L, "delete"),
      (3, "c", 1L, "upsert"))
    val q2 = Incremental.cdcToSnapshot(df, Seq("k"), Seq(col("seq")),
      col("op"), Seq("payload"), snap, s"$dir/ckpt").start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(snap).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (3, "c")))
  }

  test("cdcToSnapshot: checkpoint resume processes ONLY unseen files — " +
    "committed batches are never replayed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("stream-cdc-resume").toString
    val snap = s"$dir/snapshot"
    val in = s"$dir/in"
    def landFile(rows: Seq[(Int, String, Long, String)], mtimeMs: Long): Unit = {
      rows.toDF("k", "payload", "seq", "op")
        .coalesce(1).write.mode("append").parquet(in)
      val ft = java.nio.file.attribute.FileTime.fromMillis(mtimeMs)
      val listing = java.nio.file.Files.list(java.nio.file.Paths.get(in))
      try listing.forEach { f =>
        if (java.nio.file.Files.getLastModifiedTime(f).toMillis > 1100000000000L)
          java.nio.file.Files.setLastModifiedTime(f, ft)
      } finally listing.close()
    }
    val schema = "k INT, payload STRING, seq BIGINT, op STRING"
    def run() = Incremental.cdcToSnapshot(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(in),
      Seq("k"), Seq(col("seq")), col("op"), Seq("payload"),
      snap, s"$dir/ckpt").start()
    // phase 1: two files, run to completion ("the stream died here")
    landFile(Seq((1, "a", 1L, "upsert"), (2, "b", 1L, "upsert")), 1000000000000L)
    landFile(Seq((1, "a2", 2L, "upsert")), 1000000060000L)
    val q1 = run(); q1.awaitTermination(120000)
    val p1Batches = q1.recentProgress.map(_.batchId).toSet
    assert(spark.read.parquet(snap).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (2, "b")))
    // phase 2: two NEW files land, resume from the same checkpoint
    landFile(Seq((2, "x", 3L, "delete"), (3, "c", 1L, "upsert")), 1000000120000L)
    landFile(Seq((3, "c2", 2L, "upsert")), 1000000180000L)
    val q2 = run(); q2.awaitTermination(120000)
    // exactly-once through the restart: the resumed query's batch ids are
    // STRICTLY beyond phase 1's — no committed batch was replayed
    val p2Batches = q2.recentProgress.map(_.batchId).toSet
    assert(p2Batches.nonEmpty && p1Batches.nonEmpty)
    assert(p2Batches.forall(_ > p1Batches.max),
      s"phase 2 replayed committed batches: $p1Batches then $p2Batches")
    // and only the new rows took effect, on top of the phase-1 state
    assert(spark.read.parquet(snap).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a2"), (3, "c2")))
  }

  test("cdcToSnapshot: crash between swap renames recovers from backup, not empty base") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-cdc-crash").toString
    val snapStr = s"$dir/snapshot"
    val input = MemoryStream[(Int, String, Long, String)]
    val df = input.toDF().toDF("k", "payload", "seq", "op")

    input.addData((1, "a", 1L, "upsert"), (2, "b", 1L, "upsert"))
    val q1 = Incremental.cdcToSnapshot(df, Seq("k"), Seq(col("seq")),
      col("op"), Seq("payload"), snapStr, s"$dir/ckpt").start()
    q1.awaitTermination(60000)

    // simulate the worst crash window: the snapshot was renamed aside to
    // __backup but the staging→snap rename never happened — on disk there
    // is NO readable snapshot, only the backup
    val snap = new org.apache.hadoop.fs.Path(snapStr)
    val backup = new org.apache.hadoop.fs.Path(snapStr + "__backup")
    val fs = snap.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(snap, backup) && !fs.exists(snap))

    // next batch must restore the backup and merge against it — the
    // pre-fix behavior merged against an EMPTY base, silently losing k=1,2
    input.addData((3, "c", 1L, "upsert"))
    val q2 = Incremental.cdcToSnapshot(df, Seq("k"), Seq(col("seq")),
      col("op"), Seq("payload"), snapStr, s"$dir/ckpt").start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(snapStr).collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq ==
      Seq((1, "a"), (2, "b"), (3, "c")))
    assert(!fs.exists(backup), "completed swap must clear the backup")
  }

  test("sessionize: inactivity gap closes sessions via event-time timeout state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .as[Incremental.SessionEvent]
    val sessions = Incremental.sessionize(events, gapMs = 10 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: two bursts 30 min apart (two sessions); user 2: one event
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:05:00"), 2.0),
        (1L, ts("2024-01-01 10:35:00"), 4.0),
        (2L, ts("2024-01-01 10:01:00"), 8.0))
      q.processAllAvailable()
      // advance the watermark far past every open session's gap so the
      // event-time timeouts fire and the remaining sessions close
      input.addData((99L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      input.addData((99L, ts("2024-01-01 14:00:00"), 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
        .toSet
      val t0 = ts("2024-01-01 10:00:00").getTime
      val t3 = ts("2024-01-01 10:35:00").getTime
      val t2 = ts("2024-01-01 10:01:00").getTime
      assert(got.contains((1L, t0, 2L, 3.0)))   // first burst: 2 events, sum 3
      assert(got.contains((1L, t3, 1L, 4.0)))   // second burst
      assert(got.contains((2L, t2, 1L, 8.0)))
    } finally q.stop()
  }

  test("intervalJoin: stream-stream match within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[(String, Timestamp)]
    val imps = MemoryStream[(String, Timestamp)]
    val joined = Incremental.intervalJoin(
      clicks.toDF().toDF("ad", "click_ts"),
      imps.toDF().toDF("ad", "imp_ts"),
      key = "ad", leftTs = "click_ts", rightTs = "imp_ts",
      lateness = "1 hour", lowerBound = "10 minutes", upperBound = "0 seconds")
    val q = joined.writeStream.format("memory").queryName("clicks_imps")
      .outputMode("append").start()
    try {
      imps.addData(("a", ts("2024-01-01 10:00:00")), ("b", ts("2024-01-01 09:00:00")))
      clicks.addData(("a", ts("2024-01-01 10:05:00")), ("b", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val got = spark.table("clicks_imps").select("ad").collect().map(_.getString(0)).toSeq
      // a's impression is 5 min before the click (inside the 10-min bound);
      // b's is 65 min before (outside) — no match
      assert(got == Seq("a"))
    } finally q.stop()
  }
}
