package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2 collapses runs into intervals with open current version") {
    val obs = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, 2L, ts("2024-01-02 00:00:00"), "A"),
      (1L, 3L, ts("2024-01-03 00:00:00"), "B"),
      (1L, 4L, ts("2024-01-04 00:00:00"), "B"),
      (1L, 5L, ts("2024-01-05 00:00:00"), "A"),
      (2L, 6L, ts("2024-01-01 00:00:00"), "X")
    ).toDF("user_id", "event_id", "ts", "state")
    val out = Relational.scd2(obs, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), Seq("state"))
      .orderBy("user_id", "version")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5)))
    assert(out.toSeq == Seq(
      (1L, "A", 1L, ts("2024-01-01 00:00:00"), Some(ts("2024-01-03 00:00:00")), 2L),
      (1L, "B", 2L, ts("2024-01-03 00:00:00"), Some(ts("2024-01-05 00:00:00")), 2L),
      (1L, "A", 3L, ts("2024-01-05 00:00:00"), None, 1L),
      (2L, "X", 1L, ts("2024-01-01 00:00:00"), None, 1L)))
  }

  test("scd2 change detection is null-safe") {
    val obs = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), Option.empty[String]),
      (1L, 2L, ts("2024-01-02 00:00:00"), Option.empty[String]),
      (1L, 3L, ts("2024-01-03 00:00:00"), Some("A"))
    ).toDF("user_id", "event_id", "ts", "state")
    val out = Relational.scd2(obs, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), Seq("state"))
      .orderBy("version").collect()
    // null==null is NOT a change: two versions, not three
    assert(out.length == 2)
    assert(out(0).getLong(5) == 2L) // null run has both observations
  }

  test("scd2 plans a single exchange for all four windows") {
    val obs = Seq((1L, 1L, ts("2024-01-01 00:00:00"), "A"))
      .toDF("user_id", "event_id", "ts", "state")
    val plan = Relational.scd2(obs, Seq("user_id"), col("ts"),
      Seq(col("ts"), col("event_id")), Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("profile: one row per column, correct nulls/distinct/min/max") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (Some(2), Some("c")), (None, Some("a"))
    ).toDF("num", "str")
    val out = Profile.profile(df, Seq("num", "str"), k = 16)
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("num", 4L, 1L, 2L, "1", "2"),
      ("str", 4L, 1L, 2L, "a", "c")))
  }

  test("profile is a single job with a single scan") {
    val df = (1 to 100).map(i => (i, s"s$i")).toDF("a", "b")
    val prof = Profile.profile(df, Seq("a", "b"), k = 16)
    val plan = prof.queryExecution.executedPlan.toString
    // one LocalTableScan/scan feeding one aggregate pair — no unions of
    // per-column subplans
    assert(!plan.contains("Union"), s"per-column union in plan:\n$plan")
    assert(prof.count() == 2)
  }
}
