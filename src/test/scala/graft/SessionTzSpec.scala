package graft

import graft.SparkSpec

/** Session-timezone hardening (SURVEY §7.4 names America/Sao_Paulo as a
  * hard part): the lake's event-time columns are TIMESTAMP_NTZ carrying
  * UTC wall-clock, and a `cast("timestamp")` interprets NTZ in the
  * SESSION timezone — so a user session running under America/Sao_Paulo
  * would silently shift every event-time instant by -03:00 unless the
  * engine pins the interpretation. Policy (COVERAGE.md): queries that
  * cast lake NTZ event time pin the session TZ to UTC for the cast
  * (`Queries.withUtcEventTime`); everything downstream of the cast is
  * shift-invariant or operates on epoch longs. These specs EXECUTE the
  * streaming parity queries under America/Sao_Paulo and assert output
  * identical to the UTC run — the driver's oracle comparison in a
  * different timezone would otherwise hash-mismatch.
  */
class SessionTzSpec extends SparkSpec {

  private def runWithTz(name: String, tz: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try SparkEntry.queries(name)(spark, sfDir).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  private def assertTzInvariant(name: String): Unit = {
    val utc = runWithTz(name, "UTC")
    val sp = runWithTz(name, "America/Sao_Paulo")
    assert(utc.nonEmpty, s"$name produced no rows")
    assert(utc == sp,
      s"$name output depends on the session timezone: first diff at index " +
        utc.zip(sp).indexWhere { case (a, b) => a != b })
  }

  test("q112 streaming sessionize: identical session epochs under " +
    "America/Sao_Paulo (NTZ cast pinned to UTC by the engine)") {
    assertTzInvariant("q112_stream_sessionize")
  }

  test("q113 stream-stream interval join: identical matches under " +
    "America/Sao_Paulo") {
    assertTzInvariant("q113_stream_interval_join")
  }

  test("q114 stream CDC merge: identical final snapshot under " +
    "America/Sao_Paulo") {
    assertTzInvariant("q114_stream_cdc")
  }

  test("q49 batch sessionize: identical sessions under America/Sao_Paulo") {
    assertTzInvariant("q49_sessionize")
  }
}
