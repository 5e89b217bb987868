package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.json4s._

import graft.SparkSpec
import graft.flows.Ingest
import graft.operators.Relational

/** END-TO-END minhasaude flow: the reference's Mongo pipeline shape run
  * whole over the REAL wire — SCRAM-authenticated, zlib-compressed OP_MSG
  * conversation → sliced extraction with buffered flushes →
  * `Ingest.landJsonPayload` distributed landing → Spark reading the
  * landed table back, flattening the payload, deduping the deliberate
  * slice-boundary overlaps, and reconciling against the source
  * collection. Each stage is spec'd in isolation elsewhere; this pins
  * that they COMPOSE.
  */
class MongoFlowSpec extends SparkSpec {

  private def doc(id: Int, v: Long): JObject = JObject(List(
    "_id" -> JString(f"pat$id%05d"), "val" -> JLong(v),
    "cpf" -> JString(f"$id%011d"),
    "payload" -> JObject(List("n" -> JInt(id)))))

  test("topology discovery + auth + compression + sliced extraction + " +
    "landing + query, whole chain") {
    val store = (0 until 180).map(i => doc(i, (i / 2).toLong))
    // the conn-string's seed list names only a SECONDARY — the flow must
    // discover the primary by hello, like the reference's driver does
    val pri = new FakeMongo(store, credentials = Some("svc" -> "s3cr3t"))
    val srv = pri // counters asserted below live on the primary
    val sec = new FakeMongo(Nil, role0 = "secondary",
      primaryHint = () => Some(s"localhost:${pri.server.getLocalPort}"))
    val cli = MongoWireClient.connectPrimary(
      Seq(("localhost", sec.server.getLocalPort)), backoff = _ => ())
    val dir = java.nio.file.Files.createTempDirectory("mongoflow")
      .toString + "/t"
    try {
      // 1. the full wire conversation on the DISCOVERED primary: zlib
      // negotiated, SCRAM authed
      cli.hello(requestCompression = true)
      cli.authenticate("svc", "s3cr3t", clientNonce = Some("CNONCE-FLOW"))

      // 2. sliced extraction over compressed frames; flushes accumulate
      // into the day's landing batch (boundary docs arrive twice — the
      // reference's overlapping-slice semantics, deduped downstream)
      val rows = scala.collection.mutable.ArrayBuffer.empty[String]
      val results = MongoSliceReader.extractAll(cli, "db", "coll",
        baseQuery = None, sliceVar = "val", sliceSize = 30,
        flush = batch => rows ++= batch,
        batchSize = 32, flushThreshold = 64)
      assert(results.map(_.sent).sum >= 180) // boundary overlaps included
      assert(srv.compressedIn.get() > 0, "extraction must ride OP_COMPRESSED")
      Relational.reconcileCount(results.map(_.sent).sum,
        cli.count("db", "coll", JObject()), tolerance = 0.05)

      // 3. distributed landing: payload packed beside source metadata
      import spark.implicits._
      Ingest.landJsonPayload(
        spark.read.json(rows.toSeq.toDS()),
        payloadCols = Seq("_id", "val", "cpf", "payload"),
        metadata = Map("_source" -> lit("minhasaude")),
        targetDate = "2026-08-14",
        stamp = Ingest.RunStamp("run-ms",
          Timestamp.valueOf("2026-08-14 05:00:00")),
        path = dir)

      // 4. read back partition-pruned, flatten the JSON payload, dedup
      // the boundary overlaps by id — exactly the collection again
      val landed = spark.read.parquet(dir)
        .filter(col("data_particao") === "2026-08-14")
      val flat = landed.select(
          get_json_object(col("data"), "$._id").as("id"),
          get_json_object(col("data"), "$.val").cast("long").as("v"),
          get_json_object(col("data"), "$.payload.n").cast("int").as("n"))
        .dropDuplicates("id")
      assert(flat.count() == 180)
      assert(flat.filter(col("id").startsWith("pat")).count() == 180)
      assert(flat.agg(sum(col("n"))).head().getLong(0) == (0 until 180).sum)
      assert(flat.agg(max(col("v"))).head().getLong(0) == 89L)
    } finally {
      // nested: a throwing close() must not leak the two listeners (and
      // their accept threads) into the rest of the JVM-wide suite run
      try cli.close()
      finally { try srv.stop() finally sec.stop() }
    }
  }
}
