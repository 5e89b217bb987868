package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("vocabulary ranks by (count desc, token asc) and cuts at size") {
    val df = Seq("b b b a a c", "a c c", "d").toDF("text")
    val v = Corpus.vocabulary(df, "text", 3).as[(String, Long)].collect().toSeq
    // counts: a=3 b=3 c=3 d=1; tie broken alphabetically
    assert(v == Seq(("a", 3L), ("b", 3L), ("c", 3L)))
  }

  test("vocabOov counts duplicate OOV tokens and handles empty text") {
    val df = Seq((1L, "a a b zzz zzz"), (2L, ""), (3L, "a b")).toDF("id", "text")
    val got = Corpus.vocabOov(df, "id", "text", 2)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    // vocab = {a, b}; doc 1 has 2 OOV occurrences of zzz out of 5 tokens
    assert(got == Seq((1L, 5L, 2L, 0.4), (2L, 0L, 0L, 0.0), (3L, 2L, 0L, 0.0)))
  }

  test("qualityGate drops the bottom fraction per group, not globally") {
    // grp x scores 1..10, grp y scores 101..110: a global 30% cut would
    // remove all of x's low end; the per-group gate removes 3 from EACH.
    val rows = (1 to 10).map(i => ("x", i.toLong, i.toDouble)) ++
      (1 to 10).map(i => ("y", i.toLong + 100, i.toDouble + 100))
    val df = rows.toDF("src", "id", "score")
    val kept = Corpus.qualityGate(df, "id", "src", col("score"), 0.3)
      .orderBy("id").as[(String, Long, Double)].collect().toSeq
    assert(kept.map(_._2) == ((4L to 10L) ++ (104L to 110L)).toSeq)
    assert(!kept.map(_._1).contains("__cd"))
  }

  test("leakageSafeSplit sends a whole dup cluster to one split; singletons key by own id") {
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster_id")
    val got = Corpus.leakageSafeSplit(docs, "doc_id", clusters, 90, 5)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = rows.map(r => r._1 -> r._3).toMap
    // all three cluster members share one split label
    assert(Set(byId(1L), byId(2L), byId(3L)).size == 1)
    // the singleton keys by its own id
    assert(rows.find(_._1 == 9L).get._2 == 9L)
  }

  test("dupSourceMatrix normalizes pair order and counts per source pair") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val meta = Seq((1L, "web"), (2L, "books"), (3L, "books"), (4L, "web"),
      (5L, "web"), (6L, "web")).toDF("doc_id", "source")
    val got = Corpus.dupSourceMatrix(pairs, meta, "doc_id", "source")
      .orderBy("src_lo", "src_hi")
      .as[(String, String, Long)].collect().toSeq
    // (web,books) and (books,web) collapse into one unordered cell
    assert(got == Seq(("books", "web", 2L), ("web", "web", 1L)))
  }

  test("qualityGate keeps a single-row group and ties break by id") {
    val df = Seq(("solo", 1L, 5.0), ("t", 2L, 1.0), ("t", 3L, 1.0),
      ("t", 4L, 1.0)).toDF("src", "id", "score")
    val kept = Corpus.qualityGate(df, "id", "src", col("score"), 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    // solo: cume_dist 1 > 0.5 keeps it; ties in t ordered by id → ids 3,4 survive
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("vocabOov production-V path: broadcast anti-join, values ≡ the literal path") {
    // tokens tok0..tok599 with frequency descending by index; V = 50k
    // (> every distinct token, and far past the IN-list threshold)
    val docs = (1L to 40L).map { id =>
      val body = (0 until 30).map(j => s"tok${(id * 7 + j * 13) % 600}")
        .mkString(" ")
      (id, body + (if (id % 4 == 0) " zz" + id else ""))
    }.toDF("id", "text")
    val broadcastPath = Corpus.vocabOov(docs, "id", "text", 50000)
    // plan pin: the OOV side must be a broadcast join, not a 50k-term
    // IN-list literal bloating the plan
    val plan = broadcastPath.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
    // value parity with the literal path at the same V
    val lit = Corpus.vocabOov(docs, "id", "text", 50000,
        inListThreshold = Int.MaxValue)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    val bc = broadcastPath.orderBy("id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(bc == lit)
    // and the rare-token OOV semantics hold: with V = 5 most tokens are OOV
    val small = Corpus.vocabOov(docs, "id", "text", 5, inListThreshold = 0)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    val smallLit = Corpus.vocabOov(docs, "id", "text", 5)
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(small == smallLit)
  }

  test("leakageSafeSplit guards reserved output names and idCol = 'id'") {
    // idCol literally named "id" must not collide with the clusters side
    val docs = Seq(1L, 2L, 9L).toDF("id")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id")
    val got = Corpus.leakageSafeSplit(docs, "id", clusters, 90, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.length == 3)
    assert(Set(got.find(_._1 == 1L).get._3, got.find(_._1 == 2L).get._3).size == 1)
    assert(got.find(_._1 == 9L).get._2 == 9L)
    // a docs frame whose idCol collides with an output name fails fast
    val bad = Seq(1L).toDF("cluster_id")
    val e = intercept[IllegalArgumentException] {
      Corpus.leakageSafeSplit(bad, "cluster_id", clusters, 90, 5)
    }
    assert(e.getMessage.contains("leakageSafeSplit"), e.getMessage)
  }
}
