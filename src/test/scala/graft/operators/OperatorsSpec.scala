package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.TextFunctions

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("remaining = candidates − done (anti join); None ledger = all pending") {
    val cand = Seq(1, 2, 3, 4).toDF("k")
    val done = Seq(2, 4).toDF("k")
    assert(Relational.remaining(cand, Some(done), Seq("k"))
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3))
    assert(Relational.remaining(cand, None, Seq("k")).count() == 4)
  }

  test("bandJoin matches inclusive ranges and broadcasts the interval side") {
    val rows = Seq(1, 10, 11, 25, 26, 99).toDF("v")
    val ranges = Seq(("a", 1, 10), ("b", 11, 25)).toDF("band", "lo", "hi")
    val joined = Relational.bandJoin(rows, ranges, col("v"), "lo", "hi")
    assert(joined.count() == 4) // 26 and 99 match nothing
    // AQE finalizes the physical plan only after execution
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      joined.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("unionAll tolerates schema drift (missing columns → null)") {
    val a = Seq((1, "x")).toDF("id", "a")
    val b = Seq((2, "y")).toDF("id", "b")
    val u = Relational.unionAll(Seq(a, b))
    assert(u.columns.toSet == Set("id", "a", "b"))
    assert(u.count() == 2)
  }

  test("schemaDrift reports missing/extra") {
    val df = Seq((1, "x")).toDF("id", "extra")
    assert(Relational.schemaDrift(df, Seq("id", "wanted")) ==
      (Set("wanted"), Set("extra")))
  }

  test("surrogateKey distinguishes null from empty and is deterministic") {
    val df = Seq((Some(""), "a"), (None, "a")).toDF("x", "y")
      .select(Relational.surrogateKey(Seq(col("x"), col("y"))).as("k"))
    val ks = df.collect().map(_.getString(0))
    assert(ks(0) != ks(1))
  }

  test("reconcileCount enforces tolerance") {
    Relational.reconcileCount(95, 100, 0.05)
    assertThrows[IllegalArgumentException](Relational.reconcileCount(94, 100, 0.05))
    Relational.reconcileCount(0, 0)
  }

  test("asOfJoin: latest right ≤ left per key, inclusive ties, null before first") {
    val left = Seq((1, 5, "e1"), (1, 10, "e2"), (1, 2, "e0"), (2, 7, "f1"))
      .toDF("k", "ts", "ev")
    val right = Seq((1, 5, "cpA"), (1, 8, "cpB"), (2, 9, "cpC"))
      .toDF("k", "cp_ts", "cp")
    val r = Relational.asOfJoin(left, right, Seq("k"), "ts", "cp_ts", Seq("cp"))
      .select(col("ev"), col("cp")).collect()
      .map(x => (x.getString(0), Option(x.getString(1)))).toMap
    assert(r == Map(
      "e0" -> None,        // before any checkpoint
      "e1" -> Some("cpA"), // tie at ts=5 is inclusive
      "e2" -> Some("cpB"), // latest ≤ 10
      "f1" -> None))       // key 2's checkpoint is later
  }

  test("rateRollup emits per-group rows plus a grand-total row") {
    val df = Seq(("a", 10.0), ("a", 200.0), ("b", 300.0)).toDF("g", "v")
    val r = Relational.rateRollup(df, "g", Map("high" -> (col("v") > 100)))
      .collect().map(row => (Option(row.getString(0)), row.getDouble(1), row.getLong(2)))
      .toSeq.sortBy(_._1)
    assert(r == Seq((None, 2.0 / 3, 3L), (Some("a"), 0.5, 2L), (Some("b"), 1.0, 1L)))
  }
}

class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("row-size guard flags and drops oversized rows") {
    val df = Seq(("a", "x" * 2000), ("b", "y")).toDF("id", "payload")
    assert(Relational.oversizedRows(df, 1000).collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(Relational.dropOversizedRows(df, 1000).collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("schema adequacy is the matched fraction") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Relational.schemaAdequacy(df, Seq("a", "b", "c", "d")) == 0.5)
    assert(Relational.schemaAdequacy(df, Nil) == 1.0)
  }

  test("control-char strip and TO_CHAR header surgery") {
    import graft.functions.TextFunctions
    val df = Seq(("ab\u0000cd\u0001", "TO_CHAR(CO_CNES) ,NOME")).toDF("s", "h")
      .select(TextFunctions.stripControlChars(col("s")).as("s"),
        TextFunctions.stripFunctionWrapper(col("h")).as("h"))
    val r = df.collect().head
    assert(r.getString(0) == "abcd")
    assert(r.getString(1) == "CO_CNES ,NOME")
  }

  test("inferSchema recovers nested JSON structure from a sample") {
    val df = Seq("""{"a": 1, "b": {"c": "x"}, "d": [1,2]}""").toDF("data")
    val schema = JsonNormalize.inferSchema(df, "data")
    assert(schema.fieldNames.sorted.toSeq == Seq("a", "b", "d"))
    val back = JsonNormalize.unpack(df, "data", schema)
    assert(back.select("b.c").head.getString(0) == "x")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey keeps exactly the max-order row per key") {
    val df = Seq((1, 1, "old"), (1, 3, "new"), (1, 2, "mid"), (2, 5, "only"))
      .toDF("k", "v", "tag")
    val r = Dedup.latestPerKey(df, Seq("k"), Seq(col("v")))
      .collect().map(x => (x.getInt(0), x.getString(2))).sorted.toSeq
    assert(r == Seq((1, "new"), (2, "only")))
  }

  test("decontaminate drops docs sharing any n-gram with the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here now"),   // clean
      (3L, "we saw the quick brown fox yesterday evening"),   // shares 3-gram
      (4L, "short text")                                      // too short, clean
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a quick brown fox appeared")).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(corpus, eval, "doc_id", "text", 3)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(clean == Seq(2L, 4L))
  }

  test("crossDocBoilerplate flags windows shared across docs, not within-doc repeats") {
    val template = "copyright acme corp all rights reserved"  // 6 tokens
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta $template"),
      (2L, s"one two three four five six seven $template"),
      (3L, s"red orange yellow green blue indigo violet $template"),
      // within-doc repetition but NOTHING shared with other docs
      (4L, "spam spam spam spam spam spam spam spam spam spam spam"),
      (5L, "tiny")                                             // < 6 tokens
    ).toDF("doc_id", "text")
    val r = Dedup.crossDocBoilerplate(corpus, "doc_id", "text", n = 6, minDocs = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getDouble(3))).sortBy(_._1).toSeq
    val byId = r.map(x => x._1 -> x).toMap
    // docs 1-3: 13 tokens → 8 windows; exactly 1 (the template) recurs in 3 docs
    assert(Seq(1L, 2L, 3L).forall(id => byId(id)._2 == 8L && byId(id)._3 == 1L))
    // doc 4: all windows identical WITHIN the doc, but only 1 distinct doc
    // carries them → not boilerplate
    assert(byId(4L)._3 == 0L)
    // doc 5: no windows, ratio 0, present in output (left join, not dropped)
    assert(byId(5L) == ((5L, 0L, 0L, 0.0)))
  }

  test("stripBoilerplate removes only the covered tokens, keeps the rest verbatim") {
    val template = "copyright acme corp all rights reserved"  // 6 tokens
    val corpus = Seq(
      (1L, s"alpha beta gamma delta epsilon zeta eta $template"),
      (2L, s"one two three four five six seven $template"),
      (3L, s"red orange yellow green blue indigo violet $template"),
      (4L, "spam spam spam spam spam spam spam spam spam spam spam"),
      (5L, "tiny")
    ).toDF("doc_id", "text")
    val r = Dedup.stripBoilerplate(corpus, "doc_id", "text", n = 6, minDocs = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3))).sortBy(_._1).toSeq
    val byId = r.map(x => x._1 -> x).toMap
    // the exact template window recurs in docs 1-3 → its 6 tokens go; the
    // unique prefixes (7 tokens) survive untouched
    assert(byId(1L) == ((1L, 13L, 7L, "alpha beta gamma delta epsilon zeta eta")))
    assert(byId(2L) == ((2L, 13L, 7L, "one two three four five six seven")))
    assert(byId(3L) == ((3L, 13L, 7L, "red orange yellow green blue indigo violet")))
    // within-doc repetition is NOT cross-doc boilerplate → untouched
    assert(byId(4L)._3 == 11L)
    // short doc: no windows, passes through whole
    assert(byId(5L) == ((5L, 1L, 1L, "tiny")))
  }

  test("exactDedup keeps the lowest id per normalized content") {
    val df = Seq((3L, "Hello,  World"), (1L, "hello world"), (2L, "unrelated"))
      .toDF("id", "text")
    val kept = Dedup.exactDedup(df, "id", "text").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L))
    val groups = Dedup.exactDupGroups(df, "id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.exists { case (_, canon, n) => canon == 1L && n == 2L })
  }

  test("sessionize: gap over threshold starts a new session, per key") {
    val df = Seq(
      ("u1", 1L, "2024-01-01 10:00:00"),
      ("u1", 2L, "2024-01-01 10:10:00"),  // 10 min — same session
      ("u1", 3L, "2024-01-01 11:00:00"),  // 50 min — new session
      ("u2", 4L, "2024-01-01 10:00:00")
    ).toDF("user", "id", "t").withColumn("ts", col("t").cast("timestamp"))
    val r = Relational.sessionize(df, Seq("user"), col("ts"),
        Seq(col("ts"), col("id")), gapSeconds = 1800L)
      .select("user", "id", "session_id").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).sorted.toSeq
    assert(r == Seq(("u1", 1L, 0L), ("u1", 2L, 0L), ("u1", 3L, 1L), ("u2", 4L, 0L)))
  }

  test("sessionize tolerates TIMESTAMP_NTZ event-time columns") {
    // parquet written by engines that don't stamp a zone (DuckDB, pandas)
    // surfaces as TIMESTAMP_NTZ, which unix_micros rejects outright — the
    // operator must cast, not crash, and gaps are zone-invariant
    val df = Seq(
      ("u1", 1L, "2024-01-01 10:00:00"),
      ("u1", 2L, "2024-01-01 11:00:00")
    ).toDF("user", "id", "t")
      .withColumn("ts", col("t").cast("timestamp_ntz"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val r = Relational.sessionize(df, Seq("user"), col("ts"),
        Seq(col("ts"), col("id")), gapSeconds = 1800L)
      .select("id", "session_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r == Seq((1L, 0L), (2L, 1L)))
  }

  test("rebalanceMixture hits target proportions without upsampling") {
    // 1000/600/200 rows; targets 50/30/20 → bottleneck is c (200/0.2 = 1000
    // feasible total), so keep 500/300/200 in expectation and c keeps ALL
    val df = ((1L to 1000L).map(i => (i, "a")) ++
      (2001L to 2600L).map(i => (i, "b")) ++
      (3001L to 3200L).map(i => (i, "c")) ++
      (4001L to 4100L).map(i => (i, "dropme"))).toDF("k", "src")
    val targets = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val out = Relational.rebalanceMixture(df, "src", col("k"), targets)
    val bysrc = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bysrc.contains("dropme"))
    assert(bysrc("c") == 200L)                     // bottleneck keeps 100%
    assert(bysrc("a") > 400 && bysrc("a") < 600)   // ~500 by md5 bucket
    assert(bysrc("b") > 230 && bysrc("b") < 370)   // ~300
    // deterministic: same rows on replay and under repartitioning
    val again = Relational.rebalanceMixture(df.repartition(7), "src",
      col("k"), targets).collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.collect().map(_.getLong(0)).sorted.toSeq)
    // guards: weights must sum to 1; unknown source must fail loud
    assertThrows[IllegalArgumentException] {
      Relational.rebalanceMixture(df, "src", col("k"), Map("a" -> 0.5))
    }
    assertThrows[IllegalArgumentException] {
      Relational.rebalanceMixture(df, "src", col("k"),
        Map("a" -> 0.5, "nosuch" -> 0.5))
    }
  }

  test("hashSample is deterministic, stratified, and repartition-stable") {
    val df = (1L to 2000L).map(i => (i, if (i % 4 == 0) "keep" else "thin"))
      .toDF("k", "stratum")
    val pct = when(col("stratum") === "keep", lit(50L)).otherwise(lit(5L))
    val s1 = Relational.hashSample(df, col("k"), pct).collect().map(_.getLong(0)).sorted
    val s2 = Relational.hashSample(df.repartition(7), col("k"), pct)
      .collect().map(_.getLong(0)).sorted
    assert(s1.toSeq == s2.toSeq) // verdict depends only on the key
    val byStratum = Relational.hashSample(df, col("k"), pct)
      .groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 500 keep-rows at ~50%, 1500 thin-rows at ~5%
    assert(byStratum("keep") > 180 && byStratum("keep") < 320)
    assert(byStratum("thin") > 30 && byStratum("thin") < 140)
  }

  test("minHash LSH surfaces a genuine near-duplicate pair") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "changed")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatePairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.8 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("portable minHash agrees with the fast path on pair recall") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok30", "changed")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidatePairsPortable(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j > 0.8 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("pruned arrival reads: row-identical to the full-scan join over a " +
    "stored layout index, the probe-budget fallback included; the " +
    "state-size dial picks full-scan under the crossover, pruned past it") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val stored = (1L to 20L).map(i => (i, s"$base tail$i"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, s"$base fresh"), (101L, "entirely other words"))
      .toDF("doc_id", "text")
    val (sh0, sb0) = Dedup.minHashIndexPortable(stored, "doc_id", "text")
    // the stored layout frames, as a lake read would carry them
    val sh = sh0.withColumn(Dedup.IdLayoutCol, Dedup.idLayoutCol())
    val sb = sb0.withColumn(Dedup.BandLayoutCol, Dedup.bandLayoutCol())
    val (nh, nb) = Dedup.minHashIndexPortable(batch, "doc_id", "text")
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP))).toSet
      val full = rows(Dedup.minHashIncrementalPairsFromIndexes(
        sh, sb, nh, nb))
      val pruned = rows(Dedup.minHashIncrementalPairsPruned(sh, sb, nh, nb))
      assert(pruned == full, "pruned reads must not move a single pair")
      // probe budget exceeded -> the bounded fallback, still identical
      val fallback = rows(Dedup.minHashIncrementalPairsPruned(
        sh, sb, nh, nb, maxProbeKeys = 1))
      assert(fallback == full)
      assert(full.nonEmpty, "fixture must produce pairs for the pin to bite")
      // the dial: tiny stored state reads full-scan; forcing minBytes = 0
      // picks the pruned path; bare frames (no layout) never prune
      assert(!Dedup.pruneStoredReads(sh, sb))
      assert(Dedup.pruneStoredReads(sh, sb, minBytes = 0))
      assert(!Dedup.pruneStoredReads(sh0, sb0, minBytes = 0))
    } finally {
      sh0.unpersist(); sb0.unpersist(); nh.unpersist(); nb.unpersist(); ()
    }
  }

  test("simHash near-dups found within hamming budget") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val df = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDups(df, "doc_id", "text", maxHamming = 8)
    assert(pairs.count() == 1)
  }

  test("duplicateClusters: chains merge transitively, min id labels") {
    // components: {1,2,3,4} via chain, {10,11}; 99 is a singleton (absent)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val r = Dedup.duplicateClusters(pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(r == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("duplicateClusters distributed path matches union-find path") {
    // unionFindMaxEdges = 0 forces the pointer-jumping path; reversed and
    // duplicate pairs must not change the clustering
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (1L, 2L), (4L, 3L))
      .toDF("id_a", "id_b")
    val dist = Dedup.duplicateClusters(pairs, unionFindMaxEdges = 0L).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    val uf = Dedup.duplicateClusters(pairs).collect()
      .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(dist == uf)
    assert(dist == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("duplicateClusters: 300-node chain converges in O(log d) rounds") {
    // a 300-edge chain has diameter 300 — linear label propagation needs 300
    // rounds; pointer jumping must close it well inside maxIters = 25
    val pairs = (1L until 300L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val r = Dedup.duplicateClusters(pairs, maxIters = 25, unionFindMaxEdges = 0L)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r.length == 300)
    assert(r.forall(_._2 == 1L))
  }

  test("portable simHash finds near-dups within hamming budget") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val df = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDupsPortable(df, "doc_id", "text", maxHamming = 8)
    assert(pairs.count() == 1)
    // portable signatures only carry 60 signal bits
    val sims = Dedup.simHashSignaturesPortable(df, "doc_id", "text")
      .collect().map(_.getLong(1))
    assert(sims.forall(s => (s >>> 60) == 0L))
  }

  test("cosineNearDupPairs: near-identical vectors pair up, orthogonal don't") {
    val v1 = Seq(1.0f, 0.0f, 0.0f, 0.1f)
    val v2 = Seq(0.99f, 0.01f, 0.0f, 0.1f)  // cosine ≈ 1 with v1, same bucket
    val v3 = Seq(0.0f, 1.0f, 0.0f, 0.0f)    // orthogonal to both
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("id", "vec")
    val pairs = Dedup.cosineNearDupPairs(df, "id", "vec", dim = 4,
      threshold = 0.95, numPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("cosineNearDupPairsBounded: identical to the unbounded scheme when " +
    "no bucket is oversized; a hot bucket splits, exact-dup recall holds") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // 120 vectors sharing a dominant direction (one hot bucket) + their
    // exact duplicates; plus 40 scattered vectors
    val dom = Array.fill(8)(1.0 + rng.nextGaussian() * 0.01)
    def near(i: Int) = dom.map(x => x + rng.nextGaussian() * 0.001)
    val hot = (0 until 120).flatMap { i =>
      val v = near(i)
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, v.toSeq)) // exact dup
    }
    val cold = (1000 until 1040).map(i =>
      (i.toLong, Array.fill(8)(rng.nextGaussian()).toSeq))
    val df = (hot ++ cold).toDF("vec_id", "embedding")
    def pairs(got: org.apache.spark.sql.DataFrame) = got
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap high enough that nothing splits → EXACTLY the base candidates
    val baseline = pairs(Dedup.cosineNearDupPairs(df, "vec_id", "embedding",
      dim = 8, threshold = 0.9, numPlanes = 4))
    val unsplit = pairs(Dedup.cosineNearDupPairsBounded(df, "vec_id",
      "embedding", dim = 8, threshold = 0.9, maxBucketSize = 100000,
      numPlanes = 4, extraPlanes = 3))
    assert(unsplit == baseline)
    // the split metric is observable: no bucket split under the high cap
    assert(Dedup.lastOversizedBucketSplits == 0L)
    // cap of 40 forces the hot bucket to split: every exact-dup mate pair
    // still surfaces (identical vectors share every extra-plane bit)
    val bounded = Dedup.cosineNearDupPairsBounded(df, "vec_id", "embedding",
      dim = 8, threshold = 0.9, maxBucketSize = 40,
      numPlanes = 4, extraPlanes = 3)
    val boundedPairs = pairs(bounded)
    // ...and under the tight cap the hot bucket's split is REPORTED, so
    // the dense-bucket recall trade-off is never silent
    assert(Dedup.lastOversizedBucketSplits >= 1L)
    val matePairs = (0 until 120).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(matePairs.subsetOf(boundedPairs),
      s"missing ${matePairs.diff(boundedPairs).size} exact-dup mates")
    // the candidate set genuinely shrank (a split bucket loses some
    // non-identical cross pairs — that is the occupancy/recall trade)
    assert(boundedPairs.size <= baseline.size)
    // and the pair step stays a hash equi-join, no cartesian
    val plan = bounded.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ngramJaccard: identical 1.0, disjoint 0.0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "x y z w")).toDF("a", "b")
      .select(Dedup.ngramJaccard(col("a"), col("b"), 2).as("j"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0))
  }
}

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def profile(df: org.apache.spark.sql.DataFrame, k: Int) =
    Dedup.substringDupProfile(df, "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))))
      .toMap

  private def strip(df: org.apache.spark.sql.DataFrame, k: Int,
      keepCanonical: Boolean) =
    Dedup.stripDuplicatedSpans(df, "doc_id", "text", k, keepCanonical)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("profile: a cross-doc shared k-gram covers exactly its window in " +
    "both docs; untouched docs report zeros") {
    val df = Seq(
      (1L, "a b c d e f"),   // "b c d" shared with doc 2 at pos 1
      (2L, "x b c d y"),
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val p = profile(df, 3)
    // (n_tokens, dup_windows, dup_spans, covered_tokens, coverage)
    assert(p(1L) == ((6L, 1L, 1L, 3L, 0.5)))
    assert(p(2L) == ((5L, 1L, 1L, 3L, 0.6)))
    assert(p(3L) == ((5L, 0L, 0L, 0L, 0.0)))
  }

  test("profile: overlapping duplicated windows merge into one span; " +
    "adjacent windows (gap == k) merge too; gap > k stays two spans") {
    val df = Seq(
      (3L, "p q r s"),    // dup 2-gram starts {0,1}: one span [0,2]
      (4L, "p q r t"),
      (7L, "u v w x"),    // dup starts {0,2}, gap == k: one span [0,3]
      (8L, "u v a w x")   // dup starts {0,3}, gap > k: [0,1] and [3,4]
    ).toDF("doc_id", "text")
    val p = profile(df, 2)
    assert(p(3L) == ((4L, 2L, 1L, 3L, 0.75)))
    assert(p(7L) == ((4L, 2L, 1L, 4L, 1.0)))
    assert(p(8L) == ((5L, 2L, 2L, 4L, 0.8)))
  }

  test("profile: a within-doc repeat is duplication (count >= 2 in one " +
    "doc); docs shorter than k never enter the census") {
    val df = Seq(
      (5L, "m n z m n"),  // "m n" at 0 and 3: two spans, 4 covered
      (6L, "q")
    ).toDF("doc_id", "text")
    val p = profile(df, 2)
    assert(p(5L) == ((5L, 2L, 2L, 4L, 0.8)))
    assert(p(6L) == ((1L, 0L, 0L, 0L, 0.0)))
  }

  test("census-pressure stats ride the run: occurrences, distinct grams " +
    "and >=2 survivors are observable after execution, at zero extra scans") {
    val df = Seq(
      (1L, "a b c d e f"),   // 4 k=3 gram starts
      (2L, "x b c d y"),     // 3 starts, shares "b c d" with doc 1
      (3L, "nothing shared here at all")  // 3 starts, all unique
    ).toDF("doc_id", "text")
    profile(df, 3) // the collect IS the action the observation rides
    // observation results land via an async listener a moment after the
    // action returns — poll briefly instead of asserting instantly
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var st = Dedup.lastSubstringCensusStats
    while (st.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(10); st = Dedup.lastSubstringCensusStats
    }
    // 10 gram occurrences corpus-wide; 9 distinct ("b c d" shared);
    // exactly 1 census row survives the >=2 filter
    assert(st.contains(Dedup.SubstringCensusStats(10L, 9L, 1L)))
  }

  test("strip keepCanonical: the min-(doc,pos) occurrence survives intact, " +
    "every other occurrence loses the span; within-doc repeats keep the " +
    "first; short docs pass through token-normalized") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "x  b c d  y"),    // doubled spaces: output normalizes
      (5L, "m n z m n"),
      (6L, "q")
    ).toDF("doc_id", "text")
    val s = strip(df, 3, keepCanonical = true)
    assert(s(1L) == ((6L, 0L, "a b c d e f"))) // canonical for "b c d"
    assert(s(2L) == ((5L, 3L, "x y")))
    val s2 = strip(df, 2, keepCanonical = true)
    assert(s2(5L) == ((5L, 2L, "m n z")))      // second "m n" stripped
    assert(s2(6L) == ((1L, 0L, "q")))
  }

  test("strip keepCanonical=false removes every occurrence, canonical " +
    "included; a fully-covered doc becomes the empty string") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "x b c d y"),
      (7L, "u v w x"),
      (8L, "u v w x")        // exact dup of 7: both fully covered
    ).toDF("doc_id", "text")
    val s = strip(df, 3, keepCanonical = false)
    assert(s(1L) == ((6L, 3L, "a e f")))
    assert(s(2L) == ((5L, 3L, "x y")))
    assert(s(7L) == ((4L, 4L, "")))
    assert(s(8L) == ((4L, 4L, "")))
  }

  test("a single-document corpus still dedups against itself: the " +
    "canonical first occurrence survives, the later repeat is spliced " +
    "out even when kept and removed spans touch") {
    val df = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    // k=3 grams: [a b c](0) [b c a](1) [c a b](2) [a b c](3) — only
    // "a b c" repeats; canonical (1,0), removable {3} → span [3,5]
    val p = profile(df, 3)
    assert(p(1L) == ((6L, 2L, 1L, 6L, 1.0))) // both starts merge: [0,5]
    val s = strip(df, 3, keepCanonical = true)
    assert(s(1L) == ((6L, 3L, "a b c")))
    val sAll = strip(df, 3, keepCanonical = false)
    assert(sAll(1L) == ((6L, 6L, "")))
  }

  test("NULL text reads as an empty document on both paths: zero counts, " +
    "empty rewrite — never size(NULL) = -1 or a NULL clean_text") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d"),
      (9L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val p = profile(df, 2)
    assert(p(9L) == ((0L, 0L, 0L, 0L, 0.0)))
    val s = strip(df, 2, keepCanonical = false)
    assert(s(9L) == ((0L, 0L, "")))
    assert(s(1L) == ((4L, 4L, ""))) // exact dups: both fully covered
  }

  test("canonical retention is WINDOW-level, not a corpus-wide text " +
    "guarantee: an overlapping other gram's removable span can take " +
    "tokens from a canonical window (the documented span semantics)") {
    val df = Seq((0L, "q r s"), (1L, "p q r s"), (2L, "p q r t"))
      .toDF("doc_id", "text")
    // k=3 dups: "p q r" canonical (1,0) removable (2,0); "q r s"
    // canonical (0,0) removable (1,1). Doc 1's removable span [1,3]
    // overlaps its CANONICAL "p q r" window [0,2] and takes q,r.
    val s = strip(df, 3, keepCanonical = true)
    assert(s(0L) == ((3L, 0L, "q r s")))
    assert(s(1L) == ((4L, 3L, "p")))
    assert(s(2L) == ((4L, 3L, "t")))
  }

  test("profile and strip agree: removed_tokens under keepCanonical=false " +
    "equals the profile's covered_tokens on the fixture corpus") {
    val docs = graft.sources.Lake.table(spark, sfDir, "documents")
      .filter(col("doc_id") < 120)
    val p = Dedup.substringDupProfile(docs, "doc_id", "text", 8)
      .select("doc_id", "covered_tokens").as[(Long, Long)].collect().toMap
    val s = Dedup.stripDuplicatedSpans(docs, "doc_id", "text", 8,
        keepCanonical = false)
      .select("doc_id", "removed_tokens").as[(Long, Long)].collect().toMap
    assert(p.keySet == s.keySet && p.nonEmpty)
    assert(p.forall { case (id, cov) => s(id) == cov })
    // and the canonical-keeping variant never removes MORE than strip-all
    val sc = Dedup.stripDuplicatedSpans(docs, "doc_id", "text", 8,
        keepCanonical = true)
      .select("doc_id", "removed_tokens").as[(Long, Long)].collect().toMap
    assert(sc.forall { case (id, rem) => rem <= p(id) })
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq(1.0f, 0f, 0f)),
    (2L, Seq(0.9f, 0.1f, 0f)),
    (3L, Seq(0f, 1.0f, 0f)),
    (4L, Seq(0f, 0f, 1.0f))).toDF("id", "vec")

  test("bruteForceTopK ranks the exact match first") {
    val r = Similarity.bruteForceTopK(corpus, "id", "vec", Seq(1.0f, 0f, 0f), 2)
      .collect().map(_.getLong(0)).toSeq
    assert(r == Seq(1L, 2L))
  }

  test("topKPerQuery returns k rows per query via window") {
    val qs = Seq((10L, Seq(1.0f, 0f, 0f)), (20L, Seq(0f, 1.0f, 0f)))
      .toDF("q_id", "q_vec")
    val r = Similarity.topKPerQuery(corpus, qs, "id", "vec", "q_id", "q_vec", 1)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(r == Seq((10L, 1L), (20L, 3L)))
  }

  test("annTopK finds the exact neighbor through its LSH bucket") {
    val r = Similarity.annTopK(corpus, "id", "vec", Seq(1.0f, 0f, 0f),
      k = 1, numPlanes = 4)
    assert(r.collect().head.getLong(0) == 1L)
  }

  test("annTopK ensureK=false composes lazily: no jobs at call time") {
    // A corpus whose vectors EXPLODE on evaluation: if annTopK ran any
    // Spark job at call time, building the result would throw. The lazy
    // path must return a plan untouched; forcing that plan then does throw,
    // proving the bomb was live and the call genuinely executed nothing.
    val bomb = udf { (x: Float) =>
      throw new RuntimeException("evaluated at call time"); x
    }
    val rigged = corpus.withColumn("vec",
      transform(col("vec"), e => bomb(e)))
    val lazyDf = Similarity.annTopK(rigged, "id", "vec", Seq(1.0f, 0f, 0f),
      k = 1, numPlanes = 4, ensureK = false) // must not run jobs
    val ex = intercept[Exception](lazyDf.collect())
    assert(ex.getMessage != null || ex.getCause != null)
  }

  test("annTopK eager path materializes at most k local rows") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val r = Similarity.annTopK(corpus, "id", "vec", Seq(1.0f, 0f, 0f),
      k = 2, numPlanes = 4, ensureK = true)
    // the escalation result is a bounded LOCAL relation (≤ k rows already
    // collected), not a live plan over the corpus
    assert(r.queryExecution.logical.isInstanceOf[LocalRelation] ||
      r.queryExecution.logical.collectLeaves().forall(_.isInstanceOf[LocalRelation]))
    assert(r.count() <= 2)
  }
}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val Q = graft.operators.Cluster.QuantScale.toLong // 2^20
  private def df4(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("two exact clusters per subspace: codebooks converge to the " +
    "vectors themselves, codes identify the cluster, ADC distances are " +
    "the exact quantized squared distances") {
    val a = Seq(1f, 1f, 0f, 0f); val b = Seq(0f, 0f, 1f, 1f)
    val df = df4(0L -> a, 1L -> b, 2L -> a, 3L -> b)
    val books = Similarity.pqFitCodebooks(df, "vec_id", "embedding",
      dims = 4, m = 2, k = 2, iters = 3)
    val bk = books.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(bk.size == 4) // dense m*k rows
    assert(bk((0L, 0L)) == Seq(Q, Q) && bk((0L, 1L)) == Seq(0L, 0L))
    assert(bk((1L, 0L)) == Seq(0L, 0L) && bk((1L, 1L)) == Seq(Q, Q))
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(0L) == Seq(0L, 0L) && codes(2L) == Seq(0L, 0L))
    assert(codes(1L) == Seq(1L, 1L) && codes(3L) == Seq(1L, 1L))
    val qq = Array(Q, Q, 0L, 0L) // query = vector a on the grid
    val top = Similarity.pqAdcTopK(
      Similarity.pqEncode(df, "vec_id", "embedding", books),
      "vec_id", books, qq, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // a-copies at distance 0 first, b-copies at exactly 4*Q^2
    assert(top == Seq((0L, 0L), (2L, 0L), (1L, 4 * Q * Q), (3L, 4 * Q * Q)))
  }

  test("an identical-vector corpus ties every assignment to cid 0; the " +
    "empty sub-cluster keeps its previous centroid and the codebook " +
    "stays dense") {
    val v = Seq(1f, 0f, 1f, 0f)
    val df = df4(0L -> v, 1L -> v, 2L -> v, 3L -> v)
    val books = Similarity.pqFitCodebooks(df, "vec_id", "embedding",
      dims = 4, m = 2, k = 2, iters = 3)
    assert(books.count() == 4)
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", books)
      .collect().map(_.getSeq[Long](1)).toSeq
    assert(codes.forall(_ == Seq(0L, 0L)))
  }

  test("a malformed embedding fails loudly at encode instead of coding " +
    "arbitrarily") {
    val df = Seq((0L, Seq(1f, 1f, 0f, 0f)), (1L, Seq(0f, 0f, 1f, 1f)))
      .toDF("vec_id", "embedding")
      .union(Seq((2L, null.asInstanceOf[Seq[Float]]))
        .toDF("vec_id", "embedding"))
    val books = Similarity.pqFitCodebooks(
      df.filter(col("vec_id") < 2), "vec_id", "embedding",
      dims = 4, m = 2, k = 2, iters = 2)
    val e = intercept[Exception] {
      Similarity.pqEncode(df, "vec_id", "embedding", books).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("malformed")
      || e.getCause != null && e.getCause.getMessage.contains("malformed"))
    // OVERLONG vectors must fail too: slices would silently drop the
    // tail dims otherwise (a 5-dim vector encodes as its first 4)
    val long = Seq((3L, Seq(1f, 1f, 0f, 0f, 9f))).toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Similarity.pqEncode(long, "vec_id", "embedding", books).collect()
    }
    assert(e2.getMessage != null && e2.getMessage.contains("malformed")
      || e2.getCause != null && e2.getCause.getMessage.contains("malformed"))
  }

  test("fixture corpus: codebook shape, code domain, and a " +
    "TakeOrderedAndProject ADC plan (per-partition heaps, no global sort)") {
    val emb = graft.sources.Lake.table(spark, sfDir, "embeddings")
    val books = Similarity.pqFitCodebooks(emb, "vec_id", "embedding",
      dims = 64, m = 4, k = 4, iters = 2)
    val rows = books.collect()
    assert(rows.length == 16 && rows.forall(_.getSeq[Long](2).length == 16))
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val codes = enc.collect().map(_.getSeq[Long](1))
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
    val query = Array.fill(64)(0L)
    val top = Similarity.pqAdcTopK(enc, "vec_id", books, query, n = 10)
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val ds = top.collect().map(_.getLong(1)).toSeq
    assert(ds.length == 10 && ds == ds.sorted && ds.forall(_ >= 0))
  }

  test("IVF-PQ: identical-member cells give zero residuals everywhere — " +
    "nprobe=1 scans only the query's cell, nprobe=2 scores the far cell " +
    "at exactly the query-to-centroid grid distance") {
    val a = Seq(11f, 10f, 10f, 10f); val b = Seq(-11f, -10f, -10f, -10f)
    val df = df4(0L -> a, 1L -> b, 2L -> a, 3L -> b)
    val (coarse, books, encoded) = Similarity.ivfPqIndex(df, "vec_id",
      "embedding", dims = 4, coarseK = 2, coarseIters = 2,
      m = 2, k = 2, iters = 2)
    // identical members per cell: centroids are the vectors, residuals 0,
    // so every sub-codebook is all-zero and every code is 0
    val enc = encoded.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).toSeq
    assert(enc.forall(_._3 == Seq(0L, 0L)))
    val cells = enc.map(e => e._1 -> e._2).toMap
    assert(cells(0L) == cells(2L) && cells(1L) == cells(3L)
      && cells(0L) != cells(1L))
    val qq = Array(11L * Q, 10L * Q, 10L * Q, 10L * Q)
    val one = Similarity.ivfPqTopK(encoded, "vec_id", coarse, books, qq,
      nprobe = 1, n = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(one == Seq((0L, 0L), (2L, 0L))) // only the query's cell scanned
    val two = Similarity.ivfPqTopK(encoded, "vec_id", coarse, books, qq,
      nprobe = 2, n = 10).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    // far-cell rows: residual codes are 0, so ADC = ||query − far cell||²
    // = (22² + 3·20²)·Q² = 1684·Q² exactly
    val far = 1684L * Q * Q
    assert(two == Seq((0L, 0L), (2L, 0L), (1L, far), (3L, far)))
  }

  test("recall@k: nprobe=1 misses the far cell's true neighbors (recall " +
    "0.5), nprobe=2 recovers them (recall 1.0) — the tuning number is " +
    "computed, not guessed") {
    val a = Seq(11f, 10f, 10f, 10f); val b = Seq(-11f, -10f, -10f, -10f)
    val df = df4(0L -> a, 1L -> b, 2L -> a, 3L -> b)
    val (coarse, books, encoded) = Similarity.ivfPqIndex(df, "vec_id",
      "embedding", dims = 4, coarseK = 2, coarseIters = 2,
      m = 2, k = 2, iters = 2)
    val quant = df.select(col("vec_id"),
      graft.operators.Cluster.quantizeFloor(col("embedding")).as("q"))
    val qq = Array(11L * Q, 10L * Q, 10L * Q, 10L * Q)
    val exact = quant.select(col("vec_id"),
        graft.functions.VectorFunctions.sqDistToLit(col("q"), qq.toSeq)
          .as("d"))
      .orderBy(col("d").asc, col("vec_id").asc).limit(4)
    def recallAt(nprobe: Int): (Long, Long, Double) = {
      val approx = Similarity.ivfPqTopK(encoded, "vec_id", coarse, books,
        qq, nprobe, n = 4)
      val r = Similarity.annRecallAtK(approx, exact, "vec_id", k = 4)
        .head()
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    assert(recallAt(1) == ((4L, 2L, 0.5)))  // far cell never scanned
    assert(recallAt(2) == ((4L, 4L, 1.0)))
  }

  test("IVFADC-R: exact re-rank genuinely reorders the ADC short-list — " +
    "candidates that TIE on ADC (k=1 codebook, shared code) come back in " +
    "true exact-distance order, and c < n refuses") {
    // one coarse cell, one PQ centroid per subspace: every candidate
    // shares code [0,0], so ADC distance is a constant and the raw
    // top-k falls back to id order — maximally wrong for ranking
    val df = df4(1L -> Seq(10f, 10f, 10f, 10f), 2L -> Seq(1f, 1f, 1f, 1f),
      3L -> Seq(4f, 4f, 4f, 4f))
    val (coarse, books, encoded) = Similarity.ivfPqIndex(df, "vec_id",
      "embedding", dims = 4, coarseK = 1, coarseIters = 1,
      m = 2, k = 1, iters = 2)
    val quant = df.select(col("vec_id"),
      graft.operators.Cluster.quantizeFloor(col("embedding")).as("q"))
    val qq = Array(0L, 0L, 0L, 0L)
    val adc = Similarity.ivfPqTopK(encoded, "vec_id", coarse, books, qq,
      nprobe = 1, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(adc.map(_._1) == Seq(1L, 2L, 3L)) // tie → id order
    assert(adc.map(_._2).distinct.size == 1)
    val rr = Similarity.ivfPqTopKRerank(encoded, quant, "vec_id", coarse,
      books, qq, nprobe = 1, c = 3, n = 3).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    // true order by exact quantized distance: 2 (4Q²) < 3 (64Q²) < 1 (400Q²)
    assert(rr.map(_._1) == Seq(2L, 3L, 1L))
    assert(rr.map(_._2) == Seq(4L * Q * Q, 64L * Q * Q, 400L * Q * Q))
    intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKRerank(encoded, quant, "vec_id", coarse, books,
        qq, nprobe = 1, c = 2, n = 3)
    }
  }

  test("a corpus smaller than k refuses to fit with a clear message " +
    "instead of a short codebook") {
    val df = df4(0L -> Seq(1f, 1f, 0f, 0f))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqFitCodebooks(df, "vec_id", "embedding",
        dims = 4, m = 2, k = 2, iters = 2)
    }
    assert(e.getMessage.contains("need at least"))
  }

  test("mismatched model state fails loudly: a code outside the codebook " +
    "range raises instead of null-sorting first; a coarse table with " +
    "duplicate cids is refused; a dims not divisible by m is refused") {
    val a = Seq(1f, 1f, 0f, 0f); val b = Seq(0f, 0f, 1f, 1f)
    val df = df4(0L -> a, 1L -> b)
    val books = Similarity.pqFitCodebooks(df, "vec_id", "embedding",
      dims = 4, m = 2, k = 2, iters = 2)
    // an encoded frame from a BIGGER codebook (stale lake read): code 5
    // indexes past the k=2 lookup table — must raise, not rank first
    val staleEncoded = Seq((7L, Seq(1L, 5L))).toDF("vec_id", "codes")
    val e = intercept[Exception] {
      Similarity.pqAdcTopK(staleEncoded, "vec_id", books,
        Array(Q, Q, 0L, 0L), n = 5).collect()
    }
    assert((e.getMessage != null && e.getMessage.contains("codebook range"))
      || (e.getCause != null && e.getCause.getMessage.contains("codebook range")))
    // NEGATIVE codes must raise too: try_element_at reads a negative
    // index from the END of the array, so without the explicit guard a
    // code of -2 would score against an arbitrary LUT entry silently
    val negEncoded = Seq((8L, Seq(0L, -2L))).toDF("vec_id", "codes")
    val eNeg = intercept[Exception] {
      Similarity.pqAdcTopK(negEncoded, "vec_id", books,
        Array(Q, Q, 0L, 0L), n = 5).collect()
    }
    assert((eNeg.getMessage != null && eNeg.getMessage.contains("codebook range"))
      || (eNeg.getCause != null && eNeg.getCause.getMessage.contains("codebook range")))
    // duplicate coarse cids (two model snapshots in one table) refused
    val (coarse, bk, enc) = Similarity.ivfPqIndex(df4(0L -> a, 1L -> b,
      2L -> a, 3L -> b), "vec_id", "embedding", dims = 4, coarseK = 2,
      coarseIters = 2, m = 2, k = 2, iters = 2)
    val doubled = coarse.union(coarse)
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(enc, "vec_id", doubled, bk,
        Array(Q, Q, 0L, 0L), nprobe = 1, n = 5)
    }
    assert(e2.getMessage.contains("duplicate cids"))
    // dims % m != 0 refused at build time (slices would drop the tail)
    val e3 = intercept[IllegalArgumentException] {
      Similarity.ivfPqIndex(df, "vec_id", "embedding", dims = 4,
        coarseK = 2, coarseIters = 2, m = 3, k = 2, iters = 2)
    }
    assert(e3.getMessage.contains("must divide"))
  }

  test("IVF-PQ fixture run: dense codebooks, every result row from a " +
    "probed cell, TakeOrderedAndProject plan") {
    val emb = graft.sources.Lake.table(spark, sfDir, "embeddings")
    val (coarse, books, encoded) = Similarity.ivfPqIndex(emb, "vec_id",
      "embedding", dims = 64, coarseK = 4, coarseIters = 2,
      m = 4, k = 4, iters = 2)
    assert(books.count() == 16 && coarse.count() == 4)
    val qq = Array.fill(64)(0L)
    val top = Similarity.ivfPqTopK(encoded, "vec_id", coarse, books, qq,
      nprobe = 2, n = 15)
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val rows = top.collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.length == 15 && rows.map(_._1).distinct.length <= 2)
    val ds = rows.map(_._2).toSeq
    assert(ds == ds.sorted && ds.forall(_ >= 0))
  }
}

class JsonNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("pack/unpack roundtrip") {
    val df = Seq((1, "a", "meta")).toDF("id", "x", "keep")
    val packed = JsonNormalize.pack(df, Seq("id", "x"), "data")
    assert(packed.columns.toSet == Set("data", "keep"))
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("x", StringType)))
    val back = JsonNormalize.unpack(packed, "data", schema)
    val r = back.select("id", "x", "keep").collect().head
    assert((r.getInt(0), r.getString(1), r.getString(2)) == ((1, "a", "meta")))
  }

  test("flattenStructs prefixes nested fields") {
    val df = Seq((1, ("x", 2))).toDF("id", "s")
    val flat = JsonNormalize.flattenStructs(df)
    assert(flat.columns.toSeq == Seq("id", "s__1", "s__2"))
  }

  test("explodeChild emits one row per child with deterministic keys") {
    val df = Seq((1, Seq("a", "b"))).toDF("pid", "kids")
    val r = JsonNormalize.explodeChild(df, "kids", col("pid"))
    assert(r.count() == 2)
    assert(r.select("child_key").distinct().count() == 2)
    // re-running produces identical keys (determinism)
    val again = JsonNormalize.explodeChild(df, "kids", col("pid"))
    assert(r.select("child_key").except(again.select("child_key")).count() == 0)
  }
}

class MultiModalSpec extends SparkSpec {
  test("feature extraction is deterministic and schema-stable") {
    val docs = graft.sources.Lake.table(spark, sfDir, "documents").limit(50)
    val media = MultiModal.fromText(spark, docs, "doc_id", "text")
    val f1 = MultiModal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MultiModal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.byte_len > 0 && f.width >= 16 && f.height >= 16))
    // text bytes decode nowhere, so every row is a visible stub with the
    // constant n_frames = 1 — no fabricated frame counts
    assert(f1.forall(f => f.n_frames == 1 && f.format == "stub"))
  }

  test("decode stub contract (property): schema, determinism, bounds, " +
    "portable checksum — a real codec must satisfy the same invariants") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // 1. the OUTPUT SCHEMA is frozen: a future real decoder slots into
    // extractFeatures without oracle churn iff it keeps exactly this shape
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = MultiModal.extractFeatures(
      spark.emptyDataset[MultiModal.MediaRow]).schema
    assert(schema == StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = true),
      StructField("byte_len", LongType, nullable = false),
      StructField("checksum", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("format", StringType, nullable = true))), schema)

    // 2.-5. per-row invariants over arbitrary payloads (driver-side — the
    // kernel is a pure function, mapPartitions only iterates it)
    val genRow = for {
      id <- Gen.chooseNum(0L, Long.MaxValue / 2)
      modality <- Gen.oneOf("image", "audio", "video")
      bytes <- Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield MultiModal.MediaRow(id, modality, "application/octet-stream",
      bytes.toArray)
    val md60 = (b: Array[Byte]) => java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString.substring(0, 15), 16)
    val prop = Prop.forAll(genRow) { r =>
      val f = MultiModal.decodeStub(r)
      val again = MultiModal.decodeStub(
        MultiModal.MediaRow(r.media_id, r.modality, r.mime, r.content.clone()))
      f == again &&                                  // deterministic in VALUE
      f.media_id == r.media_id && f.modality == r.modality &&
      f.byte_len == r.content.length.toLong &&
      f.checksum == md60(r.content) && f.checksum >= 0 && // portable/replayable
      f.width >= 16 && f.width < 16 + 1024 &&
      f.height >= 16 && f.height < 16 + 1024 &&
      f.n_frames == 1 // the stub NEVER fabricates frame counts
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("REAL image decode: PNG/JPEG/GIF/BMP bytes round-trip through ImageIO") {
    for ((fmt, name) <- Seq("png" -> "png", "jpg" -> "jpeg", "gif" -> "gif",
        "bmp" -> "bmp")) {
      val bytes = MultiModal.encodeImage(37, 23, fmt)
      val info = MultiModal.decodeImage(bytes)
      assert(info.contains(MultiModal.ImageInfo(37, 23, 1, name)),
        s"$fmt -> $info")
    }
    // decode() routes image payloads through the real reader: true
    // dimensions, format from the header, checksum still the portable md5
    val bytes = MultiModal.encodeImage(64, 48, "png")
    val f = MultiModal.decode(
      MultiModal.MediaRow(7L, "image", "image/png", bytes))
    assert(f.width == 64 && f.height == 48 && f.format == "png" &&
      f.n_frames == 1 && f.byte_len == bytes.length.toLong)
  }

  test("REAL image decode: animated GIF frame count from the header scan") {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 5).foreach { i =>
      val img = new java.awt.image.BufferedImage(12, 9,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, i * 1000)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    assert(MultiModal.decodeImage(out.toByteArray)
      .contains(MultiModal.ImageInfo(12, 9, 5, "gif")))
  }

  test("REAL audio decode: hand-rolled PCM WAV round-trips through the JDK parser") {
    val bytes = MultiModal.encodeWavPcm16(16000, 2, 1234)
    assert(MultiModal.decodeAudio(bytes)
      .contains(MultiModal.AudioInfo(16000, 2, 1234L, "wave")))
    // cross-check the other direction: a JDK-WRITTEN wav parses too
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val data = new Array[Byte](8000 * 2)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 8000L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    assert(MultiModal.decodeAudio(out.toByteArray)
      .contains(MultiModal.AudioInfo(8000, 1, 8000L, "wave")))
    // junk and truncated headers decline instead of throwing
    assert(MultiModal.decodeAudio(Array.fill[Byte](50)(7)).isEmpty)
    assert(MultiModal.decodeAudio(bytes.take(20)).isEmpty)
  }

  test("extractAudioFeatures: exact duration math, visible stub fallback") {
    import spark.implicits._
    val rows = Seq(
      MultiModal.MediaRow(1L, "audio", "audio/wav",
        MultiModal.encodeWavPcm16(44100, 1, 44100 * 3)),
      MultiModal.MediaRow(2L, "audio", "audio/wav",
        Array.fill[Byte](64)(9))) // undecodable
    val got = MultiModal.extractAudioFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(got(0) == MultiModal.AudioFeatures(1L, 44100, 1, 132300L, 3000L, "wave"))
    assert(got(1) == MultiModal.AudioFeatures(2L, 0, 0, 0L, 0L, "stub"))
  }

  test("REAL video decode: hand-rolled MP4 round-trips through the box parser") {
    // v0 layout, single video track
    assert(MultiModal.decodeVideo(MultiModal.encodeMp4(3000L, 320, 240, 500L))
      .contains(MultiModal.VideoInfo(3000L, 1, 320, 240, 500L, "isom")))
    // v1 (64-bit mvhd/tkhd) + a second audio track: the vide handler wins
    // for dimensions and frame count, track count sees both
    assert(MultiModal.decodeVideo(MultiModal.encodeMp4(12000L, 1280, 720,
      999L, withAudioTrack = true, version1 = true))
      .contains(MultiModal.VideoInfo(12000L, 2, 1280, 720, 999L, "isom")))
    // a media timescale other than 1000 recovers the exact duration
    assert(MultiModal.decodeVideo(MultiModal.encodeMp4(2500L, 100, 80, 10L,
      timescale = 90000))
      .contains(MultiModal.VideoInfo(2500L, 1, 100, 80, 10L, "isom")))
    // junk, truncated headers, and plain text all decline instead of
    // throwing mid-partition — no fabricated metadata
    assert(MultiModal.decodeVideo(Array.fill[Byte](64)(7)).isEmpty)
    assert(MultiModal.decodeVideo(
      MultiModal.encodeMp4(1000L, 10, 10, 5L).take(20)).isEmpty)
    assert(MultiModal.decodeVideo("not a video".getBytes("UTF-8")).isEmpty)
    // a largesize (size==1 + 64-bit) mdat box parses identically: rewrite
    // the token mdat into the escape form the spec allows for huge payloads
    val plain = MultiModal.encodeMp4(700L, 64, 48, 9L)
    val mdatLen = 16 // 8 header + 8 payload in the fixture
    val base = plain.dropRight(mdatLen)
    val big = java.nio.ByteBuffer.allocate(mdatLen + 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    big.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(mdatLen + 8L)
      .put(Array.fill(8)(0x42.toByte))
    assert(MultiModal.decodeVideo(base ++ big.array())
      .contains(MultiModal.VideoInfo(700L, 1, 64, 48, 9L, "isom")))
    // a corrupt v1 mvhd with duration near Long.MaxValue must fall to the
    // stub (None), not silently yield a garbage/negative durationMs:
    // duration * 1000 overflows and the guard catches it
    val v1 = MultiModal.encodeMp4(1000L, 32, 24, 3L, version1 = true)
    val patched = java.nio.ByteBuffer.wrap(v1.clone())
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    // ftyp(24) + moov hdr(8) + mvhd hdr(8) + ver/flags(4) + create(8) +
    // modify(8) + timescale(4) = byte 64 is the 64-bit duration field
    assert(patched.getInt(60) == 1000, "fixture layout moved: not timescale")
    patched.putLong(64, Long.MaxValue)
    assert(MultiModal.decodeVideo(patched.array()).isEmpty)
    // a NEGATIVE v1 duration (no multiplication overflow) must also fall
    // to the stub, not emit a negative durationMs
    val negDur = java.nio.ByteBuffer.wrap(v1.clone())
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    negDur.putLong(64, -5000L)
    assert(MultiModal.decodeVideo(negDur.array()).isEmpty)
  }

  test("extractVideoFeatures: real parse lands typed rows, undecodable " +
    "bytes emit a visible stub with ZEROS (never fabricated)") {
    import spark.implicits._
    val rows = Seq(
      MultiModal.MediaRow(1L, "video", "video/mp4",
        MultiModal.encodeMp4(5000L, 640, 360, 120L, withAudioTrack = true)),
      MultiModal.MediaRow(2L, "video", "video/mp4", Array.fill[Byte](64)(9)))
    val got = MultiModal.extractVideoFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(got(0) == MultiModal.VideoFeatures(1L, 5000L, 2, 640, 360, 120L, "isom"))
    assert(got(1) == MultiModal.VideoFeatures(2L, 0L, 0, 0, 0, 0L, "stub"))
    // the generic decode() path routes video payloads through the real
    // parser too: MediaFeatures carries the parsed dims and brand
    val f = MultiModal.decode(rows.head)
    assert(f.width == 640 && f.height == 360 && f.n_frames == 120 &&
      f.format == "isom")
  }

  test("sampleFrameIndexes: a zero-frame video (fragmented MP4 with empty " +
    "stts) yields no rows instead of crashing the sequence expression") {
    import spark.implicits._
    val rows = Seq(
      MultiModal.MediaRow(1L, "video", "video/mp4",
        MultiModal.encodeMp4(1000L, 64, 48, 0L)), // stts sample count 0
      MultiModal.MediaRow(2L, "video", "video/mp4",
        MultiModal.encodeMp4(1000L, 64, 48, 20L)))
    val feats = MultiModal.extractFeatures(spark.createDataset(rows)).toDF()
    // the zero-frame row IS decoded (real parse, n_frames 0), not stubbed
    assert(feats.filter(col("media_id") === 1L).head().getAs[Int]("n_frames") == 0)
    val sampled = MultiModal.sampleFrameIndexes(feats, stride = 7, maxFrames = 4)
      .select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    // sequence(0, -1, 7) would THROW at execution; the guard drops the row
    assert(sampled == Seq((2L, 0L), (2L, 7L), (2L, 14L)))
  }

  test("undecodable image bytes fall back to the stub VISIBLY (format='stub')") {
    val junk = Array.tabulate[Byte](100)(i => (i * 37).toByte)
    val f = MultiModal.decode(
      MultiModal.MediaRow(1L, "image", "image/png", junk))
    assert(f.format == "stub" && f == MultiModal.decodeStub(
      MultiModal.MediaRow(1L, "image", "image/png", junk)))
    // a TRUNCATED real header (magic bytes present, body cut) also falls
    // back rather than throwing mid-partition
    val cut = MultiModal.encodeImage(20, 20, "png").take(12)
    assert(MultiModal.decode(
      MultiModal.MediaRow(2L, "image", "image/png", cut)).format == "stub")
  }

  test("REAL pixel decode: channel sums and block-mean ahash match an " +
    "independent replay of the fixture fill; PNG ≡ BMP (both lossless)") {
    import spark.implicits._
    val (w, h) = (20, 12)
    // independent replay of encodeImage's (x*31 + y*7) & 0xffffff fill
    // with the documented cell quantization and cross-multiplied bits
    val cellSum = Array.fill(64)(0L); val cellCnt = Array.fill(64)(0L)
    var total = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 7) & 0xffffff
      val lum = ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
      val k = (y * 8 / h) * 8 + (x * 8 / w)
      cellSum(k) += lum; cellCnt(k) += 1; total += lum
    }
    val area = w.toLong * h
    val wantHash = (0 until 64).map(k =>
      if (cellSum(k) * area > total * cellCnt(k)) '1' else '0').mkString
    val rows = Seq(
      MultiModal.MediaRow(1L, "image", "image/png",
        MultiModal.encodeImage(w, h, "png")),
      MultiModal.MediaRow(2L, "image", "image/bmp",
        MultiModal.encodeImage(w, h, "bmp")),
      MultiModal.MediaRow(3L, "image", "image/png", Array.fill[Byte](40)(9)))
    val got = MultiModal.extractPixelFeatures(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(got(0) == MultiModal.PixelFeatures(1L, w, h, total, wantHash, "png"))
    // BMP is lossless too: identical raster, identical hash and sum
    assert(got(1).sum_rgb == total && got(1).ahash == wantHash &&
      got(1).format == "bmp")
    // undecodable bytes: visible stub, empty hash, zeros
    assert(got(2) == MultiModal.PixelFeatures(3L, 0, 0, 0L, "", "stub"))
  }

  test("QT RLE inter-frame codec: keyframe + line-band deltas round-trip " +
    "pixel-exact; temporal compositing is real (deltas carry only changed " +
    "lines); repeat/literal/skip decoder paths all hold") {
    import spark.implicits._
    val (w, h) = (11, 8)
    def base(x: Int, y: Int) = (x * 31 + y * 7 + 5) & 0xffffff
    val f0 = Array.tabulate(w * h)(i => base(i % w, i / w))
    // delta 1: rows 2-3 become a constant color (exercises repeat codes)
    val f1 = f0.clone()
    for (y <- 2 to 3; x <- 0 until w) f1(y * w + x) = 0x123456
    // delta 2: row 5 gets per-pixel values (exercises literal codes)
    val f2 = f1.clone()
    for (x <- 0 until w) f2(5 * w + x) = (x * 1013) & 0xffffff
    val rasters = Seq(f0, f1, f2)
    // the delta samples must be SMALLER than the keyframe: proof the
    // encoder really emits partial updates, not keyframes in disguise
    val samples = rasters.zipWithIndex.map { case (r, i) =>
      MultiModal.encodeQtRleSample(
        if (i == 0) None else Some(rasters(i - 1)), r, w, h)
    }
    assert(samples(1).length < samples(0).length)
    assert(samples(2).length < samples(0).length)
    // raw sample-level decode chain reproduces every raster exactly
    var st = new Array[Int](w * h)
    for ((s, i) <- samples.zipWithIndex) {
      st = MultiModal.decodeQtRleSample(st, s, w, h).get
      assert(st.sameElements(rasters(i)), s"frame $i raster mismatch")
    }
    // decoder robustness: spec features the encoder may not emit —
    // a skip-coded line (skip byte 4 = start 3 pixels in) and a
    // mid-line skip via code 0
    val handBody = Array[Byte](0, 0x08, 0, 2, 0, 0, 0, 1, 0, 0, // delta row 2
      4, // skip 3 pixels
      2, 1, 2, 3, 4, 5, 6, // two literal pixels
      0, 3, // code 0: skip 2 more
      -4, 9, 9, 9, // repeat x4
      -1, 0) // end line, end sample
    val hand = java.nio.ByteBuffer.allocate(4 + handBody.length)
      .putInt(4 + handBody.length).put(handBody).array()
    val prevH = Array.fill(w * h)(0x111111)
    val got = MultiModal.decodeQtRleSample(prevH, hand, w, h).get
    val want = prevH.clone()
    want(2 * w + 3) = 0x010203; want(2 * w + 4) = 0x040506
    for (x <- 7 until 11) want(2 * w + x) = 0x090909
    assert(got.sameElements(want))
    // truncated / oversized-claim samples degrade to None, state intact
    assert(MultiModal.decodeQtRleSample(prevH, samples(0).take(10), w, h).isEmpty)
    assert(prevH.forall(_ == 0x111111))
    // full distributed path: container round-trip through the sample
    // tables, stateful per-video decode, features ≡ an independent
    // pixel replay
    val mp4 = MultiModal.encodeQtRleVideo(w, h, rasters, samplesPerChunk = 2)
    assert(MultiModal.videoFrameCodec(mp4).contains("rle "))
    val rows = MultiModal.extractFramePixels(spark.createDataset(Seq(
      MultiModal.MediaRow(3L, "video", "video/mp4", mp4))))
      .collect().sortBy(_.frame_idx)
    assert(rows.length == 3 && rows.forall(_.format == "rle"))
    for ((r, i) <- rasters.zipWithIndex) {
      val sum = r.map(v => ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff))
        .foldLeft(0L)(_ + _)
      assert(rows(i).sum_rgb == sum, s"frame $i sum")
      assert(rows(i).width == w && rows(i).height == h)
    }
    // frames 0 and 1 differ only in rows 2-3 — their hashes must differ
    // (the delta really landed) while frame 2 ≠ frame 1 in row 5
    assert(rows(0).sum_rgb != rows(1).sum_rgb || rows(0).ahash != rows(1).ahash)
  }

  test("QT RLE: an unchanged frame encodes as a header-only delta and " +
    "decodes to an exact copy of the previous raster") {
    val (w, h) = (6, 4)
    val f = Array.tabulate(w * h)(i => (i * 777) & 0xffffff)
    val delta = MultiModal.encodeQtRleSample(Some(f), f, w, h)
    // keyframe carries every pixel; the no-change delta is just headers
    assert(delta.length < MultiModal.encodeQtRleSample(None, f, w, h).length / 2)
    val got = MultiModal.decodeQtRleSample(f, delta, w, h).get
    assert(got.sameElements(f))
    assert(!(got eq f)) // fresh copy, caller state never aliased
  }

  test("rle video with crafted huge tkhd dims degrades to the stub " +
    "marker — w*h Int overflow or an OOM-scale raster must never kill " +
    "the task") {
    import spark.implicits._
    val (w, h) = (6, 4)
    val rasters = Seq(Array.tabulate(w * h)(i => i & 0xffffff),
      Array.tabulate(w * h)(i => (i + 7) & 0xffffff))
    val mp4 = MultiModal.encodeQtRleVideo(w, h, rasters)
    // declare 46341x46341 in the v0 tkhd (46341^2 overflows Int — the
    // allocation would throw NegativeArraySizeException uncaught)
    val payload = mp4.indexOfSlice("tkhd".getBytes("US-ASCII")) + 4
    assert(payload > 4)
    def put(off: Int, v: Int): Unit = {
      mp4(off) = (v >> 24).toByte; mp4(off + 1) = (v >> 16).toByte
      mp4(off + 2) = (v >> 8).toByte; mp4(off + 3) = v.toByte
    }
    put(payload + 76, 46341 << 16)
    put(payload + 80, 46341 << 16)
    val rows = MultiModal.extractFramePixels(spark.createDataset(Seq(
      MultiModal.MediaRow(9L, "video", "video/mp4", mp4)))).collect()
    assert(rows.length == 1 && rows.head.frame_idx == -1L &&
      rows.head.format == "stub")
  }

  test("decodeRaster: declared dimensions are checked header-only before " +
    "pixel allocation — an over-cap image degrades to None, under-cap " +
    "decodes") {
    val png = MultiModal.encodeImage(20, 12, "png") // 240 declared pixels
    assert(MultiModal.decodeRaster(png).isDefined)
    assert(MultiModal.decodeRaster(png, maxPixels = 240L).isDefined)
    // one pixel under the declared area: refused BEFORE read(0) can
    // allocate — this is the untrusted-header OOM guard
    assert(MultiModal.decodeRaster(png, maxPixels = 239L).isEmpty)
  }

  test("audio PCM truncated mid-sample: the buffered half-sample at EOF " +
    "flags a parse failure (stub row), never clean stats") {
    import spark.implicits._
    val wav = MultiModal.encodeWavPcm16(16000, 1, 50)
    // intact payload decodes...
    assert(MultiModal.decodeAudioSampleStats(wav).isDefined)
    // ...but dropping the final byte leaves a dangling half-sample
    assert(MultiModal.decodeAudioSampleStats(wav.dropRight(1)).isEmpty)
    val got = MultiModal.extractAudioSamples(spark.createDataset(Seq(
      MultiModal.MediaRow(9L, "audio", "audio/wav", wav.dropRight(1)))))
      .collect()
    assert(got.head == MultiModal.AudioSampleFeatures(9L, 0L, 0L, 0, "stub"))
  }

  test("REAL audio sample decode: streamed PCM sum/peak/count match the " +
    "fixture formula; non-PCM bytes emit the visible stub") {
    import spark.implicits._
    val frames = 700
    val channels = 2
    val n = frames * channels
    // independent replay of encodeWavPcm16's ((i*31) & 0xffff) - 32768 fill
    var sum = 0L; var peak = 0
    for (i <- 0 until n) {
      val s = ((i * 31) & 0xffff) - 32768
      sum += s; peak = math.max(peak, math.abs(s))
    }
    val rows = Seq(
      MultiModal.MediaRow(1L, "audio", "audio/wav",
        MultiModal.encodeWavPcm16(16000, channels, frames)),
      MultiModal.MediaRow(2L, "audio", "audio/wav", Array.fill[Byte](64)(3)))
    val got = MultiModal.extractAudioSamples(spark.createDataset(rows))
      .collect().sortBy(_.media_id)
    assert(got(0) == MultiModal.AudioSampleFeatures(1L, n.toLong, sum, peak,
      "wave"))
    assert(got(1) == MultiModal.AudioSampleFeatures(2L, 0L, 0L, 0, "stub"))
  }

  test("REAL frame extraction: stsz/stsc/stco sample-table walk recovers " +
    "every frame's exact bytes, partial tail chunk included") {
    import spark.implicits._
    // 8 frames of distinct sizes/contents, 3 per chunk → chunks of 3,3,2
    // (exercises the two-run stsc shape)
    val frames = (0 until 8).map(i =>
      Array.tabulate[Byte](10 + i * 3)(j => ((i * 7 + j * 13) % 256).toByte))
    val mp4 = MultiModal.encodeMp4Frames(64, 48, frames, samplesPerChunk = 3)
    // the ranges land exactly on the original frame bytes
    val ranges = MultiModal.videoFrameRanges(mp4).get
    assert(ranges.size == 8)
    for ((f, i) <- frames.zipWithIndex) {
      val (off, sz) = ranges(i)
      assert(sz == f.length)
      assert(mp4.slice(off.toInt, off.toInt + sz).sameElements(f), s"frame $i")
    }
    // the header-only walker agrees on the count; mdat stays unread there
    assert(MultiModal.decodeVideo(mp4).get.nFrames == 8L)
    // distributed stats rows: one per frame + a visible marker for junk
    val rows = Seq(
      MultiModal.MediaRow(1L, "video", "video/mp4", mp4),
      MultiModal.MediaRow(2L, "video", "video/mp4", Array.fill[Byte](64)(5)))
    val got = MultiModal.extractFrameBytes(spark.createDataset(rows))
      .collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(got.count(_.media_id == 1L) == 8)
    for ((f, i) <- frames.zipWithIndex) {
      val row = got(i)
      assert(row.frame_idx == i.toLong && row.size == f.length &&
        row.sum_bytes == f.map(_ & 0xff).sum.toLong)
    }
    assert(got.last == MultiModal.FrameBytes(2L, -1L, 0, 0L))
    // a sample table pointing past the file is rejected, not mis-read:
    // truncating the mdat payload must fail the bounds check
    assert(MultiModal.videoFrameRanges(mp4.dropRight(5)).isEmpty)
    // the OTHER sample-table layouts real encoders emit: uniform stsz
    // (sample_size field, no per-entry table) and 64-bit co64 offsets —
    // same frames must resolve identically through both
    val eq = (0 until 7).map(i =>
      Array.tabulate[Byte](24)(j => ((i * 5 + j * 3) % 256).toByte))
    val alt = MultiModal.encodeMp4Frames(64, 48, eq, samplesPerChunk = 2,
      uniformStsz = true, co64 = true)
    val altRanges = MultiModal.videoFrameRanges(alt).get
    assert(altRanges.size == 7 && altRanges.forall(_._2 == 24))
    for ((f, i) <- eq.zipWithIndex) {
      val (off, sz) = altRanges(i)
      assert(alt.slice(off.toInt, off.toInt + sz).sameElements(f),
        s"uniform/co64 frame $i")
    }

    // a WELL-FORMED zero-sample MP4 decodes to zero frames (Some(empty)),
    // distinct from the undecodable marker — "no frames" is a real answer
    val empty = MultiModal.encodeMp4Frames(64, 48, Seq.empty)
    assert(MultiModal.videoFrameRanges(empty).contains(Seq.empty))
    val zrows = MultiModal.extractFrameBytes(spark.createDataset(Seq(
      MultiModal.MediaRow(3L, "video", "video/mp4", empty)))).collect()
    assert(zrows.isEmpty)
  }

  test("REAL per-frame PIXEL decode: PNG-coded MP4 frames decode to " +
    "rasters matching the still-image path; stsd names the codec; " +
    "inter-frame codecs decline visibly per frame") {
    import spark.implicits._
    // four PNG frames of distinct sizes inside one MP4 (QuickTime-style
    // intra-only video): per-frame features must equal the standalone
    // still-image features of the same PNGs
    val stills = (0 until 4).map(i =>
      MultiModal.encodeImage(10 + i, 8 + i, "png"))
    val mp4 = MultiModal.encodeMp4Frames(16, 16, stills, samplesPerChunk = 3)
    assert(MultiModal.videoFrameCodec(mp4).contains("png "))
    // the stsd addition must not disturb the existing header walkers
    assert(MultiModal.decodeVideo(mp4).get.nFrames == 4L)
    val want = MultiModal.extractPixelFeatures(spark.createDataset(
      stills.zipWithIndex.map { case (b, i) =>
        MultiModal.MediaRow(i.toLong, "image", "image/png", b) }))
      .collect().sortBy(_.media_id)
    val got = MultiModal.extractFramePixels(spark.createDataset(Seq(
      MultiModal.MediaRow(7L, "video", "video/mp4", mp4))))
      .collect().sortBy(_.frame_idx)
    assert(got.length == 4)
    for (i <- 0 until 4) {
      assert(got(i) == MultiModal.FramePixels(7L, i.toLong, want(i).width,
        want(i).height, want(i).sum_rgb, want(i).ahash, "png"),
        s"frame $i: ${got(i)} vs ${want(i)}")
    }
    // an avc1-coded container: the sample walk still resolves frames, but
    // ImageIO declines the NAL payload — visible per-frame stubs, and the
    // stsd correctly names the codec a deployment would plug in
    val nalish = Seq(Array.tabulate[Byte](40)(j => (j * 11).toByte))
    val avc = MultiModal.encodeMp4Frames(16, 16, nalish, codec = "avc1")
    assert(MultiModal.videoFrameCodec(avc).contains("avc1"))
    val gotAvc = MultiModal.extractFramePixels(spark.createDataset(Seq(
      MultiModal.MediaRow(8L, "video", "video/mp4", avc)))).collect()
    assert(gotAvc.toSeq == Seq(
      MultiModal.FramePixels(8L, 0L, 0, 0, 0L, "", "stub")))
    // undecodable CONTAINER: one marker row
    val junk = MultiModal.extractFramePixels(spark.createDataset(Seq(
      MultiModal.MediaRow(9L, "video", "video/mp4",
        Array.fill[Byte](64)(3))))).collect()
    assert(junk.toSeq == Seq(
      MultiModal.FramePixels(9L, -1L, 0, 0, 0L, "", "stub")))
  }
}

class ScaleStrategySpec extends graft.SparkSpec {
  import spark.implicits._

  test("saltedJoin is row-identical to the plain inner join") {
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = Relational.saltedJoin(left, right, Seq("k"), saltFactor = 4)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("saltedJoin with a MapType left column: hash-safe spread skips it " +
    "(no AnalysisException), rows still identical to the plain join") {
    // pre-round-13 saltedJoin hashed ALL left columns — a MapType column
    // made xxhash64 throw at analysis; it must now be skipped, mirroring
    // adaptiveSaltedJoin's hash-safe filter
    val left = Seq((1, "a"), (1, "b"), (2, "c"))
      .toDF("k", "lv")
      .withColumn("m", map(col("lv"), col("k")))
    val right = Seq((1, "X"), (2, "Y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    val salted = Relational.saltedJoin(left, right, Seq("k"), saltFactor = 4)
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)
  }

  test("saltPlan: only keys over the row budget are salted, factor sized " +
    "to the excess — cold keys are NOT in the plan (un-replicated)") {
    // 900 rows on key 7, 40 on key 3, a smattering of singletons
    val skewed = (Seq.fill(900)(7) ++ Seq.fill(40)(3) ++ (100 to 120))
      .toDF("k")
    val plan = Relational.saltPlan(skewed, Seq("k"),
      targetRowsPerTask = 100L, maxSaltFactor = 16)
    assert(plan.keySet == Set("7"), s"only the hot key: $plan")
    // ~900 rows / 100 target → factor ≈ 9 (Misra-Gries may UNDERestimate,
    // never overestimate)
    assert(plan("7") >= 5 && plan("7") <= 9, plan.toString)
    // a uniform table plans NO salting at all
    assert(Relational.saltPlan(spark.range(200).toDF("k"), Seq("k"),
      targetRowsPerTask = 100L).isEmpty)
    // a SAMPLED probe (seeded, estimates scaled back up) still finds only
    // the hot key — the cheap path a 100 TB planner runs
    val sampled = Relational.saltPlan(skewed, Seq("k"),
      targetRowsPerTask = 100L, maxSaltFactor = 16, sampleFraction = 0.5)
    assert(sampled.keySet == Set("7"), s"sampled plan: $sampled")
    assert(sampled("7") >= 3 && sampled("7") <= 16, sampled.toString)
  }

  test("adaptiveSaltedJoin: row-identical to the plain join, hot map rides " +
    "a broadcast, no cartesian anywhere") {
    val left = ((1 to 500).map(_ => (0, "hot")) ++
      Seq((1, "a"), (2, "b"), (3, "c"), (9, "nomatch"))).toDF("k", "lv")
    val right = Seq((0, "H"), (1, "X"), (2, "Y"), (3, "Z"), (8, "dead"))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    val adaptive = Relational.adaptiveSaltedJoin(left, right, Seq("k"),
      targetRowsPerTask = 50L)
    val got = adaptive.select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(got == plain)
    val physical = adaptive.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
    assert(!physical.contains("CartesianProduct"), physical)
    // an injected plan skips the probe and replicates exactly as told;
    // a deliberately WRONG plan (salting a cold key) still returns the
    // same rows — misclassification is pure layout
    val forced = Relational.adaptiveSaltedJoin(left, right, Seq("k"),
      targetRowsPerTask = 50L, plan = Some(Map("2" -> 4)))
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(forced == plain)
    // empty plan → the plain join, zero salting machinery
    val empty = Relational.adaptiveSaltedJoin(left, right, Seq("k"),
      targetRowsPerTask = 50L, plan = Some(Map.empty))
    assert(!empty.queryExecution.executedPlan.toString.contains("__salt"))
    // a left frame with an UNHASHABLE column (MapType) joins fine with a
    // plain join, so it must join fine here too — the salt no longer
    // hashes the whole row
    val mapLeft = left.withColumn("m", map(col("lv"), col("k")))
    val mapGot = Relational.adaptiveSaltedJoin(mapLeft, right, Seq("k"),
      targetRowsPerTask = 50L, plan = Some(Map("0" -> 4)))
      .select("k", "lv", "rv")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sorted.toSeq
    assert(mapGot == plain)
  }

  test("co-bucketed tables join without an exchange") {
    import graft.sources.LakeWriter
    // unique names: a stale managed-table location from a previous JVM
    // would otherwise fail the CREATE
    val suffix = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val (ta, tb) = (s"bk_a_$suffix", s"bk_b_$suffix")
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path: tiny test tables would otherwise be
      // broadcast and never exercise bucketing at all
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      LakeWriter.writeBucketed(
        Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"), ta, Seq("k"), 4)
      LakeWriter.writeBucketed(
        Seq((1, 10.0), (2, 20.0)).toDF("k", "w"), tb, Seq("k"), 4)
      val joined = spark.table(ta).join(spark.table(tb), Seq("k"))
      assert(joined.count() == 2)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewed join: salting spreads the hot key across partitions") {
    import org.apache.spark.sql.functions.{pmod, xxhash64}
    // 90% of rows on one key — the shape where a plain hash-partitioned
    // join puts ~all work in one task
    val left = spark.range(50000).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 10).as("k"),
      (col("id") * 31 % 997).as("v"))
    val right = spark.range(10).select(col("id").as("k"), (col("id") % 3).as("g"))

    // mechanism: the largest UNSPLITTABLE work unit. A hash join's unit is
    // the key group (45k rows on the hot key — one task no matter how many
    // partitions); salting shrinks the unit to (key, salt) groups of
    // ~45k/16. (Physical partition sizes additionally depend on how groups
    // bin-pack into partitions — that part is AQE's job, not salting's.)
    val saltExpr = pmod(xxhash64(col("k"), col("v")), lit(16))
    val maxPlainUnit = left.groupBy(col("k")).count()
      .agg(max("count")).collect().head.getLong(0)
    val maxSaltedUnit = left.withColumn("__s", saltExpr)
      .groupBy(col("k"), col("__s")).count()
      .agg(max("count")).collect().head.getLong(0)
    assert(maxPlainUnit >= 45000L, s"fixture must be skewed, got $maxPlainUnit")
    assert(maxSaltedUnit <= maxPlainUnit / 8,
      s"salting must shrink the hot key's work unit, got $maxSaltedUnit")

    // operator: result identical to the plain join, exchange keyed by salt
    val plain = left.join(right, Seq("k")).groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val viaSalt = Relational.saltedJoin(left, right, Seq("k"), saltFactor = 16)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(viaSalt == plain)
    val planStr = Relational.saltedJoin(left, right, Seq("k"), saltFactor = 16)
      .queryExecution.optimizedPlan.toString
    assert(planStr.contains("__salt"), planStr)
  }

  test("skewed join: AQE splits the skewed partition (skew=true in final plan)") {
    import org.apache.spark.sql.functions.xxhash64
    // incompressible payload so shuffle-partition BYTES reflect the row
    // skew (sequential longs lz4 away to almost nothing)
    val left = spark.range(200000).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 10).as("k"),
      xxhash64(col("id")).as("v"))
    val right = spark.range(10).select(col("id").as("k"), (col("id") % 3).as("g"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // the aggregate CONSUMES v, so column pruning can't strip the
      // incompressible payload out of the join shuffle
      val j = left.join(right, Seq("k")).groupBy(col("g"))
        .agg(count(lit(1)).as("n"), sum(col("v").cast("double")).as("sv"))
      val rows = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // correctness unaffected by the runtime re-plan
      assert(rows.map(_._2).sum == 200000L)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") ||
        finalPlan.toLowerCase.contains("skewed"),
        s"AQE must have split the skewed partition:\n$finalPlan")
    }
  }

  test("bloomPrunedJoin equals the plain join and plans a bloom pre-filter") {
    val big = (1 to 1000).map(i => (i, s"v$i")).toDF("k", "v")
    val small = Seq((3, "X"), (500, "Y"), (2000, "Z")).toDF("k", "w")
    val plain = big.join(small, Seq("k")).select("k", "v", "w")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    val pruned = Relational.bloomPrunedJoin(big, small, Seq("k"),
      expectedItems = 100L)
    val got = pruned.select("k", "v", "w")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == plain)
    // the big side must pass through a might_contain filter BEFORE the join
    // (analyzed plan: over a LocalRelation the optimizer constant-folds the
    // whole filter away; over a real scan it survives — PlanShapeSpec pins
    // that on q66's parquet input)
    val plan = pruned.queryExecution.analyzed.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("bloomPrunedJoin rejects join types that preserve non-matching big-side rows") {
    val big = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val small = Seq((3, "X")).toDF("k", "w")
    // left_anti is the catastrophic case: bloom pre-filtering the big side
    // would drop nearly the entire correct result
    for (jt <- Seq("left_outer", "full_outer", "left_anti"))
      assertThrows[IllegalArgumentException] {
        Relational.bloomPrunedJoin(big, small, Seq("k"), joinType = jt)
      }
    // right_outer preserves only SMALL-side rows — safe, and must agree
    // with the plain join
    val plain = big.join(small, Seq("k"), "right_outer")
      .collect().map(_.toSeq).toSet
    val viaBloom = Relational.bloomPrunedJoin(big, small, Seq("k"),
        expectedItems = 100L, joinType = "right_outer")
      .collect().map(_.toSeq).toSet
    assert(viaBloom == plain)
  }

  test("applyCdc: latest change wins, deletes drop, untouched keys survive") {
    val base = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "payload")
    val changes = Seq(
      (1, "a2", 1L, "upsert"),  // stale update, superseded below
      (1, "a3", 2L, "upsert"),  // latest for key 1
      (2, "x", 5L, "delete"),   // tombstone for key 2
      (4, "d", 1L, "upsert")    // insert of a new key
    ).toDF("k", "payload", "seq", "op")
    val out = Relational.applyCdc(base, changes, Seq("k"),
      order = Seq(col("seq")), op = col("op"), payload = Seq("payload"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1, "a3"), (3, "c"), (4, "d")))
  }

  test("applyCdc: an upsert can null a payload column (not coalesced away)") {
    val base = Seq((1, "a")).toDF("k", "payload")
    val changes = Seq((1, null.asInstanceOf[String], 1L, "upsert"))
      .toDF("k", "payload", "seq", "op")
    val out = Relational.applyCdc(base, changes, Seq("k"),
      Seq(col("seq")), col("op"), Seq("payload")).collect()
    assert(out.length == 1 && out.head.isNullAt(1))
  }

  test("sampleFixedNPerGroup: n per group, deterministic across runs") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "id")
    val a = Relational.sampleFixedNPerGroup(df, Seq("g"), col("id"), 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a.groupBy(_._1).forall(_._2.size == 7))
    val b = Relational.sampleFixedNPerGroup(df, Seq("g"), col("id"), 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("histogram clamps out-of-range values to the edge bins") {
    val df = Seq(-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0)
      .toDF("v")
    val bins = Relational.histogram(df, col("v"), 0.0, 100.0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // -5 clamps into bin 0; 100 and 250 clamp into bin 9
    assert(bins(0L) == 3 && bins(1L) == 1 && bins(5L) == 1 && bins(9L) == 3)
  }

  test("histogram invariant: bin counts sum to non-null non-NaN rows") {
    val df = Seq(Some(1.0), Some(50.0), None, Some(Double.NaN), Some(200.0))
      .toDF("v")
    val total = Relational.histogram(df, col("v"), 0.0, 100.0, 4)
      .agg(sum("n")).collect().head.getLong(0)
    assert(total == 3) // null and NaN dropped, 200 clamped but counted
  }

  test("packSequences invariant: token totals and row count conserved") {
    val df = (1 to 500).map(i => (s"s${i % 7}", i.toLong, (i % 90 + 1).toLong))
      .toDF("shard", "id", "toks")
    val out = Relational.packSequences(df, Seq("shard"), Seq(col("id")),
      col("toks"), capacity = 256L)
    assert(out.count() == 500)
    val inSum = df.agg(sum("toks")).collect().head.getLong(0)
    val outSum = out.agg(sum("n_tokens")).collect().head.getLong(0)
    assert(inSum == outSum)
    // offsets always inside the bin
    assert(out.filter(col("offset_in_bin") < 0 ||
      col("offset_in_bin") >= 256).count() == 0)
  }

  test("splitAssign invariant: every row gets exactly one of the 3 labels") {
    val df = (1 to 1000).toDF("k")
      .select(Relational.splitAssign(col("k"), 80, 10).as("split"))
    assert(df.filter(!col("split").isin("train", "val", "test")).count() == 0)
    assert(df.count() == 1000)
  }
}
