package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Parity: the codegen'd kernels must be value-identical to the HOF
  * compositions they replaced (same IEEE accumulation order, same null
  * semantics), so oracle hashes and persisted signatures are unchanged.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) = {
    val d = VectorFunctions.dot(a, b)
    val nn = VectorFunctions.norm(a) * VectorFunctions.norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  test("cosine matches the HOF composition bit-for-bit") {
    val df = Seq(
      (Seq(1.0f, 2.0f, -3.5f), Seq(0.5f, -1.0f, 2.0f)),
      (Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)),
      (Seq(1.25f, -2.75f, 3.125f), Seq(9.5f, 0.125f, -4.25f))
    ).toDF("a", "b")
    val r = df.select(
      VectorFunctions.cosine(col("a"), col("b")).as("fast"),
      hofCosine(col("a"), col("b")).as("hof")).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))))
  }

  test("cosine null semantics: null vector → 0.0, mismatched length → null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f, 3.0f))),
      (None, Some(Seq(1.0f)))
    ).toDF("a", "b")
    val r = df.select(VectorFunctions.cosine(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getDouble(0) == 0.0)
  }

  test("cosineOfQuantized matches the HOF dotQ/sqrt·sqrt composition bit-for-bit") {
    def hofCosQ(qa: org.apache.spark.sql.Column, qb: org.apache.spark.sql.Column) = {
      val d = aggregate(zip_with(qa, qb, (x, y) => x * y),
        lit(0L), (acc, v) => acc + v).cast("double")
      val na = sqrt(aggregate(qa, lit(0L), (acc, v) => acc + v * v).cast("double"))
      val nb = sqrt(aggregate(qb, lit(0L), (acc, v) => acc + v * v).cast("double"))
      when(na * nb > 0, d / (na * nb)).otherwise(lit(0.0))
    }
    val df = Seq(
      (Seq(104857L, -209715L, 367001L), Seq(52428L, 104857L, -157286L)),
      (Seq(0L, 0L, 0L), Seq(1L, 2L, 3L)),
      (Seq(7L, 11L, 13L), Seq(7L, 11L, 13L))
    ).toDF("a", "b")
    val r = df.select(
      VectorFunctions.cosineOfQuantized(col("a"), col("b")).as("fast"),
      hofCosQ(col("a"), col("b")).as("hof")).collect()
    r.foreach(row => assert(
      java.lang.Double.doubleToLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(row.getDouble(1))))
  }

  test("sqDistToLit matches the HOF zip_with composition; mismatch → null") {
    val cent = Seq(100L, -50L, 25L)
    def hofSq(q: org.apache.spark.sql.Column) =
      aggregate(zip_with(q, array(cent.map(lit(_)): _*),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val df = Seq(Seq(90L, -60L, 30L), Seq(-1000L, 2000L, 0L)).toDF("q")
    val r = df.select(
      VectorFunctions.sqDistToLit(col("q"), cent).as("fast"),
      hofSq(col("q")).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
    val bad = Seq(Seq(1L, 2L)).toDF("q")
      .select(VectorFunctions.sqDistToLit(col("q"), cent)).collect()
    assert(bad(0).isNullAt(0))
  }

  test("sqDistQ (column-column) matches the HOF zip_with/aggregate " +
    "composition and sqDistToLit on the same pairs; mismatch or null " +
    "element → null") {
    val df = Seq(
      (Seq(1L, -2L, 3L), Seq(4L, 0L, -3L)),
      (Seq(0L, 0L, 0L), Seq(0L, 0L, 0L)),
      (Seq(1000000L, -999999L, 123456L), Seq(-1000000L, 999999L, 0L))
    ).toDF("a", "b")
    val r = df.select(
      VectorFunctions.sqDistQ(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, v) => acc + v).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
    // literal-side parity: sq_dist(v, lit) == sq_dist_lit(v)
    val lits = Seq(4L, 0L, -3L)
    val p = df.select(
      VectorFunctions.sqDistQ(col("a"), typedLit(lits)).as("cols"),
      VectorFunctions.sqDistToLit(col("a"), lits).as("lit")).collect()
    p.foreach(row => assert(row.getLong(0) == row.getLong(1)))
    val badDf = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    val rb = badDf.select(VectorFunctions.sqDistQ(col("a"), col("b")))
      .collect()
    assert(rb(0).isNullAt(0) && rb(1).isNullAt(0))
  }

  test("pqReconstruct decodes codes to the concatenated codebook " +
    "entries; out-of-range or miscounted codes FAIL LOUDLY with the " +
    "shared branded message; value-equal instances compare equal") {
    val books: Array[Array[Array[Long]]] = Array(
      Array(Array(10L, 11L), Array(20L, 21L)), // sub 0: cids 0, 1
      Array(Array(30L, 31L), Array(40L, 41L))) // sub 1: cids 0, 1
    val flat = books.flatMap(_.flatMap(_.toSeq)).toSeq
    import org.apache.spark.sql.graftbridge.Bridge
    def recon(c: org.apache.spark.sql.Column) =
      Bridge.column(PqReconstruct(Bridge.expression(c), flat, 2, 2, 2))
    val r = Seq(Seq(0L, 1L), Seq(1L, 0L)).toDF("codes")
      .select(recon(col("codes"))).collect()
    assert(r(0).getSeq[Long](0) == Seq(10L, 11L, 40L, 41L))
    assert(r(1).getSeq[Long](0) == Seq(20L, 21L, 30L, 31L))
    // stored-side corruption is LOUD, same contract (and message) as the
    // single-query ADC guard — never a silently dropped candidate
    Seq(Seq(2L, 0L) -> "out-of-range cid", Seq(0L) -> "wrong m").foreach {
      case (codes, why) =>
        val ex = intercept[Exception] {
          Seq(codes).toDF("codes").select(recon(col("codes"))).collect()
        }
        def chain(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(ex).exists(_.contains("outside the codebook range")),
          s"$why must raise the branded message, got: ${chain(ex)}")
    }
    // codebook held as Seq -> VALUE equality (an Array field would
    // compare by reference and defeat Catalyst subexpression reuse).
    // One shared child isolates the books field (Spark 4 Columns carry
    // call-site origins that differ between two col(...) constructions)
    val child = Bridge.expression(col("codes"))
    val e1 = PqReconstruct(child, flat, 2, 2, 2)
    val e2 = PqReconstruct(child,
      books.flatMap(_.flatMap(_.toSeq)).toSeq, 2, 2, 2)
    assert(e1 == e2)
  }

  test("quantizeFloor kernel matches the transform HOF (floats and negatives)") {
    def hofQ(a: org.apache.spark.sql.Column, scale: Int) =
      transform(a, x => floor(x.cast("double") * scale).cast("long"))
    val df = Seq(Seq(0.5f, -0.5f, -0.3f, 1.25f, 0.0f)).toDF("v")
    val r = df.select(
      VectorFunctions.quantizeFloor(col("v"), 1 << 20).as("fast"),
      hofQ(col("v"), 1 << 20).as("hof")).collect()
    assert(r(0).getSeq[Long](0) == r(0).getSeq[Long](1))
  }

  test("quantized kernels match HOFs on 300 seeded-random vectors (bit parity)") {
    val rnd = new scala.util.Random(20260813L)
    def vec(dim: Int): Seq[Long] =
      Seq.fill(dim)((rnd.nextDouble() * 4194304 - 2097152).toLong) // ±2^21
    val rows = Seq.fill(300)((vec(64), vec(64))) ++
      Seq((Seq.fill(64)(0L), vec(64)),              // zero norm
          (Seq.fill(64)(2097152L), Seq.fill(64)(-2097152L))) // extremes
    val df = rows.toDF("a", "b")
    def hofCosQ(qa: org.apache.spark.sql.Column, qb: org.apache.spark.sql.Column) = {
      val d = aggregate(zip_with(qa, qb, (x, y) => x * y), lit(0L), (acc, v) => acc + v).cast("double")
      val na = sqrt(aggregate(qa, lit(0L), (acc, v) => acc + v * v).cast("double"))
      val nb = sqrt(aggregate(qb, lit(0L), (acc, v) => acc + v * v).cast("double"))
      when(na * nb > 0, d / (na * nb)).otherwise(lit(0.0))
    }
    val bad = df.select(
      VectorFunctions.cosineOfQuantized(col("a"), col("b")).as("fast"),
      hofCosQ(col("a"), col("b")).as("hof"))
      .filter(col("fast") =!= col("hof") ||
        col("fast").isNull =!= col("hof").isNull)
    assert(bad.count() == 0)

    val cent = vec(64)
    def hofSq(q: org.apache.spark.sql.Column) =
      aggregate(zip_with(q, array(cent.map(lit(_)): _*),
        (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val badSq = df.select(
      VectorFunctions.sqDistToLit(col("a"), cent).as("fast"),
      hofSq(col("a")).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(badSq.count() == 0)

    val fdf = Seq.fill(300)(Seq.fill(16)(
      (rnd.nextFloat() - 0.5f) * 4)).toDF("v")
    def hofQ(a: org.apache.spark.sql.Column) =
      transform(a, x => floor(x.cast("double") * 1048576).cast("long"))
    val badQ = fdf.select(
      VectorFunctions.quantizeFloor(col("v"), 1 << 20).as("fast"),
      hofQ(col("v")).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(badQ.count() == 0)
  }

  test("lshSignature matches the per-bit HOF composition") {
    val planes = VectorFunctions.seededPlanes(12, 8, 42L)
    def hofSig(v: org.apache.spark.sql.Column) =
      planes.zipWithIndex.map { case (p, i) =>
        shiftleft(VectorFunctions.hyperplaneBit(v, p), i)
      }.reduce((a, b) => a.bitwiseOR(b))
    val df = Seq(
      Seq(1.0f, -2.0f, 0.5f, 3.0f, -0.25f, 1.5f, -1.0f, 0.75f),
      Seq(-1.0f, 2.0f, -0.5f, -3.0f, 0.25f, -1.5f, 1.0f, -0.75f),
      Seq(0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f, 0.0f)
    ).toDF("v")
    val r = df.select(
      VectorFunctions.lshSignature(col("v"), planes).as("fast"),
      hofSig(col("v")).as("hof")).collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
  }

  test("minHashFromHashes matches array_min(transform(xxhash64(h, i)))") {
    def hofMin(h: org.apache.spark.sql.Column, k: Int) =
      array((0 until k).map(i =>
        array_min(transform(h, x => xxhash64(x, lit(i))))): _*)
    val df = Seq(
      Seq(123456789L, -987654321L, 42L),
      Seq(1L),
      Seq.empty[Long]
    ).toDF("h")
    val r = df.select(
      VectorFunctions.stringArrayHashes(lit(null).cast("array<string>")), // exercise codegen path
      TextFunctions.minHashFromHashes(col("h"), 16).as("fast"),
      hofMin(col("h"), 16).as("hof")).collect()
    r.foreach { row =>
      assert(row.getSeq[Any](1) == row.getSeq[Any](2),
        s"fast=${row.getSeq[Any](1)} hof=${row.getSeq[Any](2)}")
    }
  }

  test("stringArrayHashes matches transform(arr, xxhash64)") {
    val df = Seq(
      Seq("alpha beta", "gamma", ""),
      Seq("ação coração"),
      Seq.empty[String]
    ).toDF("s")
    val r = df.select(
      VectorFunctions.stringArrayHashes(col("s")).as("fast"),
      transform(col("s"), x => xxhash64(x)).as("hof")).collect()
    r.foreach(row => assert(row.getSeq[Long](0) == row.getSeq[Long](1)))
  }

  test("arrayMd5H60 matches transform(arr, conv(substring(md5,1,15),16,10))") {
    val df = Seq(
      Seq("alpha beta", "gamma", ""),
      Seq("ação coração"),
      Seq.empty[String]
    ).toDF("s")
    val r = df.select(
      VectorFunctions.stringArrayMd5H60(col("s")).as("fast"),
      transform(col("s"),
        x => conv(substring(md5(x), 1, 15), 16, 10).cast("long")).as("hof")).collect()
    r.foreach(row => assert(row.getSeq[Long](0) == row.getSeq[Long](1)))
  }

  test("simHashFromHashes matches the explode + per-bit vote aggregation") {
    def aggSim(hashes: Seq[Long], bits: Int): Long = {
      val votes = (0 until bits).map(b =>
        hashes.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum)
      (0 until bits).map(b => if (votes(b) > 0) 1L << b else 0L).reduce(_ | _)
    }
    val rows = Seq(
      Seq(123456789L, -987654321L, 42L, Long.MaxValue, Long.MinValue),
      Seq(7L))
    val df = rows.toDF("h")
    for (bits <- Seq(60, 64)) {
      val fast = df.select(
        VectorFunctions.simHashFromHashes(col("h"), bits)).collect().map(_.getLong(0))
      assert(fast.toSeq == rows.map(aggSim(_, bits)))
    }
  }

  test("simHash64 HOF form matches the kernel signature path") {
    val df = Seq("the quick brown fox jumps", "over the lazy dog").toDF("text")
    val hof = df.select(TextFunctions.simHash64(col("text"))).collect().map(_.getLong(0))
    val kernel = df.select(VectorFunctions.simHashFromHashes(
      VectorFunctions.stringArrayHashes(
        array_distinct(TextFunctions.tokens(TextFunctions.normalized(col("text"))))),
      64)).collect().map(_.getLong(0))
    assert(hof.toSeq == kernel.toSeq)
  }

  test("tokens: blank → empty, null → null, interior whitespace split") {
    val df = Seq(Some("  a  b\tc "), Some("   "), Some(""), None).toDF("t")
    val r = df.select(TextFunctions.tokens(col("t"))).collect()
    assert(r(0).getSeq[String](0) == Seq("a", "b", "c"))
    assert(r(1).getSeq[String](0) == Seq.empty)
    assert(r(2).getSeq[String](0) == Seq.empty)
    assert(r(3).isNullAt(0))
  }

  test("quantized kernels reject wrong element types at ANALYSIS time") {
    // cosine_q on a raw double embedding would reinterpret IEEE bits via
    // getLong and return a garbage cosine — must fail analysis instead
    val dbl = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      dbl.select(VectorFunctions.cosineOfQuantized(col("a"), col("b"))).collect()
    }
    assert(e1.getMessage.contains("cosine_q"), e1.getMessage)
    // quantize_floor on array<bigint> would misread via getDouble
    val lng = Seq(Tuple1(Seq(1L, 2L))).toDF("v")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      lng.select(VectorFunctions.quantizeFloor(col("v"), 4)).collect()
    }
    assert(e2.getMessage.contains("quantize_floor"), e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      dbl.select(VectorFunctions.sqDistToLit(col("a"), Seq(1L, 2L))).collect()
    }
    assert(e3.getMessage.contains("sq_dist_lit"), e3.getMessage)
    // the sanctioned inputs still pass: quantize floats, then cosine_q
    val ok = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorFunctions.cosineOfQuantized(
        VectorFunctions.quantizeFloor(col("a"), 1 << 20),
        VectorFunctions.quantizeFloor(col("b"), 1 << 20)).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
  }

  test("nearestCentroid matches the k-literal least(struct(sq_dist_lit)) " +
    "chain it replaced: same distances, lowest-cid tie-break, null " +
    "struct on malformed (null element / length mismatch)") {
    val cents = Array(Array(0L, 0L, 0L), Array(10L, 0L, 0L),
      Array(0L, 10L, 0L), Array(10L, 0L, 0L)) // cid 3 duplicates cid 1
    def oldChain(q: org.apache.spark.sql.Column) =
      least(cents.zipWithIndex.map { case (c, j) =>
        struct(VectorFunctions.sqDistToLit(q, c.toSeq).as("d"),
          lit(j.toLong).as("cid"))
      }.toSeq: _*)
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(1L), Some(0L)))),   // nearest 0
      (2L, Some(Seq(Some(9L), Some(1L), Some(0L)))),   // nearest 1 (tie w/ 3)
      (3L, Some(Seq(Some(5L), Some(5L), Some(0L)))),   // 0/1/2 equidistant → 0
      (4L, Some(Seq(Some(1L), None, Some(0L)))),       // null element
      (5L, Some(Seq(Some(1L), Some(1L)))),             // length mismatch
      (6L, None)                                       // null vector
    ).toDF("id", "q")
    val rows = df.select(col("id"),
        VectorFunctions.nearestCentroid(col("q"), cents).as("n"),
        oldChain(col("q")).as("o"))
      .collect().map { r =>
        def f(i: Int) = if (r.isNullAt(i)) null
          else { val s = r.getStruct(i); (s.isNullAt(0), s.get(0), s.get(1)) }
        (r.getLong(0), f(1), f(2))
      }.map { case (id, n, o) => id -> ((n, o)) }.toMap
    assert(rows(1L)._1 == (false, 2L, 0L))
    assert(rows(2L)._1 == (false, 2L, 1L), "ties break to the lowest cid")
    assert(rows(3L)._1 == (false, 50L, 0L))
    assert(rows(4L)._1 == null && rows(5L)._1 == null && rows(6L)._1 == null)
    // parity with the old chain on every WELL-FORMED row (the old chain
    // yields struct(d=null) rather than a null struct on malformed —
    // both funnel into the same branded raise via checkedField)
    Seq(1L, 2L, 3L).foreach(id => assert(rows(id)._1 == rows(id)._2, s"id $id"))
  }

  test("nearestCells matches the array_sort(struct(d, cell)) probe " +
    "ranking: (distance, cid) rank order, nprobe clamped at k, " +
    "malformed vector → null (zero rows when exploded)") {
    val cents = Array(Array(0L, 0L), Array(4L, 0L), Array(0L, 4L),
      Array(4L, 0L)) // cid 3 duplicates cid 1 (tie must rank 1 first)
    def oldRank(q: org.apache.spark.sql.Column, nprobe: Int) =
      slice(array_sort(array(cents.zipWithIndex.map { case (c, j) =>
        struct(VectorFunctions.sqDistToLit(q, c.toSeq).as("d"),
          lit(j.toLong).as("cell"))
      }: _*)), 1, nprobe)
    val df = Seq(
      (1L, Some(Seq(Some(3L), Some(0L)))),
      (2L, Some(Seq(Some(1L), Some(3L)))),
      (3L, Some(Seq(Some(1L), None)))
    ).toDF("id", "q")
    for (nprobe <- Seq(1, 2, 3, 4, 9)) {
      val rows = df.select(col("id"),
          VectorFunctions.nearestCells(col("q"), cents, nprobe).as("n"),
          oldRank(col("q"), nprobe).as("o"))
        .collect().map { r =>
          (r.getLong(0),
            if (r.isNullAt(1)) null else r.getSeq[Long](1).toSeq,
            if (r.isNullAt(2)) null
            else r.getSeq[org.apache.spark.sql.Row](2).toSeq
              .map(s => s.getLong(1)))
        }
      rows.foreach { case (id, n, o) =>
        if (id == 3L) assert(n == null, "malformed vector must yield null")
        else {
          assert(n == o, s"id $id nprobe $nprobe: kernel $n vs chain $o")
          assert(n.length == math.min(nprobe, cents.length))
        }
      }
    }
    // spot-pin the semantic expectation, not just chain parity
    // q=(1,3): d(c0)=10, d(c1)=18, d(c2)=2, d(c3)=18 → ranks 2, 0, then
    // the 18-tie breaks to the lower cid 1
    val oneRow = df.filter(col("id") === 2L)
      .select(VectorFunctions.nearestCells(col("q"), cents, 3))
      .head.getSeq[Long](0).toSeq
    assert(oneRow == Seq(2L, 0L, 1L), s"(d,cid) rank order: $oneRow")
  }

  test("the argmin/probe kernels survive IVF-practice coarseK (4096 " +
    "cells) with codegen FORCED (no interpreted fallback, no Janino " +
    "64 KB blow-up) — and the values match a driver-side replay") {
    val k = 4096
    val dims = 64
    val cents = Array.tabulate(k)(j =>
      Array.tabulate(dims)(d => (j.toLong * 997 + d * 131) % 1000000))
    val spark0 = spark
    import spark0.implicits._
    val centsDf = cents.zipWithIndex
      .map { case (c, j) => (j.toLong, c.toSeq) }.toSeq.toDF("cid", "q")
    // a REAL parquet scan: a local-relation input would be constant-
    // folded at plan time (ConvertToLocalRelation evaluates the project
    // interpreted), silently skipping the codegen path this test pins
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("emb"))
    // driver replay: the same floor-quantization and argmin
    def quantOf(emb: Seq[Float]): Array[Long] =
      emb.map(x => math.floor(x.toDouble * (1 << 20)).toLong).toArray
    def argmin(q: Array[Long]): (Long, Long) = {
      var bd = Long.MaxValue; var bj = 0
      for (j <- 0 until k) {
        var s = 0L
        for (d <- 0 until dims) { val dx = q(d) - cents(j)(d); s += dx * dx }
        if (s < bd) { bd = s; bj = j }
      }
      (bj.toLong, bd)
    }
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    // fallback=false: a Janino compile failure THROWS instead of silently
    // running interpreted; factoryMode=CODEGEN_ONLY forces expression
    // codegen outside whole-stage too — together they PIN "no
    // interpreted fallback at coarseK 4096"
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val assigned = graft.operators.Cluster.assignStored(
        vecs, "vec_id", "emb", centsDf)
      // the `*(n)` prefix is executedPlan.toString's rendering of a
      // WholeStageCodegen span covering the node
      val plan = assigned.queryExecution.executedPlan.toString
      assert(plan.contains("*(") && plan.contains("Project"), plan)
      assigned.collect().foreach { r =>
        val emb = vecs.filter(col("vec_id") === r.getLong(0))
          .head.getSeq[Float](1)
        val (cid, d) = argmin(quantOf(emb))
        assert(r.getLong(2) == cid && r.getLong(3) == d,
          s"vec ${r.getLong(0)}")
      }
      // probe ranking at the same scale: top-nprobe matches the replay
      val nprobe = 5
      val probed = vecs.select(col("vec_id"),
          graft.functions.VectorFunctions.nearestCells(
            graft.operators.Cluster.quantizeFloor(col("emb")), cents,
            nprobe).as("cells"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      vecs.collect().foreach { r =>
        val q = quantOf(r.getSeq[Float](1))
        val expect = cents.indices.map { j =>
          var s = 0L
          for (d <- 0 until dims) { val dx = q(d) - cents(j)(d); s += dx * dx }
          (s, j.toLong)
        }.sorted.take(nprobe).map(_._2)
        assert(probed(r.getLong(0)) == expect, s"vec ${r.getLong(0)}")
      }
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("10^5-class coarseK (2^17 cells): the kernels stay correct and " +
    "O(1)-plan with codegen FORCED — the recorded crossover " +
    "(Cluster.KernelMatrixAdvisoryMaxLongs) is a stage-binary-size " +
    "decision, not a correctness cliff") {
    val k = 1 << 17 // 131072 cells — the watch-item's coarseK class
    val dims = 4    // k*dims = 2^19 longs (4 MiB matrix), under the advisory
    assert(k.toLong * dims <=
      graft.operators.Cluster.KernelMatrixAdvisoryMaxLongs)
    // centroid j sits at (j, j, j, j): argmin of any probe replays by
    // rounding, and ties are impossible off the diagonal midpoints
    val cents = Array.tabulate(k)(j => Array.fill(dims)(j.toLong))
    val spark0 = spark
    import spark0.implicits._
    val probes = Seq(0L, 17L, 99999L, 131071L, 65536L)
    // a parquet scan input, same rationale as the 4096 pin (a local
    // relation would constant-fold the project interpreted)
    val dir = java.nio.file.Files.createTempDirectory("vek17").toString
    probes.map(p => (p, Array.fill(dims)(p).toSeq)).toDF("id", "q")
      .write.mode("overwrite").parquet(dir)
    val vecs = spark.read.parquet(dir)
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = vecs.select(col("id"),
        VectorFunctions.nearestCentroid(col("q"), cents).as("a"),
        VectorFunctions.nearestCells(col("q"), cents, 3).as("cells"))
      // O(1) plan in coarseK: the matrix rides as ONE reference object —
      // a literal-chain plan at 2^17 cells would be megabytes of text
      // and break Janino long before printing
      val planChars = out.queryExecution.executedPlan.toString.length
      assert(planChars < 20000,
        s"plan must not grow with coarseK (got $planChars chars)")
      out.collect().foreach { r =>
        val p = r.getLong(0)
        assert(r.getStruct(1).getLong(1) == p, s"argmin of probe $p")
        assert(r.getStruct(1).getLong(0) == 0L)
        // nearest 3 cells of (p,p,p,p): p, then p±1 (tie at equal
        // distance breaks to the LOWER cid), clipped at the range ends
        val expect =
          if (p == 0L) Seq(0L, 1L, 2L)
          else if (p == (k - 1).toLong) Seq(p, p - 1, p - 2)
          else Seq(p, p - 1, p + 1)
        assert(r.getSeq[Long](2).toSeq == expect, s"cells of probe $p")
      }
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
