package graft.functions

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SchemaConformSpec extends AnyFunSuite {
  test("accent strip + snake case") {
    assert(SchemaConform.conformName("Nome Ação") == "nome_acao")
    assert(SchemaConform.conformName("Conta$Saldo") == "conta_saldo")
    assert(SchemaConform.conformName("  Já-Foi  ") == "ja_foi")
  }
  test("numeric-leading names get underscore prefix") {
    assert(SchemaConform.conformName("2024 total") == "_2024_total")
  }
  test("empty/symbol-only names fall back to col") {
    assert(SchemaConform.conformName("!!!") == "col")
  }
  test("collisions deduplicate with suffixes") {
    assert(SchemaConform.conformNames(Seq("a b", "A-B", "a_b")) ==
      Seq("a_b", "a_b_2", "a_b_3"))
  }
}

class RelativeDateSpec extends AnyFunSuite {
  private val anchor = LocalDate.of(2026, 8, 12)
  test("D-n / M-n / Y-n / today / yesterday / ISO") {
    assert(RelativeDate.resolve("D-7", anchor) == LocalDate.of(2026, 8, 5))
    assert(RelativeDate.resolve("M-1", anchor) == LocalDate.of(2026, 7, 1))
    assert(RelativeDate.resolve("Y-1", anchor) == LocalDate.of(2025, 1, 1))
    assert(RelativeDate.resolve("today", anchor) == anchor)
    assert(RelativeDate.resolve("yesterday", anchor) == anchor.minusDays(1))
    assert(RelativeDate.resolve("2024-02-29", anchor) == LocalDate.of(2024, 2, 29))
  }
  test("tumbling windows cover the range without overlap") {
    val ws = RelativeDate.tumblingWindows(
      LocalDate.of(2026, 1, 1), LocalDate.of(2026, 1, 10), 4)
    assert(ws == Seq(
      (LocalDate.of(2026, 1, 1), LocalDate.of(2026, 1, 4)),
      (LocalDate.of(2026, 1, 5), LocalDate.of(2026, 1, 8)),
      (LocalDate.of(2026, 1, 9), LocalDate.of(2026, 1, 10))))
  }
  test("unparseable token throws") {
    assertThrows[IllegalArgumentException](RelativeDate.resolve("W-1", anchor))
  }
}

class CpfSpec extends SparkSpec {
  test("known-valid CPFs pass (pure)") {
    assert(CpfUtil.isValidStr("529.982.247-25"))
    assert(CpfUtil.isValidStr("52998224725"))
  }
  test("checksum failures / blocklist / malformed rejected (pure)") {
    assert(!CpfUtil.isValidStr("52998224724"))   // bad check digit
    assert(!CpfUtil.isValidStr("111.111.111-11")) // all-same
    assert(!CpfUtil.isValidStr("01234567890"))   // ascending blocklist
    assert(!CpfUtil.isValidStr("1234567890"))    // 10 digits
    assert(!CpfUtil.isValidStr("abc"))
    assert(!CpfUtil.isValidStr(""))
  }
  test("expression evaluates through the DataFrame API with codegen") {
    import spark.implicits._
    val df = Seq("52998224725", "11111111111", "nope", null)
      .toDF("cpf").select(Cpf.isValid(col("cpf")).as("v"))
    assert(df.collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0)).toSeq
      == Seq(true, false, false, null))
  }
}

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token and subword counts") {
    val df = Seq("  hello  world ", "", "a b-c 42").toDF("t")
      .select(TextFunctions.tokenCount(col("t")).as("n"),
        TextFunctions.subwordCount(col("t")).as("s"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((2L, 2L), (0L, 0L), (3L, 5L)))
  }

  test("wordShingles guards short texts (< n tokens)") {
    val df = Seq("one two", "one two three four").toDF("t")
      .select(size(TextFunctions.wordShingles(col("t"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 2))
  }

  test("dupNgramRatio counts repeated windows; short text scores 0") {
    val df = Seq("a b a b a", "x y", "z").toDF("t")
      .select(TextFunctions.dupNgramRatio(col("t"), 2).as("r2"),
        TextFunctions.dupNgramRatio(col("t"), 3).as("r3"))
    val r = df.collect().map(x => (x.getDouble(0), x.getDouble(1))).toSeq
    // "a b a b a": 2-grams [ab, ba, ab, ba] → 2 distinct of 4 → 0.5
    //              3-grams [aba, bab, aba] → 2 distinct of 3 → 1 - 2/3
    assert(r(0) == ((0.5, 1.0 - 2.0 / 3.0)))
    // "x y": one 2-gram (no repeats) → 0; no 3-grams → 0
    assert(r(1) == ((0.0, 0.0)))
    assert(r(2) == ((0.0, 0.0)))
  }

  test("cdcBlocks: blocks partition the tokens; boundaries are shift-resistant") {
    // deterministic pseudo-words so some window hashes hit the mask
    val words = (1 to 400).map(i => s"w${(i * 2654435761L % 9973)}")
    val textA = words.mkString(" ")
    val textB = "inserted prefix tokens " + textA // shift by 3 tokens
    val df = Seq((1L, textA), (2L, textB)).toDF("id", "text")
      .select(col("id"), TextFunctions.cdcBlocks(col("text"), 4, 3).as("blocks"))
    val rows = df.collect().map(r =>
      r.getSeq[org.apache.spark.sql.Row](1).map(b =>
        (b.getLong(0), b.getLong(1), b.getLong(2)))).toSeq
    val (a, b) = (rows(0), rows(1))
    // partition property: contiguous, covers every token exactly once
    assert(a.map(_._2).sum == 400)
    assert(a.scanLeft(0L)((acc, blk) => acc + blk._2).init == a.map(_._1))
    // shift resistance: after the inserted prefix, boundaries resync and
    // most of A's block hashes reappear in B
    val shared = a.map(_._3).toSet.intersect(b.map(_._3).toSet)
    assert(shared.size >= a.size / 2, s"only ${shared.size} of ${a.size} blocks survived the shift")
  }

  test("fingerprint is normalization-invariant") {
    val df = Seq("Hello,   World!", "hello world").toDF("t")
      .select(TextFunctions.fingerprint(col("t")).as("fp"))
    val fps = df.collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("simhash identical texts → hamming 0; langId picks markers") {
    val df = Seq(("the cat and the dog is here", "the cat and the dog is here"))
      .toDF("a", "b")
      .select(TextFunctions.hamming64(TextFunctions.simHash64(col("a")),
        TextFunctions.simHash64(col("b"))).as("h"),
        TextFunctions.langId(col("a")).as("lang"))
    val r = df.collect().head
    assert(r.getInt(0) == 0)
    assert(r.getString(1) == "en")
  }

  test("quality score composes the three signals") {
    val good = "the quick brown fox jumps over the lazy dog and runs to the hills"
    val df = Seq(good, "x y").toDF("t")
      .select(TextFunctions.qualityScore(col("t")).as("q"))
    val qs = df.collect().map(_.getDouble(0))
    assert(qs(0) == 1.0)
    assert(qs(1) < 1.0)
  }

  test("redactPii masks CPF/e-mail/phone and counts them") {
    val txt = "Paciente 123.456.789-09, contato a.b@x.org ou (21) 98765-4321 fim"
    val df = Seq(txt, "nothing to hide").toDF("t")
    val counts = TextFunctions.piiCounts(col("t"))
    val r = df.select(TextFunctions.redactPii(col("t")).as("red"),
      counts(0)._2.as("c"), counts(1)._2.as("e"), counts(2)._2.as("p")).collect()
    assert(r(0).getString(0) == "Paciente [CPF], contato [EMAIL] ou [PHONE] fim")
    assert((r(0).getLong(1), r(0).getLong(2), r(0).getLong(3)) == ((1L, 1L, 1L)))
    assert(r(1).getString(0) == "nothing to hide")
    assert((r(1).getLong(1), r(1).getLong(2), r(1).getLong(3)) == ((0L, 0L, 0L)))
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, zero-norm safe") {
    val df = Seq(
      (Seq(1.0f, 0f, 0f), Seq(1.0f, 0f, 0f)),
      (Seq(1.0f, 0f, 0f), Seq(0f, 1.0f, 0f)),
      (Seq(0f, 0f, 0f), Seq(1.0f, 2f, 3f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b")).as("c"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.0, 0.0))
  }

  test("quantized dot is exact integer math") {
    val df = Seq((Seq(0.1f, 0.2f), Seq(0.3f, 0.4f))).toDF("a", "b")
      .select(VectorFunctions.dotQ(
        VectorFunctions.quantize(col("a"), 10),
        VectorFunctions.quantize(col("b"), 10)).as("d"))
    assert(df.collect().head.getLong(0) == (1 * 3 + 2 * 4))
  }

  test("seeded planes are reproducible") {
    assert(VectorFunctions.seededPlanes(4, 8, 7L) ==
      VectorFunctions.seededPlanes(4, 8, 7L))
  }
}

class ConformCollisionSpec extends AnyFunSuite {
  test("suffix generation never collides with later conformed names") {
    assert(SchemaConform.conformNames(Seq("a", "a", "a_2")) ==
      Seq("a", "a_2", "a_2_2"))
    assert(SchemaConform.conformNames(Seq("a", "a 2", "a")) ==
      Seq("a", "a_2", "a_3"))
  }
}

class ExtensionsSpec extends graft.SparkSpec {
  test("cpf_is_valid is callable from plain SQL after registration") {
    // getOrCreate returns the suite-shared session, so exercise the
    // register-on-existing-session path (the extensions class delegates to
    // the same registrations)
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cpf_is_valid('52998224725') AS a, cpf_is_valid('11111111111') AS b")
      .collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("vector/hash kernels are callable from plain SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
             array_xxhash64(array('a','b')) AS xh,
             array_md5h60(array('a')) AS mh,
             simhash(array_xxhash64(array('a','b')), 64) AS sh,
             minhash(array_xxhash64(array('a','b')), 4) AS mins""").collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getSeq[Long](1).size == 2)
    // md5('a') = 0cc175b9c0f1b6a8... → first 15 hex chars as a long
    assert(r.getSeq[Long](2).head == java.lang.Long.parseLong("0cc175b9c0f1b6a", 16))
    assert(r.getSeq[Long](4).size == 4)
  }

  test("quantized kernels are callable from plain SQL") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT quantize_floor(array(CAST(0.5 AS FLOAT), CAST(-0.3 AS FLOAT)), 4) AS q,
             cosine_q(array(3L, 4L), array(3L, 4L)) AS cq""").collect().head
    assert(r.getSeq[Long](0) == Seq(2L, -2L))
    assert(r.getDouble(1) == 1.0)
  }

  test("md5h60 SQL function matches the Column-API portable hash") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    val viaSql = spark.sql("SELECT md5h60('abc') AS h").collect().head.getLong(0)
    val viaCol = Seq("abc").toDF("s")
      .select(graft.functions.SketchFunctions.md5h60(org.apache.spark.sql.functions.col("s")))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
    assert(viaSql == java.lang.Long.parseLong("900150983cd24fb", 16)) // md5('abc') prefix
  }

  test("md5h60 SQL function stringifies non-string args like every Column-API user") {
    graft.GraftExtensions.register(spark)
    import spark.implicits._
    // a BIGINT id — the advertised splits/sampling/bucketing use case —
    // must hash the decimal string "42", exactly what
    // SketchFunctions.md5h60(col.cast("string")) and the DuckDB oracles'
    // md5(CAST(x AS VARCHAR)) produce
    val viaSql = spark.sql("SELECT md5h60(42L) AS h").collect().head.getLong(0)
    val viaCol = Seq(42L).toDF("x")
      .select(graft.functions.SketchFunctions.md5h60(
        org.apache.spark.sql.functions.col("x").cast("string")))
      .collect().head.getLong(0)
    assert(viaSql == viaCol)
  }
}
