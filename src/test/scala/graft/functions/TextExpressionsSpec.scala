package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-parity: the codegen'd CDC kernel must reproduce the HOF
  * composition's blocks exactly — boundaries, token counts, and 60-bit
  * md5 block hashes — so q91's oracle and any persisted block table are
  * unchanged by the kernel swap.
  */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(texts: Seq[String], w: Int, maskBits: Int): Unit = {
    val df = texts.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val rows = df.select(
      TextFunctions.cdcBlocksFromTokens(col("toks"), w, maskBits).as("fast"),
      TextFunctions.cdcBlocksFromTokensHof(col("toks"), w, maskBits).as("hof"))
      .collect()
    rows.foreach { r =>
      val fast = r.getSeq[Row](0).map(b => (b.getLong(0), b.getLong(1), b.getLong(2)))
      val hof = r.getSeq[Row](1).map(b => (b.getLong(0), b.getLong(1), b.getLong(2)))
      assert(fast == hof)
    }
  }

  private val sample = Seq(
    "the quick brown fox jumps over the lazy dog again and again and again",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi",
    "a b a b a b a b a b a b a b a b a b a b a b a b",
    "single",
    "two tokens",
    "  ", // blank → empty token array → empty block array
    (1 to 300).map(i => s"tok${i % 37}").mkString(" "))

  test("cdc kernel ≡ HOF form across w/maskBits grid") {
    for (w <- Seq(1, 2, 4); mb <- Seq(1, 3, 4, 6))
      assertParity(sample, w, mb)
  }

  test("cdc blocks partition the token stream (fused kernel)") {
    val df = sample.toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    df.select(size(col("toks")).as("n"),
        TextFunctions.cdcBlocksFromTokens(col("toks"), 4, 3).as("blocks"))
      .collect()
      .foreach { r =>
        val n = r.getInt(0)
        val blocks = r.getSeq[Row](1).map(b => (b.getLong(0), b.getLong(1)))
        assert(blocks.map(_._2).sum == n.toLong)
        // contiguous, in order, no empties
        blocks.foldLeft(0L) { case (expectStart, (s, len)) =>
          assert(s == expectStart); assert(len > 0); s + len
        }
      }
  }

  test("null tokens inside the array: window containing a null never cuts; " +
    "block hash skips nulls like array_join") {
    val df = Seq(Tuple1(Seq[String]("aa", null, "bb", "cc", "dd", "ee")))
      .toDF("toks")
    val both = df.select(
      TextFunctions.cdcBlocksFromTokens(col("toks"), 2, 1).as("fast"),
      TextFunctions.cdcBlocksFromTokensHof(col("toks"), 2, 1).as("hof"))
      .collect().head
    val fast = both.getSeq[Row](0).map(b => (b.getLong(0), b.getLong(1), b.getLong(2)))
    val hof = both.getSeq[Row](1).map(b => (b.getLong(0), b.getLong(1), b.getLong(2)))
    assert(fast == hof)
  }

  test("null token array → null result (both forms)") {
    val df = Seq(Tuple1(null: Seq[String])).toDF("toks")
    val r = df.select(
      TextFunctions.cdcBlocksFromTokens(col("toks"), 2, 2).as("fast"),
      TextFunctions.cdcBlocksFromTokensHof(col("toks"), 2, 2).as("hof"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("non-string array fails at analysis") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("toks")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(TextFunctions.cdcBlocksFromTokens(col("toks"), 2, 2)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("cdc_blocks"))
  }

  test("shift-resistance: inserting one token only perturbs local blocks") {
    val base = (1 to 200).map(i => s"w${i % 53}").mkString(" ")
    val shifted = base.split(" ").patch(3, Seq("INSERTED"), 0).mkString(" ")
    val df = Seq(base, shifted).toDF("text")
      .select(TextFunctions.tokens(col("text")).as("toks"))
      .select(TextFunctions.cdcBlocksFromTokens(col("toks"), 4, 3).as("blocks"))
    val Array(b0, b1) = df.collect().map(_.getSeq[Row](0).map(_.getLong(2)).toSet)
    // most block hashes survive the insertion — the CDC property
    assert((b0 & b1).size * 2 > b0.size)
  }
}
