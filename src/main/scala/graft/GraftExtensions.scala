package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayMd5H60, ArrayXxHash64, CosineSimilarity,
  CpfIsValid, KmvDistinct, MinHashFromHashes, SimHashFromHashes}

/** Engine SQL surface: registers the custom Catalyst expressions so plain
  * `spark.sql` users get them by name — enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  * Registration injects the EXPRESSION (not a UDF wrapper), so calls stay
  * inside whole-stage codegen and constant-fold like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach(ext.injectFunction)
    // whole-operator planner rules (logical node → custom physical operator)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def reg(name: String, clazz: Class[_], arity: Int)(
      build: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        require(children.size == arity, s"$name takes exactly $arity argument(s)")
        build(children)
      })

  /** Literal-int helper for functions whose extra args must fold to plan-time
    * constants (k / bits).
    */
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private val IntegerType = org.apache.spark.sql.types.IntegerType

  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    reg("cpf_is_valid", classOf[CpfIsValid], 1)(c => CpfIsValid(c.head)),
    reg("cosine_sim", classOf[CosineSimilarity], 2)(c =>
      CosineSimilarity(c(0), c(1))),
    reg("array_xxhash64", classOf[ArrayXxHash64], 1)(c => ArrayXxHash64(c.head)),
    reg("array_md5h60", classOf[ArrayMd5H60], 1)(c => ArrayMd5H60(c.head)),
    reg("minhash", classOf[MinHashFromHashes], 2)(c =>
      MinHashFromHashes(c(0), litInt(c(1), "minhash k"))),
    reg("simhash", classOf[SimHashFromHashes], 2)(c =>
      SimHashFromHashes(c(0), litInt(c(1), "simhash bits"))),
    // aggregate: the analyzer wraps a bare AggregateFunction in
    // AggregateExpression(Complete) on resolution
    reg("kmv_distinct", classOf[KmvDistinct], 2)(c =>
      KmvDistinct(c(0), litInt(c(1), "kmv_distinct k"))),
    // the quantized-vector kernels (k-means / SemDeDup inner loops)
    reg("cosine_q", classOf[graft.functions.CosineLongQuantized], 2)(c =>
      graft.functions.CosineLongQuantized(c(0), c(1))),
    reg("quantize_floor", classOf[graft.functions.QuantizeFloorLong], 2)(c =>
      graft.functions.QuantizeFloorLong(c(0), litInt(c(1), "quantize_floor scale"))),
    reg("heavy_hitters", classOf[graft.functions.HeavyHitters], 2)(c =>
      graft.functions.HeavyHitters(c(0), litInt(c(1), "heavy_hitters k"))),
    // the portable 60-bit md5 hash (the cross-engine primitive every
    // portable pipeline shares) as a COMPOSED expression tree — built-in
    // nodes only, so it codegens and folds like any built-in. SQL models
    // run through ModelRunner can use it for splits/sampling/bucketing.
    reg("md5h60", classOf[org.apache.spark.sql.catalyst.expressions.Conv], 1) { c =>
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.{LongType, StringType}
      // STRINGIFY first (Cast to StringType), then to bytes: every Column-
      // API user of the portable hash and the DuckDB oracles hash the
      // decimal string form (md5(CAST(x AS VARCHAR))), so md5h60(42L) must
      // hash "42", not the 8 raw little-endian bytes — a direct
      // BINARY cast of a non-string arg would silently disagree (or fail
      // analysis), breaking the advertised splits/sampling/bucketing use
      Cast(Conv(Substring(Md5(Cast(Cast(c.head, StringType),
        org.apache.spark.sql.types.BinaryType)),
        Literal(1), Literal(15)), Literal(16), Literal(10)), LongType)
    })

  /** Register on a session that already exists (extensions configs only
    * apply at construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }
}
