package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CpfIsValid

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
  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq((
    new FunctionIdentifier("cpf_is_valid"),
    new ExpressionInfo(classOf[CpfIsValid].getName, "cpf_is_valid"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "cpf_is_valid takes exactly one argument")
      CpfIsValid(children.head)
    }))

  /** Register on a session that already exists (extensions configs only
    * apply at construction time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }
}
