package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Brazilian CPF checksum validation (reference:
  * pipelines/utils/validation.py:10-23 — digit-sequence blocklist + two
  * mod-11 check digits). Implemented as a codegen'd Catalyst `Expression`
  * rather than a Scala UDF: stays inside whole-stage codegen (no
  * serialization boundary, no closure dispatch per row) — at 100 TB this
  * runs on every row of every patient-keyed table.
  */
object CpfUtil {
  /** Branch-free-ish validation over the raw string: strips `.`/`-`,
    * requires exactly 11 digits, rejects all-same-digit sequences
    * (including the reference's 01234567890 blocklist entry), then checks
    * both mod-11 verification digits. Static method so generated code can
    * call it directly.
    */
  def isValid(s: UTF8String): Boolean = isValidStr(s.toString)

  def isValidStr(raw: String): Boolean = {
    val digits = new Array[Int](11)
    var n = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c >= '0' && c <= '9') {
        if (n == 11) return false
        digits(n) = c - '0'
        n += 1
      } else if (c != '.' && c != '-' && c != ' ') {
        return false
      }
      i = i + 1
    }
    if (n != 11) return false
    // reject constant sequences (000… … 999…) and the canonical fake
    var allSame = true
    var asc = true
    i = 1
    while (i < 11) {
      if (digits(i) != digits(0)) allSame = false
      if (digits(i) != (digits(0) + i) % 10) asc = false
      i += 1
    }
    if (allSame || asc) return false
    var s1 = 0
    i = 0
    while (i < 9) { s1 += digits(i) * (10 - i); i += 1 }
    val d1 = { val r = (s1 * 10) % 11; if (r == 10) 0 else r }
    if (d1 != digits(9)) return false
    var s2 = 0
    i = 0
    while (i < 10) { s2 += digits(i) * (11 - i); i += 1 }
    val d2 = { val r = (s2 * 10) % 11; if (r == 10) 0 else r }
    d2 == digits(10)
  }
}

/** `cpf_is_valid(col)` — null-safe, codegen'd. */
case class CpfIsValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    CpfUtil.isValid(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CpfUtil.isValid($c)")
  override protected def withNewChildInternal(newChild: Expression): CpfIsValid =
    copy(child = newChild)
  override def prettyName: String = "cpf_is_valid"
}

object Cpf {
  /** Column-API entry point: `df.filter(Cpf.isValid($"paciente_cpf"))`. */
  def isValid(c: Column): Column =
    Bridge.column(CpfIsValid(Bridge.expression(c)))

  /** Format a valid 11-digit CPF as xxx.xxx.xxx-xx (reference:
    * pipelines/reports/informes_seguranca/utils.py:39-44) — pure built-ins,
    * no UDF.
    */
  def format(c: Column): Column = {
    import org.apache.spark.sql.functions._
    concat(
      substring(c, 1, 3), lit("."),
      substring(c, 4, 3), lit("."),
      substring(c, 7, 3), lit("-"),
      substring(c, 10, 2))
  }
}
