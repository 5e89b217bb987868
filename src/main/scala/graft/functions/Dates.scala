package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/age column helpers mirroring the reference's scalar date logic. */
object Dates {

  /** Multi-format date parse — ISO `yyyy-MM-dd` or Brazilian `dd/MM/yyyy`,
    * dispatched on shape so it never throws under ANSI mode (reference:
    * pipelines/utils/time.py:119-166 tries formats in order and falls back
    * to a lenient parser).
    */
  def parseDateMulti(c: Column): Column =
    when(c.rlike("^\\d{4}-\\d{2}-\\d{2}"), to_date(c, "yyyy-MM-dd"))
      .when(c.rlike("^\\d{2}/\\d{2}/\\d{4}"), to_date(c, "dd/MM/yyyy"))
      .otherwise(lit(null).cast("date"))

  /** Age in whole years at `asOf`: year difference minus one when the
    * birthday hasn't happened yet (reference: pipelines/utils/time.py:169-232
    * computes exactly this flag-adjusted difference, not floor of fractional
    * months). Pure built-ins — codegen'd, no UDF.
    */
  def ageYears(birth: Column, asOf: Column): Column = {
    val notYet = (month(asOf) < month(birth)) ||
      (month(asOf) === month(birth) && dayofmonth(asOf) < dayofmonth(birth))
    (year(asOf) - year(birth) - when(notYet, 1).otherwise(0)).cast("int")
  }
}
