package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Single-pass data profiling: per-column row count, null count, distinct
  * estimate, and min/max — the engine half of the reference's post-load
  * validation/monitoring sweeps (reference:
  * pipelines/reports/alerta_atualizacao_tabelas/tasks.py:14-38 freshness
  * metadata checks; pipelines/reports/checks_bucket_files/tasks.py:16-29
  * per-source presence counts), generalized to one scan.
  *
  * ONE pass over the data no matter how many columns: every statistic is a
  * map-side-combinable aggregate in a single `agg` (the distinct estimate
  * is the bounded-state [[graft.functions.KmvDistinct]] sketch, k longs per
  * column — NOT an exact count-distinct, which would need a shuffle per
  * column). The wide single-row result is then unpivoted driver-free with
  * `stack`. At 100 TB this is the difference between one scan and
  * 2×columns scans.
  *
  * Values are stringified for min/max so heterogeneous columns share one
  * output schema; ordering is therefore lexicographic — deterministic and
  * portable, which is what a profile/oracle needs (don't feed it doubles
  * whose string forms differ across engines).
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        SketchFunctions.kmvDistinct(col(c), k).as(s"__dst_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', __total - `__cnt_$c`, `__dst_$c`, `__min_$c`, `__max_$c`"
    }.mkString(", ")
    row.selectExpr(
      "__total AS n_rows",
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, est_distinct, min_value, max_value)")
      .select("col_name", "n_rows", "n_nulls", "est_distinct", "min_value", "max_value")
  }
}
