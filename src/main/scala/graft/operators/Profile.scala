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
    // Internal aliases are index-based, never derived from user column names,
    // so a name containing quotes/backticks can't break or inject into the
    // plan; names only ever appear as a `lit` value and inside `col(c)`.
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__cnt_$i"),
        SketchFunctions.kmvDistinct(col(c), k).as(s"__dst_$i"),
        min(col(c).cast("string")).as(s"__min_$i"),
        max(col(c).cast("string")).as(s"__max_$i"))
    } :+ count(lit(1)).as("__total")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // Typed unpivot: array-of-structs + explode (generator over ONE row).
    val entries = array(cols.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("col_name"),
        (col("__total") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__dst_$i").as("est_distinct"),
        col(s"__min_$i").as("min_value"),
        col(s"__max_$i").as("max_value"))
    }: _*)
    row.select(col("__total").as("n_rows"), explode(entries).as("e"))
      .select(col("e.col_name").as("col_name"), col("n_rows"),
        col("e.n_nulls").as("n_nulls"), col("e.est_distinct").as("est_distinct"),
        col("e.min_value").as("min_value"), col("e.max_value").as("max_value"))
  }
}
