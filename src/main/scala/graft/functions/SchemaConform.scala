package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.DataFrame

/** Column-name conformance: the reference lands every extracted table with
  * NFKD accent-stripped, lower-cased, `\W+`→`_` column names and a leading
  * `_` for names starting with a digit (reference:
  * pipelines/utils/data_cleaning.py:11-47, applied at
  * pipelines/datalake/utils/tasks.py:69-73). Here it is a pure driver-side
  * rename — zero cost in the physical plan (`df.toDF` only rewrites the
  * schema, no shuffle, no projection at runtime).
  */
object SchemaConform {

  /** NFKD-normalize and strip diacritics ("ação" → "acao"). */
  def stripAccents(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")

  /** Conform one column name: accent-strip + lower + non-word runs → `_`,
    * trim `_` runs at the edges, prefix `_` if it starts with a digit.
    */
  def conformName(name: String): String = {
    val base = stripAccents(name).toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    val nonEmpty = if (base.isEmpty) "col" else base
    if (nonEmpty.head.isDigit) "_" + nonEmpty else nonEmpty
  }

  /** Conform all column names, de-duplicating collisions with `_2`, `_3`…
    * suffixes so the resulting schema is valid (unique names).
    */
  def conformNames(names: Seq[String]): Seq[String] = {
    // membership-checked against every emitted name: a naive counter suffix
    // can itself collide (e.g. "a", "a", "a_2" → "a", "a_2", "a_2")
    val used = scala.collection.mutable.Set.empty[String]
    names.map { n =>
      val c = conformName(n)
      val unique =
        if (!used.contains(c)) c
        else Iterator.from(2).map(k => s"${c}_$k").find(!used.contains(_)).get
      used += unique
      unique
    }
  }

  /** Apply conformance to a DataFrame (metadata-only operation). */
  def conform(df: DataFrame): DataFrame =
    df.toDF(conformNames(df.columns.toSeq): _*)
}
