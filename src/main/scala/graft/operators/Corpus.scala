package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level statistics and gating for training-data assembly: the
  * vocabulary/coverage and quality-threshold steps that sit between raw
  * ingestion and the dedup/mixture stages (see [[graft.flows.TrainingCorpus]]
  * for the end-to-end order).
  */
object Corpus {

  /** Top-`size` vocabulary by global token frequency, ranked by
    * (count DESC, token ASC) — the deterministic total order makes the
    * cut identical in any engine. One map-side-combinable hash aggregate
    * over exploded tokens, then orderBy+limit → TakeOrderedAndProject
    * (bounded per-partition heaps, never a full sort).
    */
  def vocabulary(df: DataFrame, textCol: String, size: Int): DataFrame = {
    require(size > 0, s"vocabulary size must be positive, got $size")
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(size)
  }

  /** Per-document out-of-vocabulary rate against the top-`vocabSize`
    * corpus vocabulary — the tokenizer-coverage signal that decides
    * whether a source needs its own vocab or gets filtered.
    *
    * Scale shape: the vocabulary is bounded by construction (top-V), so it
    * collects to a literal IN-list and the per-document count is a
    * stateless codegen'd array filter on the scan — the ONLY shuffle is
    * the vocabulary aggregate itself. EAGER: runs the vocab job at call
    * time (two-phase, like [[Similarity.annTopK]]'s tier probe).
    * Returns (id, n_tokens, n_oov, oov_rate).
    */
  def vocabOov(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabulary(df, textCol, vocabSize)
      .collect().map(_.getString(0)).toSeq
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks).cast("long")
    val nOov = size(filter(toks, t => !t.isInCollection(vocab))).cast("long")
    df.select(col(idCol), nTok.as("n_tokens"), nOov.as("n_oov"),
      when(nTok > 0, nOov.cast("double") / nTok.cast("double"))
        .otherwise(lit(0.0)).as("oov_rate"))
  }

  /** Drop the bottom `dropFrac` of documents PER SOURCE by a score column —
    * the per-domain quality gate (a global cut would let a high-quality
    * source's floor displace a low-quality source's best). Keeps rows with
    * `cume_dist > dropFrac` over (score, id) — the tie-break by id makes
    * the ordering total, so the survivor set is deterministic and any
    * engine replays it; a single-row group survives (cume_dist = 1).
    *
    * One window over the (source)-partitioned shuffle — no self-join, no
    * percentile collect; skewed sources are one partition each, which at
    * 100 TB is the same bound any per-group window carries.
    */
  def qualityGate(df: DataFrame, idCol: String, groupCol: String,
      score: Column, dropFrac: Double): DataFrame = {
    require(dropFrac >= 0 && dropFrac < 1,
      s"dropFrac must be in [0,1), got $dropFrac")
    Relational.requireFreshColumns(df, Seq("__cd"), "qualityGate")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(score.asc, col(idCol).asc)
    df.withColumn("__cd", cume_dist().over(w))
      .filter(col("__cd") > dropFrac)
      .drop("__cd")
  }

  /** Leakage-safe train/val/test split: the split key is the document's
    * near-dup CLUSTER id, not the document id, so every member of a dup
    * cluster lands in the same split — a per-doc split leaks train text
    * into the eval set through its near-duplicates (the contamination
    * [[Dedup.decontaminate]] exists to remove). `clusters` is
    * (id, cluster_id) from [[Dedup.duplicateClusters]]; unclustered docs
    * (no near-dups) key by their own id. Same md5-bucket assignment as
    * [[Relational.splitAssign]] — stateless, engine-portable, stable
    * across corpus rebuilds.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      trainPct: Int, valPct: Int): DataFrame = {
    val withCluster = docs.select(col(idCol))
      .join(clusters, docs(idCol) === clusters("id"), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    withCluster.withColumn("split",
      Relational.splitAssign(col("cluster_id"), trainPct, valPct))
  }

  /** Cross-source duplication matrix: near-dup pair counts per unordered
    * source pair — the data-card view that tells you WHICH sources overlap
    * (a high src_a×src_b cell means one scrape mirrors the other, and the
    * mixture weights double-count it). `pairs` is (id_a, id_b) from any
    * near-dup detector; `meta` maps id → groupCol. Two broadcast-sized
    * joins against the pair list (pairs ≪ corpus), one hash aggregate.
    */
  def dupSourceMatrix(pairs: DataFrame, meta: DataFrame, idCol: String,
      groupCol: String): DataFrame = {
    val ga = meta.select(col(idCol).as("__ia"), col(groupCol).as("__ga"))
    val gb = meta.select(col(idCol).as("__ib"), col(groupCol).as("__gb"))
    pairs.join(ga, col("id_a") === col("__ia"))
      .join(gb, col("id_b") === col("__ib"))
      .select(least(col("__ga"), col("__gb")).as("src_lo"),
        greatest(col("__ga"), col("__gb")).as("src_hi"))
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
