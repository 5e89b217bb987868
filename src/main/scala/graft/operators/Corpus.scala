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

  /** Above this vocabulary size [[vocabOov]] switches from the IN-list
    * literal to the broadcast anti-join path: a V-term literal bloats the
    * analyzed plan and the generated code linearly in V, while a broadcast
    * hash set is O(V) memory once per executor.
    */
  val VocabInListThreshold: Int = 4096

  /** Per-document out-of-vocabulary rate against the top-`vocabSize`
    * corpus vocabulary — the tokenizer-coverage signal that decides
    * whether a source needs its own vocab or gets filtered.
    *
    * Scale shape, demo V (≤ `inListThreshold`): the vocabulary collects to
    * a literal IN-list and the per-document count is a stateless codegen'd
    * array filter on the scan — the ONLY shuffle is the vocabulary
    * aggregate itself. Production V (tokenizer vocabs are 32k–256k): the
    * vocabulary stays a frame; OOV tokens are found by explode + BROADCAST
    * left-anti join and re-aggregated per document — plan size independent
    * of V, the vocab ships once per executor. Both paths produce identical
    * values. EAGER on the literal path (runs the vocab job at call time,
    * two-phase like [[Similarity.annTopK]]'s tier probe); lazy on the
    * broadcast path. Returns (id, n_tokens, n_oov, oov_rate).
    */
  def vocabOov(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, inListThreshold: Int = VocabInListThreshold): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val nTok = size(toks).cast("long")
    if (vocabSize <= inListThreshold) {
      val vocab = vocabulary(df, textCol, vocabSize)
        .collect().map(_.getString(0)).toSeq
      val nOov = size(filter(toks, t => !t.isInCollection(vocab))).cast("long")
      df.select(col(idCol), nTok.as("n_tokens"), nOov.as("n_oov"),
        when(nTok > 0, nOov.cast("double") / nTok.cast("double"))
          .otherwise(lit(0.0)).as("oov_rate"))
    } else {
      Relational.requireFreshColumns(df.select(col(idCol)),
        Seq("token", "n_tokens", "n_oov", "oov_rate"), "vocabOov")
      val vocab = vocabulary(df, textCol, vocabSize).select(col("token"))
      val base = df.select(col(idCol), nTok.as("n_tokens"), toks.as("__toks"))
      val oovCounts = base
        .select(col(idCol), explode(col("__toks")).as("token"))
        .join(broadcast(vocab), Seq("token"), "left_anti")
        .groupBy(col(idCol)).agg(count(lit(1)).as("__oov"))
      // docs with zero OOV tokens (or an empty token array) vanish from the
      // anti-join side — the left join + coalesce restores their 0; a null
      // token array stays null n_oov, matching the literal path's
      // size(filter(null)) = null
      base.join(oovCounts, Seq(idCol), "left")
        .select(col(idCol), col("n_tokens"),
          when(col("n_tokens").isNull, lit(null).cast("long"))
            .otherwise(coalesce(col("__oov"), lit(0L))).as("n_oov"),
          when(col("n_tokens") > 0,
            coalesce(col("__oov"), lit(0L)).cast("double") /
              col("n_tokens").cast("double"))
            .otherwise(lit(0.0)).as("oov_rate"))
    }
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
    // the result carries cluster_id + split, so an idCol by either name
    // would collide; and the clusters side is aliased (__cl_*) so
    // idCol == "id" can't make the post-join references ambiguous
    Relational.requireFreshColumns(docs.select(col(idCol)),
      Seq("cluster_id", "split"), "leakageSafeSplit")
    val cl = clusters.select(col("id").as("__cl_id"),
      col("cluster_id").as("__cl_cluster"))
    docs.select(col(idCol))
      .join(cl, col(idCol) === col("__cl_id"), "left")
      .select(col(idCol),
        coalesce(col("__cl_cluster"), col(idCol)).as("cluster_id"))
      .withColumn("split",
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
