package graft.flows

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{Cluster, Dedup, Relational}

/** End-to-end training-corpus build: the full document → training-sample
  * path, composed entirely from the engine's operators so each stage keeps
  * its scale contract (bucketed candidate generation, bounded-state
  * clustering, one-exchange packing, pushdown-safe filters):
  *
  *  1. quality gate       — `TextFunctions.qualityScore` threshold
  *  2. exact dedup        — content-fingerprint keep-lowest-id
  *  3. near-dup dedup     — MinHash+LSH pairs → connected components →
  *                          keep each cluster's canonical (minimum-id) doc
  *  3b. semantic curation — OPTIONAL (when an embeddings frame is given):
  *                          one deterministic k-means shared by SemDeDup's
  *                          within-cluster near-dup drop and the
  *                          SSL-prototypes outlier gate — catches
  *                          paraphrase-level duplicates the lexical
  *                          MinHash stage can't see
  *  3c. embedding near-dup — OPTIONAL (`cosineNearDupThreshold > 0`):
  *                          cosine-LSH pairs over the surviving docs'
  *                          embeddings → connected components → keep each
  *                          cluster's minimum-id doc. Routed through
  *                          [[graft.operators.Dedup.cosineNearDupPairs]],
  *                          whose DEFAULT is bounded bucket occupancy —
  *                          at corpus scale density hot-spots are
  *                          guaranteed, so the flow inherits the bounded
  *                          scheme without a call-site knob
  *  4. PII redaction      — chained codegen'd regex
  *  5. chunking           — fixed-size overlapping token windows
  *  6. sequence packing   — per-language context bins
  *  7. split assignment   — md5-bucket train/val/test, keyed by DOCUMENT
  *                          so every chunk of a doc stays in one split
  *                          (chunk-level splits leak near-identical text
  *                          across train and eval)
  *
  * Returns one row per chunk: (doc_id, lang, start, n_tokens, chunk,
  * bin_id, offset_in_bin, split).
  */
object TrainingCorpus {

  def build(
      docs: DataFrame,
      minQuality: Double = 0.3,
      jaccardThreshold: Double = 0.8,
      chunkTokens: Int = 512,
      overlap: Int = 64,
      binCapacity: Long = 2048L,
      trainPct: Int = 90,
      valPct: Int = 5,
      // (doc_id, embedding): semantic stage runs only when present
      embeddings: Option[DataFrame] = None,
      semClusters: Int = 16,
      semIters: Int = 3,
      semTau: Double = 0.9,
      semPruneFrac: Double = 0.0,
      // stage 3c: 0 = off; > 0 needs `embeddings` and `embeddingDim`
      cosineNearDupThreshold: Double = 0.0,
      embeddingDim: Int = 0): DataFrame = {
    require(cosineNearDupThreshold <= 0 ||
      (embeddings.nonEmpty && embeddingDim > 0),
      "cosineNearDupThreshold needs an embeddings frame and embeddingDim")

    val quality = docs
      .filter(TextFunctions.qualityScore(col("text")) >= minQuality)

    val exact = Dedup.exactDedup(quality, "doc_id", "text")

    // near-dup: candidate pairs above the threshold → transitive clusters →
    // survivors are docs that are their own cluster minimum (docs absent
    // from the pair graph are singletons and survive by default)
    val pairs = Dedup.minHashCandidatePairs(exact, "doc_id", "text")
      .filter(col("jaccard") >= jaccardThreshold)
    val clusters = Dedup.duplicateClusters(pairs)
    val canonical = exact
      .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
      .drop("cluster_id")

    // semantic curation over the lexical survivors only (embeddings of
    // already-dropped docs must not influence clustering)
    val curated = embeddings match {
      case Some(emb) =>
        // the lexical pipeline (quality filter → exact dedup → cluster
        // join) is referenced four times below (clamp count, kmeans input,
        // rejected anti-join, final filter) — materialize it ONCE; at lake
        // scale this is the intermediate table the flow would land anyway
        val canon = canonical.localCheckpoint()
        val embKept = emb.join(canon.select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        // k-means init needs k vectors; a small (or empty) embedded subset
        // clamps k rather than failing the whole build
        val k = math.min(semClusters.toLong, embKept.count()).toInt
        val survivors =
          if (k == 0) embKept.select(col("doc_id"), lit(0L).as("cid"))
          else Cluster.semanticCurate(embKept, "doc_id", "embedding",
            k, semIters, semTau, semPruneFrac)
        // drop only docs the semantic stage JUDGED and rejected — a doc
        // with no embedding row passes through (absence of evidence)
        val rejected = embKept.select(col("doc_id"))
          .join(survivors.select(col("doc_id")), Seq("doc_id"), "left_anti")
        val afterSem = canon.join(rejected, Seq("doc_id"), "left_anti")
        if (cosineNearDupThreshold <= 0) afterSem
        else {
          // stage 3c over the semantic survivors only: cosine-LSH pairs
          // (bounded-occupancy default), transitive clusters, keep each
          // cluster's minimum-id doc; a doc with no embedding row passes
          // through, same evidence rule as 3b
          val embLeft = emb.join(afterSem.select(col("doc_id")),
            Seq("doc_id"), "left_semi")
          val cosPairs = Dedup.cosineNearDupPairs(embLeft, "doc_id",
            "embedding", embeddingDim, cosineNearDupThreshold)
          val cosClusters = Dedup.duplicateClusters(
            cosPairs.select(col("id_a"), col("id_b")))
          afterSem
            .join(cosClusters.withColumnRenamed("id", "doc_id"),
              Seq("doc_id"), "left")
            .filter(col("cluster_id").isNull ||
              col("cluster_id") === col("doc_id"))
            .drop("cluster_id")
        }
      case None => canonical
    }

    val redacted = curated
      .withColumn("clean_text", TextFunctions.redactPii(col("text")))

    val chunks = redacted
      .select(col("doc_id"), col("lang"),
        explode(TextFunctions.chunkByTokens(col("clean_text"),
          chunkTokens, overlap)).as("c"))
      .select(col("doc_id"), col("lang"), col("c.start").as("start"),
        col("c.n_tokens").as("chunk_tokens"), col("c.chunk").as("chunk"))

    // packSequences owns the `n_tokens` output name; feed it the chunk's
    // token count under a scratch name and drop it afterwards.
    Relational.packSequences(chunks, Seq("lang"),
        Seq(col("doc_id"), col("start")), col("chunk_tokens"), binCapacity)
      .select(col("doc_id"), col("lang"), col("start"), col("n_tokens"),
        col("chunk"), col("bin_id"), col("offset_in_bin"))
      .withColumn("split",
        Relational.splitAssign(col("doc_id"), trainPct, valPct))
  }
}
