package graft.flows

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Lake

class TrainingCorpusSpec extends SparkSpec {

  test("end-to-end corpus build: dedup'd, chunk-bounded, doc-level splits") {
    val docs = Lake.table(spark, sfDir, "documents")
    val corpus = TrainingCorpus.build(docs,
      minQuality = 0.1, jaccardThreshold = 0.8,
      chunkTokens = 64, overlap = 8, binCapacity = 256L).cache()

    assert(corpus.count() > 0)
    assert(corpus.columns.toSeq == Seq("doc_id", "lang", "start", "n_tokens",
      "chunk", "bin_id", "offset_in_bin", "split"))

    // chunk windows respect the token bound
    assert(corpus.filter(col("n_tokens") > 64).count() == 0)
    // (doc, start) unique — no duplicated chunks
    assert(corpus.groupBy("doc_id", "start").count()
      .filter(col("count") > 1).count() == 0)
    // split is assigned per DOCUMENT: every chunk of a doc shares it
    assert(corpus.groupBy("doc_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count() == 0)
    // all three splits appear and train dominates
    val splits = corpus.select("doc_id", "split").distinct()
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet == Set("train", "val", "test"), splits.toString)
    assert(splits("train") > splits("val") && splits("train") > splits("test"))
    corpus.unpersist()
  }

  test("semantic stage drops embedding near-dups; docs without embeddings pass through") {
    import spark.implicits._
    // three docs pass the lexical stages (distinct text); docs 1 and 2
    // carry near-identical embeddings → the semantic stage drops doc 2;
    // doc 3 has NO embedding row and must survive untouched
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river", "en"),
      (2L, "a completely different sentence with its own novel words here", "en"),
      (3L, "yet another unrelated document about trains and the weather", "en"))
      .toDF("doc_id", "text", "lang")
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.001f, 0.0f, 0.0f)))
      .toDF("doc_id", "embedding")

    val corpus = TrainingCorpus.build(docs,
      minQuality = 0.0, jaccardThreshold = 0.8,
      chunkTokens = 64, overlap = 8, binCapacity = 256L,
      embeddings = Some(emb), semClusters = 1, semIters = 2, semTau = 0.9)
    val kept = corpus.select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L))

    // asking for more clusters than embedded docs clamps k instead of
    // failing; with every point its own centroid nothing can drop
    val clamped = TrainingCorpus.build(docs,
      minQuality = 0.0, jaccardThreshold = 0.8,
      chunkTokens = 64, overlap = 8, binCapacity = 256L,
      embeddings = Some(emb), semClusters = 16, semIters = 2, semTau = 0.9)
    assert(clamped.select("doc_id").distinct().count() == 3)

    // without embeddings the same build keeps all three
    val plain = TrainingCorpus.build(docs,
      minQuality = 0.0, jaccardThreshold = 0.8,
      chunkTokens = 64, overlap = 8, binCapacity = 256L)
    assert(plain.select("doc_id").distinct().count() == 3)
  }

  test("stage 3c embedding near-dup: cosine clusters keep the minimum-id " +
    "doc; routed through the bounded-occupancy default") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog by the river", "en"),
      (2L, "a completely different sentence with its own novel words here", "en"),
      (3L, "yet another unrelated document about trains and the weather", "en"),
      (4L, "one more standalone text concerning gardens and morning light", "en"))
      .toDF("doc_id", "text", "lang")
    // docs 1/2 near-identical directions (cosine ≈ 1), 3 orthogonal,
    // 4 has NO embedding row and must pass through
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.999f, 0.001f, 0.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("doc_id", "embedding")
    // semTau = 0 disables the 3b drop so the 3c stage is what's tested;
    // semClusters = 1 keeps everything in one k-means cluster
    val corpus = TrainingCorpus.build(docs,
      minQuality = 0.0, jaccardThreshold = 0.8,
      chunkTokens = 64, overlap = 8, binCapacity = 256L,
      embeddings = Some(emb), semClusters = 1, semIters = 1, semTau = 2.0,
      cosineNearDupThreshold = 0.95, embeddingDim = 4)
    val kept = corpus.select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L), kept.toString)

    // the knob guard: threshold without dim/embeddings fails loudly
    intercept[IllegalArgumentException](TrainingCorpus.build(docs,
      cosineNearDupThreshold = 0.9))
  }
}
