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
}
