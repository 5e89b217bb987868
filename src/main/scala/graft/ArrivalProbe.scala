package graft

import org.apache.spark.sql.functions.col

/** Fixed-batch arrival probe for the stored-state flows — measures the
  * claim the persistent-index shapes exist to deliver: per-batch arrival
  * cost independent of the stored corpus size. Runs against two (or
  * more) fixtures whose `vec_id % 5 == 0` batch is IDENTICAL while the
  * `% 5 != 0` corpus grows (tools/make_probe_organic.py --fixed-batch
  * builds the grown one), builds an [[graft.flows.AnnIndex]] on each
  * corpus (untimed), then times `append` of the fixed batch — one
  * untimed warmup append to a throwaway index, then min-of-2 timed
  * appends to fresh indexes. Prints ONE JSON line; the recorded numbers
  * live in BENCH_NOTES.md beside the q81/q111 fixed-batch probes.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ArrivalProbe \
  *     /root/testdata/sf0.1 /tmp/graft_probe10x_fixedbatch"
  */
object ArrivalProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_probe10x_fixedbatch")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, appName = "graft-arrival-probe")
    val results = dirs.map { dir =>
      val emb = sources.Lake.table(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val corpus = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val scratch = java.nio.file.Files
        .createTempDirectory("graft_annprobe").toString
      def freshIndex(i: Int): String = {
        val root = s"$scratch/index$i"
        flows.AnnIndex.build(corpus, "vec_id", "embedding", root,
          dims = 64, coarseK = 4, coarseIters = 2, m = 4, k = 4, iters = 2)
        root
      }
      // appends mutate the index, so each rep gets its own prebuilt root
      val roots = (0 to 2).map(freshIndex)
      val times = roots.map { root =>
        System.gc()
        val t0 = System.nanoTime()
        flows.AnnIndex.append(batch, "vec_id", "embedding", root)
        (System.nanoTime() - t0) / 1e9
      }
      val corpusRows = corpus.count()
      System.err.println(f"[arrival-probe] $dir%-40s corpus $corpusRows%6d " +
        f"append ${times.tail.min}%6.3f s (warmup ${times.head}%6.3f)")
      (dir, corpusRows, times.tail.min)
    }
    val qs = results.map { case (d, n, t) =>
      s"""{"dir":"$d","corpus_rows":$n,"append_sec":$t}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"ann_index_fixed_batch_append","unit":"sec","runs":$qs}""")
    spark.stop()
  }
}
