package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement main for the BPE learner (BENCH_NOTES evidence):
  * learns `numMerges` merges over a documents table and prints wall time
  * for the learn (one corpus aggregation + merge iteration) and for the
  * APPLY kernels run with the learned table. The synthetic corpus
  * exhausts its learnable merges well under production vocab sizes, so
  * `padTo` widens the applied rank table with inert never-matching pairs
  * — the honest way to exercise the apply kernel's rank-map width on
  * this corpus (the claim under test: probes are O(1), width-invariant).
  * Usage: runMain graft.tools.BpeLearnBench <sfDir> [numMerges] [cap] [padTo] [batchTopK]
  */
object BpeLearnBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val cap = args.lift(2).map(_.toLong).getOrElse(2000000L)
    val batchTopK = args.lift(4).map(_.toInt).getOrElse(256)
    val exactBatching = args.lift(5).forall(_.toBoolean)
    val docs = graft.queries.Registry.table(spark, dir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.operators.TextAnalysis.bpeLearn(
      docs, numMerges = numMerges, maxDistinctWords = cap,
      batchTopK = batchTopK, exactBatching = exactBatching)
    val sec = (System.nanoTime() - t0) / 1e9
    val rounds = graft.operators.TextAnalysis.lastDistributedRounds

    // apply-kernel timing with the freshly learned table (the rank loop
    // exercised at full merge-table width): materialize every token of
    // the corpus through each codegen'd kernel
    import org.apache.spark.sql.functions.{col, size, sum}
    def applySec(c: org.apache.spark.sql.Column): (Double, Long) = {
      val a0 = System.nanoTime()
      val n = docs.select(sum(size(c)).as("n"))
        .collect().head.getLong(0)
      ((System.nanoTime() - a0) / 1e9, n)
    }
    val padTo = args.lift(3).map(_.toInt).getOrElse(0)
    val applied =
      if (padTo <= merges.size) merges
      else merges ++ (merges.size until padTo).map(i => (s"¤$i", s"¤$i"))
    val (wordSec, wordToks) =
      applySec(graft.functions.Bpe.tokens(col("text"), applied))
    val (byteSec, byteToks) =
      applySec(graft.functions.Bpe.tokensByteLevel(col("text"), applied))

    println(f"""{"tool":"BpeLearnBench","dir":"$dir","numMerges":$numMerges,""" +
      f""""cap":$cap,"batchTopK":$batchTopK,"exact":$exactBatching,"rounds":$rounds,""" +
      f""""learned":${merges.size},"applied":${applied.size},"sec":$sec%.3f,""" +
      f""""applyWordSec":$wordSec%.3f,"wordTokens":$wordToks,""" +
      f""""applyByteSec":$byteSec%.3f,"byteTokens":$byteToks,""" +
      f""""first5":"${merges.take(5).map(p => p._1 + "+" + p._2).mkString(" ")}"}""")
    spark.stop()
  }
}
