package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off measurement main for the BPE learner (BENCH_NOTES evidence):
  * learns `numMerges` merges over a documents table and prints wall time
  * for (a) the one corpus aggregation and (b) the merge-iteration phase.
  * Usage: runMain graft.tools.BpeLearnBench <sfDir> [numMerges] [cap]
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
    val docs = graft.queries.Registry.table(spark, dir, "documents")
    val t0 = System.nanoTime()
    val merges = graft.operators.TextAnalysis.bpeLearn(
      docs, numMerges = numMerges, maxDistinctWords = cap)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"tool":"BpeLearnBench","dir":"$dir","numMerges":$numMerges,""" +
      f""""cap":$cap,"learned":${merges.size},"sec":$sec%.3f,""" +
      f""""first5":"${merges.take(5).map(p => p._1 + "+" + p._2).mkString(" ")}"}""")
    spark.stop()
  }
}
