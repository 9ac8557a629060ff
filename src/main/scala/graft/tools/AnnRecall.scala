package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.queries.Registry

/** ANN quality evidence harness: measures RECALL@k of the stored-index
  * approximate paths (IVF, IVF-PQ) against the exact brute-force cosine
  * ranking on the real `embeddings` fixture — the number that justifies
  * calling the index an ANN index rather than a lossy shortcut. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AnnRecall"
  *
  * Protocol: the Q lowest-id vectors are the query set (deterministic,
  * no RNG); ground truth is exact cosine top-k over the full corpus;
  * recall@k = |approx ∩ exact| / k averaged over queries. The self-match
  * is left in on BOTH sides (it cancels in the intersection). Results
  * are recorded in BENCH_NOTES.md; the oracle-gated q30/q58/q115/q151/
  * q152 own arithmetic correctness — this harness owns the
  * approximation-quality claim. */
object AnnRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val k = 10
    val nQueries = 20
    val emb = Registry.table(spark, sfDir, "embeddings")
      .filter(col("embedding").isNotNull).cache()
    val n = emb.count()

    val queryIds = emb.select(col("vec_id")).orderBy(col("vec_id").asc)
      .limit(nQueries).collect().map(_.getLong(0))
    def queryOf(id: Long): DataFrame =
      emb.filter(col("vec_id") === id).select(col("embedding").as("qvec"))

    def ids(df: DataFrame): Set[Long] =
      df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

    val exact: Map[Long, Set[Long]] = queryIds.map { id =>
      id -> ids(Similarity.bruteForceTopK(emb, queryOf(id), k))
    }.toMap

    val dir = java.nio.file.Files.createTempDirectory("ann-recall").toString
    val ivfPath = s"$dir/ivf"
    val pqPath = s"$dir/ivfpq"
    Similarity.ivfWriteIndex(emb, ivfPath, nCells = 32,
      wholeCorpusQuantizer = true)
    Similarity.ivfpqWriteIndex(emb, pqPath, nCells = 32, m = 8, kSub = 32,
      wholeCorpusQuantizer = true)

    def recall(run: Long => DataFrame): Double =
      queryIds.map(id => (ids(run(id)) & exact(id)).size.toDouble / k)
        .sum / queryIds.length

    println(s"corpus=$n queries=$nQueries k=$k nCells=32")
    Seq(2, 4, 8, 16).foreach { p =>
      val r = recall(id => Similarity.ivfTopKFromIndex(
        spark, ivfPath, queryOf(id), k, nProbe = p))
      println(f"ivf nProbe=$p%-2d          recall@$k = $r%.3f")
    }
    Seq((4, 64), (4, 256), (8, 256)).foreach { case (p, sl) =>
      val r = recall(id => Similarity.ivfpqTopKFromIndex(
        spark, pqPath, queryOf(id), k, nProbe = p, shortlist = sl))
      println(f"ivfpq m=8 nProbe=$p shortlist=$sl%-3d recall@$k = $r%.3f")
    }
    // cleanup
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
    spark.stop()
  }
}
