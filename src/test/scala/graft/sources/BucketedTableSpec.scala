package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import graft.SparkSpec

/** Bucketed committed tables: the write-time shuffle elimination — two
  * same-bucketed tables join through SQL with NO exchange on either
  * side, and the answer is identical to the unbucketed plan's. */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  /** Force sort-merge joins: with CBO sizeInBytes honest, the tiny test
    * dim auto-broadcasts (its own feature, q150) and would mask the
    * bucketing evidence. */
  private def noBroadcast[A](body: => A): A = {
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // static plans for the assertions: AQE nests query stages that hide
    // the join from a plain collect, and the claim is about PLANNING
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
    }
  }

  /** AQE wraps the executed tree; collect() has run, so the final plan
    * is materialized and traversable. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-bkt-$tag").toString + "/t"

  private def facts() = (1L to 400L).map(i =>
    (i, s"c${i % 40}", if (i % 2 == 0) "A" else "B", i * 1.5))
    .toDF("id", "cust", "status", "amount")

  private def dims() = (0 until 40).map(i => (s"c$i", s"seg${i % 4}"))
    .toDF("cust", "segment").withColumn("status", lit("D"))

  test("same-bucketed join plans with ZERO shuffle exchanges; answer == unbucketed") {
    val fDir = freshDir("f"); val dDir = freshDir("d")
    val fPlain = freshDir("fp"); val dPlain = freshDir("dp")
    CommittedTable.write(facts(), fDir, "status",
      bucketBy = Some((8, Seq("cust"))))
    CommittedTable.write(dims(), dDir, "status",
      bucketBy = Some((8, Seq("cust"))))
    CommittedTable.write(facts(), fPlain, "status")
    CommittedTable.write(dims(), dPlain, "status")
    def q(f: String, d: String) = spark.sql(
      s"""SELECT d.segment, COUNT(*) AS n, SUM(f.amount) AS amt
          FROM graft.`$f` f JOIN graft.`$d` d ON f.cust = d.cust
          GROUP BY d.segment ORDER BY d.segment""")
    noBroadcast {
    val bucketed = q(fDir, dDir)
    val plain = q(fPlain, dPlain)
    assert(bucketed.collect().toSeq === plain.collect().toSeq)
    // the STATIC plan: a sort-merge join with no ShuffleExchange below it
    val sparkPlan = finalPlan(bucketed)
    val smj = sparkPlan.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.isDefined, s"expected SortMergeJoin, got:\n$sparkPlan")
    val shufflesUnderJoin = smj.get.collect { case e: ShuffleExchangeExec => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join must not shuffle either side:\n$sparkPlan")
    // the unbucketed twin DOES shuffle — the comparison that proves the
    // bucketing (not some other rewrite) removed the exchanges
    val plainSmj = finalPlan(plain)
      .collectFirst { case j: SortMergeJoinExec => j }
    assert(plainSmj.exists(_.collect {
      case e: ShuffleExchangeExec => e }.nonEmpty))
    }
  }

  test("group-by on the bucket column aggregates without an exchange") {
    val dir = freshDir("agg")
    CommittedTable.write(facts(), dir, "status",
      bucketBy = Some((8, Seq("cust"))))
    val agg = spark.sql(
      s"SELECT cust, SUM(amount) AS amt FROM graft.`$dir` GROUP BY cust")
    val shuffles = agg.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"bucketed group-by must be exchange-free:\n${agg.queryExecution.executedPlan}")
    val expected = facts().groupBy($"cust").agg(sum($"amount"))
      .as[(String, Double)].collect().toMap
    assert(agg.as[(String, Double)].collect().toMap === expected)
  }

  test("merge and DML preserve the bucketed layout (files stay bucket-parseable)") {
    val dir = freshDir("dml")
    CommittedTable.write(
      facts().withColumn("version", lit(1L)), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      bucketBy = Some((8, Seq("cust"))))
    CommittedTable.merge(spark, dir,
      Seq((1L, "c1", "A", 999.0, 2L), (500L, "c7", "A", 50.0, 1L))
        .toDF("id", "cust", "status", "amount", "version"),
      "id", "version", "status")
    CommittedTable.update(spark, dir, $"id" === 2L,
      Map("amount" -> lit(0.0), "version" -> lit(2L)), "status",
      versionCol = Some("version"))
    CommittedTable.delete(spark, dir, $"id" === 3L, "status")
    // every live file still parses a bucket id
    val files = CommittedTable.read(spark, dir).inputFiles
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    val unparseable = files.filterNot(f =>
      BucketingUtils.getBucketId(new org.apache.hadoop.fs.Path(f).getName).isDefined)
    assert(unparseable.isEmpty, s"non-bucketed files after DML: ${unparseable.toSeq}")
    // and the post-DML join is still exchange-free + correct
    CommittedTable.write(dims(), freshDir("dm"), "status") // noise table unrelated
    val dDir = freshDir("d2")
    CommittedTable.write(dims(), dDir, "status", bucketBy = Some((8, Seq("cust"))))
    noBroadcast {
      val j = spark.sql(
        s"""SELECT d.segment, COUNT(*) AS n FROM graft.`$dir` f
            JOIN graft.`$dDir` d ON f.cust = d.cust GROUP BY d.segment""")
      j.collect()
      val smj = finalPlan(j)
        .collectFirst { case s: SortMergeJoinExec => s }
      assert(smj.exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"post-DML bucketed join must stay exchange-free:\n${finalPlan(j)}")
      val expect = CommittedTable.read(spark, dir).join(dims(), "cust")
        .groupBy($"segment").count().as[(String, Long)].collect().toMap
      assert(j.as[(String, Long)].collect().toMap === expect)
    }
  }

  test("merge-on-read preserves the bucketed layout: deltas bucket-parseable, join exchange-free, answers exact") {
    val dir = freshDir("mor")
    CommittedTable.write(facts().withColumn("version", lit(1L)), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      bucketBy = Some((8, Seq("cust"))))
    // MoR merge: in-place upserts + brand-new keys (delta segments +
    // deletion vector on a bucketed table)
    val newRows = (401L to 410L).map(i =>
      (i, s"c${i % 40}", if (i % 2 == 0) "A" else "B", i * 1.5, 1L))
      .toDF("id", "cust", "status", "amount", "version")
    CommittedTable.mergeMor(spark, dir,
      facts().filter($"id" % 10 === 1)
        .withColumn("amount", $"amount" + 100.0)
        .withColumn("version", lit(2L))
        .unionByName(newRows),
      "id", "version", "status")
    // MoR update: images land as a second delta generation
    CommittedTable.updateMor(spark, dir, $"id" % 25 === 2,
      Map("amount" -> lit(-1.0), "version" -> lit(3L)), "status",
      versionCol = Some("version"))
    // MoR delete: vector-only generation across base AND delta files
    CommittedTable.deleteMor(spark, dir, $"id" % 50 === 3, "status")
    // every live DATA file (base + delta dirs) still parses a bucket id
    val m = CommittedTable.manifestAt(spark, dir)
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataDirs = m.segments.toSeq.flatMap { case (pv, seg) =>
      seg +: CommittedTable.liveDeltas(m, pv).map(_.dir) }.distinct
    val unparseable = dataDirs.flatMap { d =>
      fsys.listStatus(new org.apache.hadoop.fs.Path(dir, d)).toSeq
        .map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith("."))
        .filterNot(n => BucketingUtils.getBucketId(n).isDefined)
        .map(n => s"$d/$n")
    }
    assert(unparseable.isEmpty, s"non-bucketed live files after MoR DML: $unparseable")
    assert(m.segments.keys.exists(p => CommittedTable.liveDeltas(m, p).nonEmpty),
      "expected live delta segments (the MoR publishes must not have rewritten)")
    // post-MoR join: exchange-free under the SMJ (the dv anti-join inside
    // the scan broadcasts — default threshold stays on; the OUTER join is
    // forced to sort-merge by hint so the bucket evidence can't be masked
    // by an auto-broadcast of the tiny dim)
    val dDir = freshDir("mor-d")
    CommittedTable.write(dims(), dDir, "status", bucketBy = Some((8, Seq("cust"))))
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val j = spark.sql(
        s"""SELECT /*+ SHUFFLE_MERGE(d) */ d.segment, COUNT(*) AS n,
              SUM(f.amount) AS amt
            FROM graft.`$dir` f JOIN graft.`$dDir` d ON f.cust = d.cust
            GROUP BY d.segment""")
      j.collect()
      val smj = finalPlan(j).collectFirst { case s: SortMergeJoinExec => s }
      assert(smj.isDefined, s"expected SortMergeJoin:\n${finalPlan(j)}")
      assert(smj.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"post-MoR bucketed join must stay exchange-free:\n${finalPlan(j)}")
      // replay oracle: merge, update, delete folded over the raw input
      val afterMerge = facts().withColumn("version", lit(1L))
        .withColumn("amount",
          when($"id" % 10 === 1, $"amount" + 100.0).otherwise($"amount"))
        .withColumn("version",
          when($"id" % 10 === 1, lit(2L)).otherwise($"version"))
        .unionByName(newRows)
      val expectDf = afterMerge
        .withColumn("amount",
          when($"id" % 25 === 2, lit(-1.0)).otherwise($"amount"))
        .withColumn("version",
          when($"id" % 25 === 2, lit(3L)).otherwise($"version"))
        .filter(!($"id" % 50 === 3))
      assert(CommittedTable.read(spark, dir)
          .select($"id", $"cust", $"status", $"amount", $"version")
          .as[(Long, String, String, Double, Long)].collect().toSet ===
        expectDf.select($"id", $"cust", $"status", $"amount", $"version")
          .as[(Long, String, String, Double, Long)].collect().toSet)
      val expect = expectDf.join(dims(), "cust").groupBy($"segment")
        .agg(count(lit(1)).as("n"), sum($"amount").as("amt"))
        .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(j.as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap === expect)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevA)
  }

  test("SQL birth: CTAS with buckets/bucketcols plans bucketed scans") {
    val wh = Files.createTempDirectory("graft-bkt-sql").toString
    val f = s"$wh/f"; val d = s"$wh/d"
    facts().createOrReplaceTempView("bkt_facts")
    dims().createOrReplaceTempView("bkt_dims")
    spark.sql(s"""CREATE TABLE graft.`$f` PARTITIONED BY (status)
      TBLPROPERTIES('buckets'='8', 'bucketcols'='cust')
      AS SELECT * FROM bkt_facts""")
    spark.sql(s"""CREATE TABLE graft.`$d` PARTITIONED BY (status)
      TBLPROPERTIES('buckets'='8', 'bucketcols'='cust')
      AS SELECT * FROM bkt_dims""")
    noBroadcast {
      val j = spark.sql(
        s"""SELECT d.segment, COUNT(*) AS n FROM graft.`$f` f
            JOIN graft.`$d` d ON f.cust = d.cust GROUP BY d.segment""")
      j.collect()
      val smj = finalPlan(j).collectFirst { case s: SortMergeJoinExec => s }
      assert(smj.exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty),
        s"CTAS-born bucketed join must be exchange-free:\n${finalPlan(j)}")
    }
    // buckets without bucketcols fails loudly
    val e = intercept[Exception] {
      spark.sql(s"""CREATE TABLE graft.`$wh/bad` PARTITIONED BY (status)
        TBLPROPERTIES('buckets'='8') AS SELECT * FROM bkt_facts""")
    }
    assert(e.getMessage.contains("bucketcols"))
  }

  test("empty buckets (missing files) read and join correctly") {
    // 2 distinct keys into 8 buckets: most buckets have NO file at all —
    // the bucketed read must treat them as empty, not fail or drop rows
    val f = freshDir("empty-f"); val d = freshDir("empty-d")
    CommittedTable.write(
      Seq((1L, "k1", "A", 1.0), (2L, "k2", "A", 2.0), (3L, "k1", "B", 3.0))
        .toDF("id", "cust", "status", "amount"),
      f, "status", bucketBy = Some((8, Seq("cust"))))
    CommittedTable.write(
      Seq(("k1", "s1"), ("k2", "s2")).toDF("cust", "segment")
        .withColumn("status", lit("D")),
      d, "status", bucketBy = Some((8, Seq("cust"))))
    noBroadcast {
      val j = spark.sql(
        s"""SELECT f.id, d.segment FROM graft.`$f` f
            JOIN graft.`$d` d ON f.cust = d.cust ORDER BY f.id""")
      assert(j.as[(Long, String)].collect().toSeq ===
        Seq((1L, "s1"), (2L, "s2"), (3L, "s1")))
      val smj = finalPlan(j).collectFirst { case s: SortMergeJoinExec => s }
      assert(smj.exists(_.collect { case e: ShuffleExchangeExec => e }.isEmpty))
    }
  }

  test("contracts: bucket column must exist; partition column refused") {
    val dir = freshDir("guard")
    intercept[IllegalArgumentException] {
      CommittedTable.write(facts(), dir, "status",
        bucketBy = Some((8, Seq("nope"))))
    }
    intercept[IllegalArgumentException] {
      CommittedTable.write(facts(), freshDir("guard2"), "status",
        bucketBy = Some((8, Seq("status"))))
    }
  }
}
