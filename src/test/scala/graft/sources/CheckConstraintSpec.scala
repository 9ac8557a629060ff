package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CHECK constraints on committed tables: write-time enforcement across
  * every row-writing verb, SQL NULL-passes semantics, abort-leaves-table-
  * unchanged, existing-data validation at declare time, and the SQL
  * TBLPROPERTIES route. */
class CheckConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-check-$tag").toString + "/t"

  private def base() = Seq(
    (1L, "A", 10.0), (2L, "A", 20.0), (3L, "B", 30.0))
    .toDF("id", "status", "value")
    .withColumn("version", lit(1L))

  private def content(dir: String): Set[(Long, Double)] =
    CommittedTable.read(spark, dir)
      .select($"id", $"value").as[(Long, Double)].collect().toSet

  private def gen(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).get.gen
  }

  test("a violating birth is refused; a clean one records the checks") {
    val dir = freshDir("birth")
    val e = intercept[IllegalStateException] {
      CommittedTable.write(base().withColumn("value", $"value" - 50.0),
        dir, "status", checks = Seq("positive_value" -> "value >= 0"))
    }
    assert(e.getMessage.contains("positive_value"))
    // the aborted birth left NO table
    val p = new org.apache.hadoop.fs.Path(dir)
    assert(CommittedTable.readManifest(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration), p).isEmpty)
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      checks = Seq("positive_value" -> "value >= 0"))
    assert(content(dir).size === 3)
  }

  test("merge, update and mergeClauses all enforce; the table is unchanged after an abort") {
    val dir = freshDir("verbs")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      checks = Seq("positive_value" -> "value >= 0"))
    val before = content(dir); val g0 = gen(dir)
    intercept[IllegalStateException] {
      CommittedTable.merge(spark, dir,
        Seq((9L, "A", -1.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
    intercept[IllegalStateException] {
      CommittedTable.update(spark, dir, $"id" === 1L,
        Map("value" -> lit(-5.0), "version" -> lit(2L)), "status",
        versionCol = Some("version"))
    }
    intercept[IllegalStateException] {
      CommittedTable.mergeClauses(spark, dir,
        Seq((1L, -3.0)).toDF("id", "sval"),
        matched = Seq(CommittedTable.MatchedUpdate(None,
          Map("value" -> expr("s.sval"), "version" -> expr("t.version + 1")))))
    }
    assert(content(dir) === before)
    assert(gen(dir) === g0) // no generation burned by any abort
    // a CLEAN merge passes and the next GC sweeps the aborted stagings
    CommittedTable.merge(spark, dir,
      Seq((9L, "A", 1.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(content(dir) === before + ((9L, 1.0)))
  }

  test("SQL CHECK semantics: NULL passes, FALSE fails") {
    val dir = freshDir("null")
    CommittedTable.write(
      Seq((1L, "A", Some(10.0)), (2L, "A", Option.empty[Double]))
        .toDF("id", "status", "value"),
      dir, "status", checks = Seq("positive_value" -> "value >= 0"))
    assert(CommittedTable.read(spark, dir).count() === 2) // NULL row passed
  }

  test("setChecks validates existing rows (early-exit) and resolves expressions up front") {
    val dir = freshDir("declare")
    CommittedTable.write(base(), dir, "status")
    val eData = intercept[IllegalStateException] {
      CommittedTable.setChecks(spark, dir, Seq("big" -> "value >= 15"))
    }
    assert(eData.getMessage.contains("existing rows"))
    val eExpr = intercept[IllegalArgumentException] {
      CommittedTable.setChecks(spark, dir, Seq("typo" -> "no_such_col > 0"))
    }
    assert(eExpr.getMessage.contains("typo"))
    CommittedTable.setChecks(spark, dir, Seq("positive_value" -> "value >= 0"))
    intercept[IllegalStateException] {
      CommittedTable.merge(spark, dir,
        Seq((9L, "A", -1.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
    // clearing the checks re-admits anything
    CommittedTable.setChecks(spark, dir, Nil)
    CommittedTable.merge(spark, dir,
      Seq((9L, "A", -1.0, 2L)).toDF("id", "status", "value", "version"),
      "id", "version", "status")
    assert(content(dir).contains((9L, -1.0)))
  }

  test("SQL route: CTAS check:* property + ALTER SET TBLPROPERTIES add/replace/drop") {
    val wh = Files.createTempDirectory("graft-check-sql").toString
    val dir = s"$wh/t"
    base().createOrReplaceTempView("check_src")
    spark.sql(
      s"""CREATE TABLE graft.`$dir`
          PARTITIONED BY (status)
          TBLPROPERTIES('keycol'='id', 'vercol'='version',
                        'check:positive_value'='value >= 0')
          AS SELECT * FROM check_src""")
    val e = intercept[Exception] {
      spark.sql(s"UPDATE graft.`$dir` SET value = -9.0, " +
        "version = version + 1 WHERE id = 1")
    }
    assert(e.getMessage.contains("positive_value"))
    // add a second check via ALTER; violating insert now names it
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES" +
      "('check:small_id'='id < 1000')")
    val e2 = intercept[Exception] {
      spark.sql(s"INSERT INTO graft.`$dir` VALUES (5000, 'A', 1.0, 1)")
    }
    assert(e2.getMessage.contains("small_id"))
    // drop it (empty value); the same insert passes
    spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES('check:small_id'='')")
    spark.sql(s"INSERT INTO graft.`$dir` VALUES (5000, 'A', 1.0, 1)")
    assert(CommittedTable.read(spark, dir).filter($"id" === 5000L).count() === 1)
    // an ALTER declaring a check the existing data violates is refused
    val e3 = intercept[Exception] {
      spark.sql(s"ALTER TABLE graft.`$dir` SET TBLPROPERTIES" +
        "('check:tiny'='value >= 15')")
    }
    assert(e3.getMessage.contains("existing rows"))
  }

  test("CALL graft.vacuum sweeps an aborted publish's orphaned staging") {
    val dir = freshDir("vacuum")
    CommittedTable.write(base(), dir, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      checks = Seq("positive_value" -> "value >= 0"))
    intercept[IllegalStateException] {
      CommittedTable.merge(spark, dir,
        Seq((9L, "A", -1.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
    def segDirs(): Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("seg-")).toSet
      } finally s.close()
    }
    val withOrphans = segDirs()
    spark.sql(s"CALL graft.vacuum(table => '$dir')")
    val after = segDirs()
    assert(after.subsetOf(withOrphans) && after.size < withOrphans.size,
      s"vacuum should sweep the aborted gen-2 staging: $withOrphans -> $after")
    assert(content(dir).size === 3) // live data untouched
  }

  test("checks survive clone and keep enforcing on the clone") {
    val src = freshDir("clsrc"); val dst = freshDir("cldst")
    CommittedTable.write(base(), src, "status",
      keyCol = Some("id"), versionCol = Some("version"),
      checks = Seq("positive_value" -> "value >= 0"))
    CommittedTable.cloneShallow(spark, src, dst)
    intercept[IllegalStateException] {
      CommittedTable.merge(spark, dst,
        Seq((9L, "A", -1.0, 2L)).toDF("id", "status", "value", "version"),
        "id", "version", "status")
    }
  }
}
