package graft.sources

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The committed-table SQL surface (graft.sql.GraftCatalog +
  * GraftAnalysis/GraftMetadataCount): SELECT resolves to a native
  * parquet scan with manifest/zone-map segment pruning; DELETE / UPDATE /
  * MERGE INTO / INSERT INTO route through the one Scala write protocol
  * (atomic publish, fencing, retention, CDC visibility). */
class GraftCatalogSpec extends SparkSpec {

  private def withTable(prefix: String)(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    try body(dir + "/t")
    finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  private def seed(path: String): Unit = {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L), (3L, "a", 30.0, 1L),
      (4L, "b", 40.0, 1L), (5L, "b", 50.0, 1L),
      (6L, "c", 60.0, 1L), (7L, "c", 70.0, 1L), (8L, "c", 80.0, 1L))
      .toDF("id", "part", "price", "version")
    CommittedTable.write(df, path, "part",
      statsCols = Seq("price", "id"),
      keyCol = Some("id"), versionCol = Some("version"))
  }

  test("SQL SELECT by absolute path matches the Scala read") {
    withTable("graft-cat-sel") { path =>
      seed(path)
      val viaSql = spark.sql(
        s"SELECT part, COUNT(*) AS n, SUM(id) AS ids FROM graft.`$path` " +
          "GROUP BY part ORDER BY part")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(viaSql.toSeq === Seq(("a", 3L, 6L), ("b", 2L, 9L), ("c", 3L, 21L)))
    }
  }

  test("partition + zone-map predicates prune the SQL scan to fewer files") {
    withTable("graft-cat-prune") { path =>
      seed(path)
      def scannedFiles(sql: String): (Long, Long) = {
        val df = spark.sql(sql)
        val scan = df.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s
        }.getOrElse(fail(s"no FileSourceScanExec in plan for: $sql"))
        val files = scan.selectedPartitions.totalNumberOfFiles
        (files, df.count())
      }
      val (allFiles, _) = scannedFiles(s"SELECT * FROM graft.`$path`")
      assert(allFiles === 3) // one file per partition
      // partition equality → one segment listed
      val (partFiles, partRows) =
        scannedFiles(s"SELECT * FROM graft.`$path` WHERE part = 'b'")
      assert(partFiles === 1 && partRows === 2)
      // zone-map range on price: only partition c holds price >= 60
      val (zoneFiles, zoneRows) =
        scannedFiles(s"SELECT * FROM graft.`$path` WHERE price >= 60.0")
      assert(zoneFiles === 1 && zoneRows === 3)
      // IN-list on the partition column
      val (inFiles, inRows) = scannedFiles(
        s"SELECT * FROM graft.`$path` WHERE part IN ('a','b')")
      assert(inFiles === 2 && inRows === 5)
      // unprunable shape (OR) keeps all segments but stays correct
      val (orFiles, orRows) = scannedFiles(
        s"SELECT * FROM graft.`$path` WHERE part = 'a' OR price > 75.0")
      assert(orFiles === 3 && orRows === 4)
    }
  }

  test("SELECT COUNT(*) collapses to manifest counts — no file scan") {
    withTable("graft-cat-count") { path =>
      seed(path)
      val df = spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$path`")
      val plan = df.queryExecution.executedPlan
      assert(plan.collectFirst { case s: FileSourceScanExec => s }.isEmpty,
        s"metadata count still scans files:\n$plan")
      assert(plan.collect { case l: LocalTableScanExec => l }.nonEmpty)
      assert(df.collect().head.getLong(0) === 8L)
      // a filtered count must NOT collapse (and must stay correct) — the
      // scan is asserted on the optimized plan (AQE wraps the physical
      // one until execution)
      val filtered =
        spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$path` WHERE id > 5")
      assert(filtered.queryExecution.optimizedPlan.collectFirst {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
      }.nonEmpty)
      assert(filtered.collect().head.getLong(0) === 3L)
    }
  }

  test("DELETE FROM routes through the committed protocol (atomic, CDC-visible)") {
    withTable("graft-cat-del") { path =>
      seed(path)
      val genBefore = CommittedTable.manifestAt(spark, path).gen
      spark.sql(s"DELETE FROM graft.`$path` WHERE id % 2 = 0")
      val m = CommittedTable.manifestAt(spark, path)
      assert(m.gen === genBefore + 1)
      assert(CommittedTable.read(spark, path).select(sum("id"))
        .collect().head.getLong(0) === (1L + 3 + 5 + 7))
      // pre-delete generation still readable (atomic publish + retention)
      assert(CommittedTable.readAt(spark, path, genBefore).count() === 8L)
      // the delete generation's CDF carries the tombstones
      val cdf = CommittedTable.changesCdf(spark, path, m.gen, "id", "version")
      val deletes = cdf.filter(col(CommittedTable.ChangeTypeColumn) === "delete")
        .select("id").collect().map(_.getLong(0)).sorted
      assert(deletes.toSeq === Seq(2L, 4L, 6L, 8L))
      // NULL predicate = not matched (SQL DELETE contract)
      spark.sql(s"DELETE FROM graft.`$path` WHERE CAST(NULL AS BOOLEAN)")
      assert(CommittedTable.read(spark, path).count() === 4L)
    }
  }

  test("UPDATE enforces the version bump and applies assignments simultaneously") {
    withTable("graft-cat-upd") { path =>
      seed(path)
      // the manifest records vercol=version, so a data-only SQL UPDATE is
      // refused (CDC-invisible update guard)
      val e = intercept[Exception] {
        spark.sql(s"UPDATE graft.`$path` SET price = price + 1 WHERE part = 'a'")
      }
      assert(e.getMessage.contains("version"))
      spark.sql(s"UPDATE graft.`$path` SET price = price * 2, " +
        "version = version + 1 WHERE price >= 60.0")
      val rows = CommittedTable.read(spark, path)
        .filter(col("part") === "c").orderBy("id")
        .select("price", "version").collect()
      assert(rows.map(_.getDouble(0)).toSeq === Seq(120.0, 140.0, 160.0))
      assert(rows.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L))
      // untouched partitions kept their rows
      assert(CommittedTable.read(spark, path).count() === 8L)
    }
  }

  test("MERGE INTO routes the canonical upsert to CommittedTable.merge") {
    withTable("graft-cat-merge") { path =>
      seed(path)
      import spark.implicits._
      Seq((2L, "a", 999.0, 2L), (9L, "d", 90.0, 1L))
        .toDF("id", "part", "price", "version")
        .createOrReplaceTempView("merge_src")
      spark.sql(s"MERGE INTO graft.`$path` t USING merge_src s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      val after = CommittedTable.read(spark, path)
      assert(after.count() === 9L)
      assert(after.filter(col("id") === 2L).select("price")
        .collect().head.getDouble(0) === 999.0)
      assert(after.filter(col("part") === "d").count() === 1L)
      // a non-canonical clause shape routes to mergeClauses (first-true-
      // wins SQL semantics) instead of failing: the matched rows delete
      spark.sql(s"MERGE INTO graft.`$path` t USING merge_src s " +
        "ON t.id = s.id WHEN MATCHED THEN DELETE")
      assert(CommittedTable.read(spark, path).count() === 7L)
      // what still fails loudly: an ON condition off the declared key
      val e = intercept[Exception] {
        spark.sql(s"MERGE INTO graft.`$path` t USING merge_src s " +
          "ON t.price = s.price WHEN MATCHED THEN DELETE")
      }
      assert(e.getMessage.contains("key column"))
    }
  }

  test("INSERT INTO routes through merge (idempotent keyed upsert)") {
    withTable("graft-cat-ins") { path =>
      seed(path)
      spark.sql(s"INSERT INTO graft.`$path` VALUES " +
        "(10, 'b', 100.0, 1), (11, 'd', 110.0, 1)")
      val after = CommittedTable.read(spark, path)
      assert(after.count() === 10L)
      // re-inserting the same keyed rows is a no-op upsert, not duplication
      spark.sql(s"INSERT INTO graft.`$path` VALUES (10, 'b', 100.0, 1)")
      assert(CommittedTable.read(spark, path).count() === 10L)
    }
  }

  test("warehouse-relative identifiers: SHOW TABLES, SELECT, DROP") {
    withTable("graft-cat-wh") { path =>
      // path = <tmp>/t; use <tmp> as the warehouse, table name = t
      val wh = path.stripSuffix("/t")
      seed(path)
      spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
      try {
        val tables = spark.sql("SHOW TABLES IN graft").collect()
          .map(_.getString(1))
        assert(tables.contains("t"))
        assert(spark.sql("SELECT COUNT(*) AS n FROM graft.t")
          .collect().head.getLong(0) === 8L)
        assert(spark.sql("DESCRIBE TABLE graft.t").collect()
          .map(_.getString(0)).contains("id"))
        spark.sql("DROP TABLE graft.t")
        assert(!new java.io.File(path).exists())
      } finally spark.conf.unset("spark.sql.catalog.graft.warehouse")
    }
  }

  test("SQL DML is fenced: a writer racing a SQL DELETE loses loudly") {
    withTable("graft-cat-fence") { path =>
      seed(path)
      // advance the table between the DELETE's manifest read and its
      // publish via the crash-point seam on the Scala path the SQL
      // command routes into — prove it is the SAME fenced protocol by
      // racing two SQL DELETEs from two threads instead: exactly one
      // must win each generation, and no row is lost twice.
      val t1 = new Thread(() =>
        try spark.sql(s"DELETE FROM graft.`$path` WHERE id = 1")
        catch { case _: Throwable => () })
      val t2 = new Thread(() =>
        try spark.sql(s"DELETE FROM graft.`$path` WHERE id = 5")
        catch { case _: Throwable => () })
      t1.start(); t2.start(); t1.join(); t2.join()
      val remaining = CommittedTable.read(spark, path)
        .select("id").collect().map(_.getLong(0)).toSet
      // at least one delete committed; the table is never corrupted and
      // every surviving generation is readable
      assert(!remaining.contains(1L) || !remaining.contains(5L))
      assert(remaining.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
      val m = CommittedTable.manifestAt(spark, path)
      assert(m.gen >= 2)
    }
  }

  test("SQL point probe on a bloomed column opens only sidecar-surviving segments") {
    withTable("graft-cat-bloom") { path =>
      import spark.implicits._
      // no zone maps on id here: the prune below is the SIDECAR's alone
      val df = Seq(
        (1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L), (3L, "a", 30.0, 1L),
        (4L, "b", 40.0, 1L), (5L, "b", 50.0, 1L),
        (6L, "c", 60.0, 1L), (7L, "c", 70.0, 1L), (8L, "c", 80.0, 1L))
        .toDF("id", "part", "price", "version")
      CommittedTable.write(df, path, "part",
        keyCol = Some("id"), versionCol = Some("version"),
        bloomCols = Seq("id"))
      def scannedFiles(sql: String): (Long, Seq[Long]) = {
        val out = spark.sql(sql)
        val scan = out.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s
        }.getOrElse(fail(s"no FileSourceScanExec in plan for: $sql"))
        (scan.selectedPartitions.totalNumberOfFiles,
          out.collect().map(_.getLong(0)).toSeq.sorted)
      }
      val (oneFile, oneRows) =
        scannedFiles(s"SELECT id FROM graft.`$path` WHERE id = 5")
      assert(oneFile === 1 && oneRows === Seq(5L))
      val (inFiles, inRows) =
        scannedFiles(s"SELECT id FROM graft.`$path` WHERE id IN (1, 8)")
      assert(inFiles === 2 && inRows === Seq(1L, 8L))
      // a probe no segment can hold plans an empty scan, not a wrong answer
      val (missFiles, missRows) =
        scannedFiles(s"SELECT id FROM graft.`$path` WHERE id = 42")
      assert(missFiles === 0 && missRows === Seq.empty)
      // unprunable shape (OR) keeps every segment and stays correct
      val (orFiles, orRows) =
        scannedFiles(s"SELECT id FROM graft.`$path` WHERE id = 5 OR id = 7")
      assert(orFiles === 3 && orRows === Seq(5L, 7L))
    }
  }

  test("VERSION AS OF / TIMESTAMP AS OF serve retained generations through SQL") {
    withTable("graft-cat-tt") { path =>
      import spark.implicits._
      seed(path) // gen 1: 8 rows
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(20) // anchor mtimes separate gen 1 from gen 2
      spark.sql(s"DELETE FROM graft.`$path` WHERE part = 'c'") // gen 2: 5 rows
      def count(sql: String): Long = spark.sql(sql).collect().head.getLong(0)
      assert(count(s"SELECT COUNT(*) FROM graft.`$path`") === 5L)
      assert(count(
        s"SELECT COUNT(*) FROM graft.`$path` VERSION AS OF 1") === 8L)
      assert(count(
        s"SELECT COUNT(*) FROM graft.`$path` VERSION AS OF 2") === 5L)
      // the snapshot composes with predicates and pruning machinery
      val old = spark.sql(
        s"SELECT id FROM graft.`$path` VERSION AS OF 1 WHERE part = 'c' ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(old === Seq(6L, 7L, 8L))
      // timestamp between the publishes resolves to gen 1 (epoch-seconds
      // cast: timezone-independent on both sides)
      assert(count(s"SELECT COUNT(*) FROM graft.`$path` " +
        s"TIMESTAMP AS OF CAST(${betweenMs / 1000.0} AS TIMESTAMP)") === 8L)
      // an unpublished generation fails loudly
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 9").collect()
      }
      assert(e.getMessage.contains("not been published"))
      // aged-out: default retain=2, a third publish retires gen 1
      spark.sql(s"DELETE FROM graft.`$path` WHERE id = 1") // gen 3
      val aged = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 1").collect()
      }
      assert(aged.getMessage.contains("not retained"))
      // a timestamp before the first retained anchor fails with the window
      val early = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.`$path` " +
          "TIMESTAMP AS OF '2001-01-01 00:00:00'").collect()
      }
      assert(early.getMessage.contains("no retained generation"))
    }
  }

  test("CALL procedures: compact, z-order compact, set_retention, recover via SQL") {
    withTable("graft-cat-call") { path =>
      seed(path)
      import spark.implicits._
      // fragment partition 'a' across two generations
      CommittedTable.merge(spark,
        path, Seq((10L, "a", 15.0, 2L)).toDF("id", "part", "price", "version"),
        "id", "version", "part")
      val before = spark.sql(s"SELECT * FROM graft.`$path`").collect()
        .map(_.toSeq).toSet
      // plain compact: content identical, generation advanced, result row
      val res = spark.sql(s"CALL graft.compact(table => '$path')").collect()
      assert(res.length === 1 && res.head.getString(0) === path)
      val genAfterCompact = res.head.getLong(1)
      assert(genAfterCompact === 3L)
      assert(spark.sql(s"SELECT * FROM graft.`$path`").collect()
        .map(_.toSeq).toSet === before)
      // z-order compact via the optional args
      val zres = spark.sql(s"CALL graft.compact(table => '$path', " +
        "zorder_by => 'id,price', zorder_bits => 8)").collect()
      assert(zres.head.getLong(1) === 4L)
      assert(spark.sql(s"SELECT * FROM graft.`$path`").collect()
        .map(_.toSeq).toSet === before)
      // retention dial through CALL
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)")
      val m = CommittedTable.readManifest(
        new org.apache.hadoop.fs.Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(path)).get
      assert(m.retain === 5)
      // recover is callable (healthy table: no-op, reports the current gen)
      val rec = spark.sql(s"CALL graft.recover(table => '$path')").collect()
      assert(rec.head.getLong(1) === m.gen)
      // unknown procedure fails loudly (Spark wraps the catalog's
      // vacuum is callable too (healthy table: sweeps nothing, reports gen)
      val vac = spark.sql(s"CALL graft.vacuum(table => '$path')").collect()
      assert(vac.head.getLong(1) === m.gen)
      // inventory-naming error in FAILED_TO_LOAD_ROUTINE)
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.defrobulate(table => '$path')").collect()
      }
      val messages = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(_.getMessage).mkString("; ")
      assert(messages.contains("defrobulate"))
      assert(messages.contains("unknown procedure") ||
        messages.contains("FAILED_TO_LOAD_ROUTINE"))
    }
  }

  test("SQL on a composite-partitioned table: component-pruned SELECT, routed DML") {
    withTable("graft-cat-comp") { path =>
      import spark.implicits._
      val df = Seq(
        (1L, "2026-01-01", "web", 10.0), (2L, "2026-01-01", "crawl", 20.0),
        (3L, "2026-01-02", "web", 30.0), (4L, "2026-01-02", "crawl", 40.0),
        (5L, "2026-01-03", "web", 50.0))
        .toDF("id", "day", "source", "value")
        .withColumn("version", lit(1L))
      CommittedTable.writeComposite(df, path, Seq("day", "source"),
        keyCol = Some("id"), versionCol = Some("version"))
      // component predicate prunes MID-key through the per-component zone
      // maps inside GraftFileIndex — 2 of 5 segments planned
      // no ORDER BY here: an exchange would wrap the plan in AQE and hide
      // the scan node this assertion inspects
      val sel = spark.sql(
        s"SELECT id FROM graft.`$path` WHERE source = 'crawl'")
      val scan = sel.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.selectedPartitions.totalNumberOfFiles === 2)
      assert(sel.collect().map(_.getLong(0)).toSeq.sorted === Seq(2L, 4L))
      // routed DML scopes by the manifest-recorded composite partition col
      spark.sql(s"UPDATE graft.`$path` SET value = 21.0, version = 2 " +
        "WHERE id = 2")
      spark.sql(s"DELETE FROM graft.`$path` WHERE day = '2026-01-03'")
      val after = spark.sql(
        s"SELECT id, value FROM graft.`$path` ORDER BY id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(after === Seq((1L, 10.0), (2L, 21.0), (3L, 30.0), (4L, 40.0)))
      // the composite key column reads back and decodes through SQL too
      val decoded = spark.sql(s"SELECT part_key FROM graft.`$path` " +
        "WHERE id = 2").collect().head.getString(0)
      assert(decoded === "2026-01-01/crawl")
    }
  }

  test("schema widen NULL-fills through the SQL read") {
    withTable("graft-cat-widen") { path =>
      seed(path)
      import spark.implicits._
      val widened = Seq((20L, "a", 25.0, 2L, "new"))
        .toDF("id", "part", "price", "version", "tag")
      CommittedTable.merge(spark, path, widened, "id", "version", "part",
        allowAddColumns = true)
      val rows = spark.sql(
        s"SELECT id, tag FROM graft.`$path` WHERE part = 'a' ORDER BY id")
        .collect()
      assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ===
        Seq((1L, None), (2L, None), (3L, None), (20L, Some("new"))))
    }
  }

  test("CTAS: CREATE TABLE … PARTITIONED BY … AS SELECT routes to one atomic write") {
    withTable("graft-cat-ctas") { path =>
      import spark.implicits._
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "a", 30.0, 1L))
        .toDF("id", "part", "price", "version")
        .createOrReplaceTempView("ctas_src")
      spark.sql(
        s"""CREATE TABLE graft.`$path`
            PARTITIONED BY (part)
            TBLPROPERTIES('keycol'='id', 'vercol'='version',
                          'statscols'='price,id')
            AS SELECT * FROM ctas_src""")
      // the created table serves SQL reads…
      assert(spark.sql(s"SELECT SUM(id) AS s FROM graft.`$path`")
        .collect().head.getLong(0) === 6L)
      // …and the TBLPROPERTIES roles are REAL manifest metadata: routed
      // INSERT (needs keycol+vercol) works without re-declaring anything
      spark.sql(s"INSERT INTO graft.`$path` VALUES (4, 'b', 40.0, 1)")
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$path`")
        .collect().head.getLong(0) === 4L)
      // plain CREATE on an existing table fails loudly; IF NOT EXISTS no-ops
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` PARTITIONED BY (part) " +
          "AS SELECT * FROM ctas_src")
      }
      assert(e.getMessage.contains("already holds a committed table"))
      spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$path` " +
        "PARTITIONED BY (part) AS SELECT * FROM ctas_src")
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$path`")
        .collect().head.getLong(0) === 4L)
      // contract violations fail at analysis, naming the remedy
      val e2 = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`${path}2` AS SELECT * FROM ctas_src")
      }
      assert(e2.getMessage.contains("PARTITIONED BY"))
      val e3 = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`${path}3` PARTITIONED BY (part) " +
          "TBLPROPERTIES('zonemaps'='price') AS SELECT * FROM ctas_src")
      }
      assert(e3.getMessage.contains("unknown TBLPROPERTIES"))
    }
  }

  test("REPLACE TABLE AS SELECT: atomic overwrite, history stays travelable") {
    withTable("graft-cat-rtas") { path =>
      seed(path) // gen 1: ids 1..8
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)")
      import spark.implicits._
      Seq((100L, "a", 1.0, 1L), (200L, "d", 2.0, 1L))
        .toDF("id", "part", "price", "version")
        .createOrReplaceTempView("rtas_src")
      spark.sql(s"REPLACE TABLE graft.`$path` AS SELECT * FROM rtas_src")
      // current = the replacement; partitions b, c are GONE
      assert(spark.sql(s"SELECT id FROM graft.`$path` ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(100L, 200L))
      // the pre-replace generation still serves through time travel
      // (set_retention republished as gen 2, so the seed data is gen 1
      // and the replace is gen 3)
      assert(spark.sql(
        s"SELECT COUNT(*) AS n FROM graft.`$path` VERSION AS OF 2")
        .collect().head.getLong(0) === 8L)
      // roles were INHERITED across the replace: routed DML still works
      spark.sql(s"DELETE FROM graft.`$path` WHERE id = 100")
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`$path`")
        .collect().head.getLong(0) === 1L)
      // plain REPLACE of a missing table fails; CREATE OR REPLACE creates
      val e = intercept[Exception] {
        spark.sql(s"REPLACE TABLE graft.`${path}-x` AS SELECT * FROM rtas_src")
      }
      assert(e.getMessage.contains("CREATE OR REPLACE"))
      spark.sql(s"CREATE OR REPLACE TABLE graft.`${path}-x` " +
        "PARTITIONED BY (part) AS SELECT * FROM rtas_src")
      assert(spark.sql(s"SELECT COUNT(*) AS n FROM graft.`${path}-x`")
        .collect().head.getLong(0) === 2L)
      // a replace that DROPS a role column clears the role: later routed
      // INSERT (needs key+version) fails loudly, it does not corrupt
      spark.sql(s"REPLACE TABLE graft.`$path` AS " +
        "SELECT id, part, price FROM rtas_src")
      val e2 = intercept[Exception] {
        spark.sql(s"INSERT INTO graft.`$path` VALUES (9, 'a', 9.0)")
      }
      assert(e2.getMessage.contains("key/version"))
    }
  }

  test("INSERT OVERWRITE: dynamic replaces present partitions, carries the rest") {
    withTable("graft-cat-iow") { path =>
      seed(path) // parts a(1,2,3) b(4,5) c(6,7,8), one segment each
      val t = new org.apache.hadoop.fs.Path(path)
      val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def segs = CommittedTable.readManifest(fs, t).get.segments
      val before = segs
      import spark.implicits._
      Seq((40L, "b", 400.0, 2L), (41L, "b", 410.0, 2L))
        .toDF("id", "part", "price", "version")
        .createOrReplaceTempView("iow_src")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try spark.sql(s"INSERT OVERWRITE graft.`$path` SELECT * FROM iow_src")
      finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      // partition b replaced wholesale; a and c rows untouched
      assert(spark.sql(s"SELECT id FROM graft.`$path` ORDER BY id")
        .collect().map(_.getLong(0)).toSeq ===
        Seq(1L, 2L, 3L, 6L, 7L, 8L, 40L, 41L))
      // carry-forward is FILE-level: untouched partitions keep their exact
      // segment dirs (no rewrite), only b got a new one
      val after = segs
      assert(after("a") === before("a") && after("c") === before("c"))
      assert(after("b") !== before("b"))
      // zone maps track the rewrite: price >= 300 now prunes to b only
      val scan = spark.sql(s"SELECT * FROM graft.`$path` WHERE price >= 300.0")
      val files = scan.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get.selectedPartitions.totalNumberOfFiles
      assert(files === 1 && scan.count() === 2)
    }
  }

  test("INSERT OVERWRITE: static PARTITION and full-table forms") {
    withTable("graft-cat-iow2") { path =>
      seed(path)
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)")
      import spark.implicits._
      // static PARTITION (part = 'c'): query supplies the other columns
      Seq((60L, 600.0, 2L)).toDF("id", "price", "version")
        .createOrReplaceTempView("iow2_src")
      spark.sql(s"INSERT OVERWRITE graft.`$path` PARTITION (part = 'c') " +
        "SELECT id, price, version FROM iow2_src")
      assert(spark.sql(
        s"SELECT id FROM graft.`$path` WHERE part = 'c'")
        .collect().map(_.getLong(0)).toSeq === Seq(60L))
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$path`")
        .collect().head.getLong(0) === 6L) // 3 a + 2 b + 1 c
      // the pre-overwrite generation stays travelable (seed=1, retain=2,
      // partition overwrite=3)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.`$path` VERSION AS OF 2")
        .collect().head.getLong(0) === 8L)
      // full-table static overwrite = REPLACE content; roles inherit so
      // routed DML still works afterwards
      Seq((100L, "z", 1.0, 1L), (101L, "z", 2.0, 1L))
        .toDF("id", "part", "price", "version")
        .createOrReplaceTempView("iow2_all")
      spark.sql(s"INSERT OVERWRITE graft.`$path` SELECT * FROM iow2_all")
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$path`")
        .collect().head.getLong(0) === 2L)
      spark.sql(s"DELETE FROM graft.`$path` WHERE id = 100")
      assert(spark.sql(s"SELECT id FROM graft.`$path`")
        .collect().map(_.getLong(0)).toSeq === Seq(101L))
    }
  }

  test("overwritePartitions: schema drift and NULL partitions fail loudly") {
    withTable("graft-cat-iow3") { path =>
      seed(path)
      import spark.implicits._
      val drifted = Seq((1L, "a", 1.0)).toDF("id", "part", "price")
      val e = intercept[IllegalArgumentException] {
        CommittedTable.overwritePartitions(drifted, path)
      }
      assert(e.getMessage.contains("match the table schema exactly"))
      val nulled = Seq((1L, null.asInstanceOf[String], 1.0, 1L))
        .toDF("id", "part", "price", "version")
      val e2 = intercept[IllegalArgumentException] {
        CommittedTable.overwritePartitions(nulled, path)
      }
      assert(e2.getMessage.contains("NULL or empty-string"))
      // failures above published nothing: table unchanged, next gen clean
      assert(CommittedTable.read(spark, path).count() === 8L)
    }
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only widen, zero data files moved") {
    withTable("graft-cat-alter") { path =>
      seed(path)
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)")
      val t = new org.apache.hadoop.fs.Path(path)
      val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val before = CommittedTable.readManifest(fs, t).get.segments
      spark.sql(s"ALTER TABLE graft.`$path` " +
        "ADD COLUMNS (note STRING, score DOUBLE)")
      // ZERO data movement: every segment dir is byte-identical
      assert(CommittedTable.readManifest(fs, t).get.segments === before)
      // reads NULL-fill the declared columns, typed from the manifest
      val df = spark.sql(s"SELECT id, note, score FROM graft.`$path`")
      assert(df.schema("note").dataType ===
        org.apache.spark.sql.types.StringType)
      assert(df.schema("score").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(df.filter(col("note").isNotNull || col("score").isNotNull)
        .count() === 0L)
      // the Scala read path agrees (one schemaOf, two front ends)
      assert(CommittedTable.read(spark, path).schema.fieldNames.toSeq ===
        Seq("id", "part", "price", "version", "note", "score"))
      // a later UPDATE materializes values in rewritten partitions only
      spark.sql(s"UPDATE graft.`$path` SET note = 'hot', " +
        "version = version + 1 WHERE part = 'b'")
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.`$path` WHERE note = 'hot'")
        .collect().head.getLong(0) === 2L)
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.`$path` WHERE note IS NULL")
        .collect().head.getLong(0) === 6L)
      // time travel to a pre-alter generation serves the OLD schema
      // (seed=1, retention=2, alter=3, update=4)
      assert(spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 2")
        .schema.fieldNames.toSeq === Seq("id", "part", "price", "version"))
      // illegal adds fail loudly, table untouched
      val e1 = intercept[Exception] { spark.sql(
        s"ALTER TABLE graft.`$path` ADD COLUMNS (x INT NOT NULL)") }
      assert(e1.getMessage.contains("NOT NULL"))
      val e2 = intercept[Exception] { spark.sql(
        s"ALTER TABLE graft.`$path` ADD COLUMNS (y INT FIRST)") }
      assert(e2.getMessage.contains("position"))
      val e3 = intercept[Exception] { spark.sql(
        s"ALTER TABLE graft.`$path` ADD COLUMNS (note INT)") }
      assert(e3.getMessage.contains("already exists"))
    }
  }

  test("ALTER TABLE DROP COLUMN: metadata-only shed, roles guarded") {
    withTable("graft-cat-drop") { path =>
      seed(path) // price is a stats column, id the key, version the vercol
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)")
      val t = new org.apache.hadoop.fs.Path(path)
      val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a role-carrying column is refused, naming the remedy
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN price")
      }
      assert(e.getMessage.contains("zone-map stats column"))
      val e2 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN id")
      }
      assert(e2.getMessage.contains("merge key"))
      // clear the role, then the drop is one manifest swap — zero files
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('statscols'='id')")
      val before = CommittedTable.readManifest(fs, t).get.segments
      spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN price")
      assert(CommittedTable.readManifest(fs, t).get.segments === before)
      assert(spark.sql(s"SELECT * FROM graft.`$path`").schema.fieldNames.toSeq
        === Seq("id", "part", "version"))
      // pre-drop generation still serves the column WITH its values
      // (seed=1, retention=2, statscols=3, drop=4)
      val old = spark.sql(
        s"SELECT price FROM graft.`$path` VERSION AS OF 3 WHERE id = 1")
      assert(old.collect().head.getDouble(0) === 10.0)
      // re-adding a tombstoned name is REFUSED — unrewritten files still
      // carry the old bytes and the by-name read would resurrect them
      val eRe = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (price DOUBLE)")
      }
      assert(eRe.getMessage.contains("RESURRECT"))
      // one compact physically sheds the residue and clears the
      // tombstone; the re-add is then a clean NULL-filled declaration
      spark.sql(s"CALL graft.compact(table => '$path')")
      spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (price DOUBLE)")
      assert(spark.sql(
        s"SELECT COUNT(*) FROM graft.`$path` WHERE price IS NOT NULL")
        .collect().head.getLong(0) === 0L)
      // missing column: loud without IF EXISTS, silent with
      val e3 = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN nope")
      }
      assert(e3.getMessage.contains("cannot be resolved")) // analyzer-level
      spark.sql(s"ALTER TABLE graft.`$path` DROP COLUMN IF EXISTS nope")
    }
  }

  test("ALTER TABLE SET TBLPROPERTIES: role re-declaration, conservative maps") {
    withTable("graft-cat-roles") { path =>
      import spark.implicits._
      // born role-less: no stats, no key/version
      val df = Seq((1L, "a", 10.0, 1L), (4L, "b", 40.0, 1L),
        (6L, "c", 60.0, 1L), (7L, "c", 70.0, 1L))
        .toDF("id", "part", "price", "version")
      CommittedTable.write(df, path, "part")
      // routed DML needs key/version: fails before the ALTER…
      val e = intercept[Exception] { spark.sql(
        s"INSERT INTO graft.`$path` VALUES (9, 'a', 9.0, 1)") }
      assert(e.getMessage.contains("key/version"))
      // …works after it
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES(" +
        "'keycol'='id', 'vercol'='version', 'statscols'='price')")
      spark.sql(s"INSERT INTO graft.`$path` VALUES (9, 'a', 9.0, 1)")
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$path`")
        .collect().head.getLong(0) === 5L)
      // fresh statscols: the rewritten partition (a) has zone maps, the
      // untouched ones conservatively survive — answers exact either way
      val scan = spark.sql(
        s"SELECT id FROM graft.`$path` WHERE price >= 60.0")
      assert(scan.collect().map(_.getLong(0)).sorted.toSeq === Seq(6L, 7L))
      // one compact rebuilds maps everywhere: price >= 60 prunes to c only
      spark.sql(s"CALL graft.compact(table => '$path')")
      val pruned = spark.sql(
        s"SELECT id FROM graft.`$path` WHERE price >= 60.0")
      val files = pruned.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get.selectedPartitions.totalNumberOfFiles
      assert(files === 1 &&
        pruned.collect().map(_.getLong(0)).sorted.toSeq === Seq(6L, 7L))
      // unknown property fails loudly
      val e2 = intercept[Exception] { spark.sql(
        s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('zorder'='id')") }
      assert(e2.getMessage.contains("unknown table property"))
    }
  }

  test("dynamic partition pruning: a dim filter prunes the fact scan at runtime") {
    withTable("graft-cat-dpp") { path =>
      import spark.implicits._
      // 26-partition fact; the dim filter selects 2 of them — at 100 TB
      // this is the difference between scanning the table and scanning
      // two partitions, decided at RUNTIME from the broadcast dim
      val fact = (0 until 26).flatMap { p =>
        val part = ('a' + p).toChar.toString
        (1 to 50).map(i => (p * 1000L + i, part, i.toDouble))
      }.toDF("id", "part", "price")
      CommittedTable.write(fact, path, "part")
      // the dim must be a FILE relation: a local Seq would constant-fold
      // through the optimizer and leave no selective filter for the
      // PartitionPruning rule to see
      val dimPath = java.nio.file.Files
        .createTempDirectory("graft-cat-dpp-dim").toString + "/d"
      Seq.tabulate(26)(i =>
        (('a' + i).toChar.toString, if (i < 2) "hot" else "cold"))
        .toDF("part", "grp").write.parquet(dimPath)
      spark.read.parquet(dimPath).createOrReplaceTempView("dpp_dim")
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      try {
        val q = spark.sql(
          s"""SELECT COUNT(*) AS n, CAST(SUM(f.price) AS BIGINT) AS s
              FROM graft.`$path` f JOIN dpp_dim d ON f.part = d.part
              WHERE d.grp = 'hot'""")
        val res = q.collect()
        assert(res.head.getLong(0) === 100L &&
          res.head.getLong(1) === 2L * (1 to 50).sum)
        // the fact scan carries a dynamicpruning partition filter…
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        def scans(p: SparkPlan): Seq[FileSourceScanExec] =
          p.collect {
            case s: FileSourceScanExec => Seq(s)
            case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
            case qs: QueryStageExec => scans(qs.plan)
          }.flatten
        val plan = q.queryExecution.executedPlan
        val scan = scans(plan).find(
          _.relation.location.isInstanceOf[graft.sql.GraftFileIndex])
          .getOrElse(fail(s"no committed-table scan in the DPP plan:\n$plan"))
        assert(scan.partitionFilters.exists(
          _.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])),
          s"no dynamic pruning filter on the fact scan:\n$plan")
        // …and at execution only the 2 hot partitions' files were read
        assert(scan.metrics("numFiles").value === 2,
          s"expected 2 dynamically selected files, got " +
            s"${scan.metrics("numFiles").value}")
      } finally spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }

  test("manifest file lists: query planning opens zero directories") {
    withTable("graft-cat-flist") { path =>
      seed(path)
      val t = new org.apache.hadoop.fs.Path(path)
      val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def manifest = CommittedTable.readManifest(fs, t).get
      // every segment's files are recorded with REAL lengths
      val m0 = manifest
      assert(m0.segments.values.toSet === m0.files.keySet)
      m0.segments.foreach { case (_, seg) =>
        val real = fs.listStatus(new org.apache.hadoop.fs.Path(t, seg))
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => (st.getPath.getName, st.getLen)).toSet
        assert(m0.files(seg).toSet === real)
      }
      // a merge records the fresh segment's list and CARRIES b/c verbatim
      import spark.implicits._
      CommittedTable.merge(spark,
        path, Seq((1L, "a", 11.0, 2L)).toDF("id", "part", "price", "version"),
        "id", "version", "part")
      val m1 = manifest
      assert(m1.files(m1.segments("b")) === m0.files(m0.segments("b")))
      assert(m1.segments("a") !== m0.segments("a"))
      assert(m1.files.contains(m1.segments("a")))
      // PROOF planning never lists: hide partition c's data file on disk —
      // a plan (and a pruned read) must still work entirely from the
      // manifest; only an actual scan of c would notice
      val cSeg = new org.apache.hadoop.fs.Path(t, m1.segments("c"))
      val cFile = fs.listStatus(cSeg).filter(_.getPath.getName.endsWith(".parquet"))
        .head.getPath
      val hidden = new org.apache.hadoop.fs.Path(cSeg, "_hidden")
      assert(fs.rename(cFile, hidden))
      try {
        val pruned = spark.sql(s"SELECT id FROM graft.`$path` WHERE part = 'a'")
        // plans from the manifest (sizeInBytes + file list), reads only a
        assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ===
          Seq(1L, 2L, 3L))
        val full = spark.sql(s"SELECT id FROM graft.`$path`")
        val scan = full.queryExecution.executedPlan.collectFirst {
          case s: FileSourceScanExec => s
        }.get
        // the full plan still claims all 3 partitions' files — listed from
        // the manifest, not the (now-lying) filesystem
        assert(scan.selectedPartitions.totalNumberOfFiles === 3)
      } finally assert(fs.rename(hidden, cFile))
      // filesystem restored: the full read is exact
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$path`")
        .collect().head.getLong(0) === 8L) // merge replaced id 1 in place
    }
  }

  test("CALL history: one row per retained generation, metadata-only") {
    withTable("graft-cat-hist") { path =>
      seed(path) // gen 1: 8 rows
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 5)") // gen 2
      spark.sql(s"DELETE FROM graft.`$path` WHERE id % 2 = 0") // gen 3
      val h = spark.sql(s"CALL graft.history(table => '$path')")
        .collect()
      assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
      assert(h.map(_.getBoolean(5)).toSeq === Seq(false, false, true))
      // row totals track the snapshots: 8 seeded, 8 unchanged, 4 deleted
      assert(h.map(_.getLong(4)).toSeq === Seq(8L, 8L, 4L))
      // publish times are nondecreasing and real
      val ts = h.map(_.getTimestamp(1).getTime).toSeq
      assert(ts === ts.sorted && ts.head > 0L)
      // every generation is attributed to the verb that published it
      assert(h.map(_.getString(2)).toSeq ===
        Seq("write", "set-retention", "delete"))
      // partitions: 3 (a,b,c) throughout — the delete rewrites, not drops
      assert(h.map(_.getInt(3)).toSeq === Seq(3, 3, 3))
      // missing table fails loudly
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.history(table => '${path}-none')").collect()
      }
      assert(e.getMessage.contains("no committed table"))
    }
  }

  test("CALL init/sync_agg_view: SQL-only MV lifecycle, idempotent re-sync") {
    withTable("graft-cat-aggview") { path =>
      // group column (grp) deliberately DIFFERENT from the partition
      // column (part): UPDATE may move rows between GROUPS freely; moves
      // between PARTITIONS are merge-only by contract
      import spark.implicits._
      CommittedTable.write(Seq(
          (1L, "a", "g1", 1L), (2L, "a", "g1", 1L), (3L, "a", "g1", 1L),
          (4L, "b", "g2", 1L), (5L, "b", "g2", 1L),
          (6L, "c", "g3", 1L), (7L, "c", "g3", 1L), (8L, "c", "g3", 1L))
          .toDF("id", "part", "grp", "version"),
        path, "part", keyCol = Some("id"), versionCol = Some("version"))
      val vw = path + "-view"
      spark.sql(s"CALL graft.set_retention(table => '$path', retain => 10)")
      val initGen = spark.sql(
        s"CALL graft.init_agg_view(source => '$path', view => '$vw', " +
          "group_by => 'grp', value => 'id')").collect().head.getLong(1)
      assert(initGen >= 1L)
      spark.sql(s"DELETE FROM graft.`$path` WHERE id = 3")
      spark.sql(s"UPDATE graft.`$path` SET grp = 'z', version = version + 1 " +
        "WHERE id = 8")
      def sync() = spark.sql(
        s"CALL graft.sync_agg_view(source => '$path', view => '$vw', " +
          "group_by => 'grp', value => 'id')").collect()
      sync()
      def view() = spark.sql(
        s"""SELECT grp, CAST(n AS BIGINT), CAST(sum_value AS BIGINT),
              CAST(min_value AS BIGINT), CAST(max_value AS BIGINT)
            FROM graft.`$vw` ORDER BY grp""")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
      val after = view()
      assert(after === Seq(
        ("g1", 2L, 3L, 1L, 2L),  // id 3 deleted
        ("g2", 2L, 9L, 4L, 5L),
        ("g3", 2L, 13L, 6L, 7L), // id 8 moved out (extreme retracted → rescan)
        ("z", 1L, 8L, 8L, 8L)))  // brand-new group from the move
      // a second CALL re-drains an empty feed via the SAME checkpoint:
      // nothing changes (exactly-once effect)
      sync()
      assert(view() === after)
      // a keycol-less source fails loudly naming the remedy
      val bare = path + "-bare"
      CommittedTable.write(Seq((1L, "a")).toDF("id", "part"), bare, "part")
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.sync_agg_view(source => '$bare', " +
          s"view => '$vw', group_by => 'part', value => 'id')")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("keycol")), msgs(e).mkString(" | "))
    }
  }

  test("CBO: a small committed dim auto-broadcasts in a SQL join, no hint") {
    withTable("graft-cat-cbo") { path =>
      seed(path) // 8 rows — kilobytes, far under the broadcast threshold
      import spark.implicits._
      // a 'fact' side large enough that broadcasting it the other way
      // would be the wrong plan
      (1L to 20000L).map(i => (i, (i % 8) + 1, i * 1.5))
        .toDF("fid", "dim_id", "amount")
        .createOrReplaceTempView("cbo_fact")
      val q = spark.sql(
        s"""SELECT t.part, COUNT(*) AS n
            FROM cbo_fact f JOIN graft.`$path` t ON f.dim_id = t.id
            GROUP BY t.part""")
      assert(q.collect().map(_.getLong(1)).sum === 20000L)
      // the STATIC physical plan: the broadcast decision must come from
      // the FileIndex's size estimate at planning time, not from an AQE
      // runtime rescue
      val plan = q.queryExecution.sparkPlan
      val bhj = plan.collect {
        case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
      }
      assert(bhj.nonEmpty, s"no BroadcastHashJoin in:\n$plan")
      // the BROADCAST side must be the committed-table scan: its subtree
      // contains the graft FileSourceScan, the fact side does not
      val build = bhj.head.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.head.left
        case _ => bhj.head.right
      }
      val buildScans = build.collect {
        case f: FileSourceScanExec
            if f.relation.location.isInstanceOf[graft.sql.GraftFileIndex] => f
      }
      assert(buildScans.nonEmpty,
        s"broadcast side is not the committed dim:\n$build")
    }
  }

  test("CBO honesty both ways: a committed side OVER the threshold is not broadcast") {
    withTable("graft-cat-cbo2") { path =>
      import spark.implicits._
      // ~40k rows with a fat payload — comfortably past a 64 KB threshold
      val big = (1L to 40000L)
        .map(i => (i, s"p${i % 4}", ("x" * 64) + i, 1L))
        .toDF("id", "part", "payload", "version")
      CommittedTable.write(big, path, "part")
      (1L to 500L).map(i => (i, i % 40000L + 1))
        .toDF("fid", "dim_id").createOrReplaceTempView("cbo2_probe")
      val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
      try {
        val q = spark.sql(
          s"""SELECT COUNT(*) AS n
              FROM cbo2_probe p JOIN graft.`$path` t ON p.dim_id = t.id""")
        val plan = q.queryExecution.sparkPlan
        // the STATIC plan must NOT put the big committed table on a
        // broadcast build side — sizeInBytes (summed from the manifest's
        // recorded file lengths) reports the real size, so the estimate
        // is honest in BOTH directions, not just the q150 small case
        val bigBroadcast = plan.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            val build = b.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
              case _ => b.right
            }
            build.collect {
              case f: FileSourceScanExec
                  if f.relation.location.isInstanceOf[graft.sql.GraftFileIndex] => f
            }
        }.flatten
        assert(bigBroadcast.isEmpty,
          s"the over-threshold committed table was broadcast:\n$plan")
        assert(q.collect().head.getLong(0) === 500L)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    }
  }

  test("CTAS PARTITIONED BY (a, b): the composite convention through SQL") {
    withTable("graft-cat-ctas2") { path =>
      import spark.implicits._
      Seq((1L, "en", "web", 1.0, 1L), (2L, "en", "book", 2.0, 1L),
          (3L, "de", "web", 3.0, 1L), (4L, "de", "book", 4.0, 1L))
        .toDF("id", "lang", "source", "score", "version")
        .createOrReplaceTempView("ctas2_src")
      spark.sql(s"CREATE TABLE graft.`$path` PARTITIONED BY (lang, source) " +
        "TBLPROPERTIES('keycol'='id', 'vercol'='version') " +
        "AS SELECT * FROM ctas2_src")
      // four (lang, source) segments; a mid-key component probe prunes
      // exactly (per-component zone maps — something hive prefix dirs
      // cannot do without enumerating lang)
      val q = spark.sql(
        s"SELECT id FROM graft.`$path` WHERE source = 'web'")
      val scan = q.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      assert(scan.selectedPartitions.totalNumberOfFiles === 2)
      assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
      // routed DML scopes by the composite key column
      spark.sql(s"DELETE FROM graft.`$path` WHERE lang = 'de' AND score > 3.5")
      assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$path`")
        .collect().head.getLong(0) === 3L)
    }
  }

  test("schema-only CREATE TABLE: typed empty read, INSERT INTO lands, " +
      "roles recorded from TBLPROPERTIES") {
    withTable("graft-cat-create") { path =>
      spark.sql(
        s"""CREATE TABLE graft.`$path`
            (id BIGINT, part STRING, price DOUBLE, version BIGINT)
            PARTITIONED BY (part)
            TBLPROPERTIES('keycol'='id', 'vercol'='version',
              'statscols'='price,id')""")
      // born empty: typed relation, zero rows, COUNT(*) collapses to the
      // manifest (zero segments ⇒ zero)
      val empty = spark.sql(s"SELECT * FROM graft.`$path`")
      assert(empty.schema.fieldNames.toSeq ===
        Seq("id", "part", "price", "version"))
      assert(empty.schema("price").dataType ===
        org.apache.spark.sql.types.DoubleType)
      assert(empty.count() === 0L)
      assert(CommittedTable.read(spark, path).count() === 0L)
      // INSERT INTO the empty table is an ordinary generation-2 publish
      spark.sql(s"INSERT INTO graft.`$path` VALUES " +
        "(1, 'a', 10.0, 1), (2, 'b', 20.0, 1), (3, 'a', 30.0, 1)")
      val rows = spark.sql(
        s"SELECT part, COUNT(*) AS n, SUM(id) AS ids FROM graft.`$path` " +
          "GROUP BY part ORDER BY part")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(rows.toSeq === Seq(("a", 2L, 4L), ("b", 1L, 2L)))
      // the declared roles drove the insert (merge key/version) and the
      // stats columns survived into the publish: zone maps recorded
      val m = CommittedTable.manifestAt(spark, path)
      assert(m.gen === 2L)
      assert(m.keyCol === Some("id") && m.verCol === Some("version"))
      assert(m.statsCols === Seq("price", "id"))
      assert(m.stats.nonEmpty)
      // MERGE works too (key/version declared at create)
      spark.sql(s"MERGE INTO graft.`$path` t USING " +
        "(SELECT 1 AS id, 'a' AS part, 99.0 AS price, 2 AS version) s " +
        "ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      assert(spark.sql(s"SELECT price FROM graft.`$path` WHERE id = 1")
        .collect().head.getDouble(0) === 99.0)
    }
  }

  test("CREATE TABLE contracts: double-create refused, roles validated " +
      "against the declared schema, partition clause required") {
    withTable("graft-cat-create2") { path =>
      spark.sql(s"CREATE TABLE graft.`$path` (id BIGINT, part STRING) " +
        "PARTITIONED BY (part)")
      val dup = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` (x INT, part STRING) " +
          "PARTITIONED BY (part)")
      }
      assert(dup.getMessage.contains("already"))
      // IF NOT EXISTS no-ops
      spark.sql(s"CREATE TABLE IF NOT EXISTS graft.`$path` " +
        "(x INT, part STRING) PARTITIONED BY (part)")
      assert(spark.sql(s"SELECT * FROM graft.`$path`")
        .schema.fieldNames.toSeq === Seq("id", "part"))
    }
    withTable("graft-cat-create3") { path =>
      val noPart = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` (id BIGINT, part STRING)")
      }
      assert(noPart.getMessage.contains("PARTITIONED BY"))
      val badRole = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` (id BIGINT, part STRING) " +
          "PARTITIONED BY (part) TBLPROPERTIES('keycol'='nope')")
      }
      assert(badRole.getMessage.contains("absent from the declared schema"))
      val badProp = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.`$path` (id BIGINT, part STRING) " +
          "PARTITIONED BY (part) TBLPROPERTIES('frobnicate'='1')")
      }
      assert(badProp.getMessage.contains("unknown TBLPROPERTIES"))
    }
  }

  test("RENAME COLUMN: metadata-only, old files read through the mapping, " +
      "mixed generations coalesce, VERSION AS OF serves the old name") {
    withTable("graft-cat-rename") { path =>
      seed(path) // gen 1: files physically carry 'price'
      // deep retention: the test travels back across several metadata gens
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('retain'='10')")
      // price is a zone-map stats column — the rename refuses until the
      // role is cleared (renaming under a role would desync the maps)
      val statsRole = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN price TO amount")
      }
      assert(statsRole.getMessage.contains("zone-map stats column"))
      spark.sql(s"ALTER TABLE graft.`$path` SET TBLPROPERTIES('statscols'='id')")
      spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN price TO amount")
      // SQL read: new name over unrewritten files
      assert(spark.sql(s"SELECT amount FROM graft.`$path` WHERE id = 1")
        .collect().head.getDouble(0) === 10.0)
      // Scala read agrees; old name is gone from the schema
      val df = CommittedTable.read(spark, path)
      assert(df.columns.toSeq === Seq("id", "part", "amount", "version"))
      assert(df.filter(col("id") === 2).select("amount")
        .as[Double](org.apache.spark.sql.Encoders.scalaDouble).head() === 20.0)
      // a post-rename write materializes 'amount'; both generations of
      // files serve one query through the coalesce
      spark.sql(s"INSERT INTO graft.`$path` VALUES (9, 'a', 90.0, 1)")
      assert(spark.sql(
        s"SELECT CAST(SUM(amount) AS DOUBLE) FROM graft.`$path` WHERE part = 'a'")
        .collect().head.getDouble(0) === 10.0 + 20.0 + 30.0 + 90.0)
      // time travel to the pre-rename generation serves the OLD name
      val was = spark.sql(s"SELECT * FROM graft.`$path` VERSION AS OF 1")
      assert(was.schema.fieldNames.contains("price") &&
        !was.schema.fieldNames.contains("amount"))
      // guards: re-adding the former name is quarantined; renaming a
      // role column refused
      val resurrect = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (price DOUBLE)")
      }
      assert(resurrect.getMessage.contains("FORMER name"))
      val role = intercept[Exception] {
        spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN id TO key_id")
      }
      assert(role.getMessage.contains("merge key"))
      // chained rename composes: amount -> cost reads all three names
      spark.sql(s"ALTER TABLE graft.`$path` RENAME COLUMN amount TO cost")
      assert(spark.sql(
        s"SELECT CAST(SUM(cost) AS DOUBLE) FROM graft.`$path`")
        .collect().head.getDouble(0) === 450.0)
      // one full rewrite sheds the residue and clears the mapping
      spark.sql(s"CALL graft.compact(table => '$path')")
      assert(CommittedTable.manifestAt(spark, path).renames.isEmpty)
      assert(spark.sql(
        s"SELECT CAST(SUM(cost) AS DOUBLE) FROM graft.`$path`")
        .collect().head.getDouble(0) === 450.0)
      // after the shed, the former name is free again
      spark.sql(s"ALTER TABLE graft.`$path` ADD COLUMNS (price DOUBLE)")
      assert(spark.sql(s"SELECT price FROM graft.`$path` WHERE id = 1")
        .collect().head.isNullAt(0))
    }
  }

  test("ANALYZE + CBO: manifest row counts and NDV drive join REORDERING " +
      "— the small-intermediate join runs first; answers unchanged") {
    withTable("graft-cat-cbo") { base =>
      import spark.implicits._
      val big = base + "-big"; val mid = base + "-mid"; val small = base + "-small"
      CommittedTable.write(
        spark.range(2000).select(col("id"), col("id").as("k"),
          col("id").as("j"), (col("id") % 4).cast("string").as("p")).toDF(),
        big, "p")
      CommittedTable.write(
        spark.range(400).select(col("id").as("k"),
          (col("id") % 2).cast("string").as("p")).toDF(), mid, "p")
      CommittedTable.write(
        spark.range(20).select(col("id").as("j"),
          lit("x").as("p")).toDF(), small, "p")
      spark.sql(s"CALL graft.analyze(table => '$big', columns => 'k,j')")
      spark.sql(s"CALL graft.analyze(table => '$mid', columns => 'k')")
      spark.sql(s"CALL graft.analyze(table => '$small', columns => 'j')")
      assert(CommittedTable.manifestAt(spark, big).ndv.keySet === Set("k", "j"))
      val sql =
        s"""SELECT CAST(SUM(b.id) AS BIGINT) FROM graft.`$big` b
            JOIN graft.`$mid` m ON b.k = m.k
            JOIN graft.`$small` s ON b.j = s.j"""
      def innermostLeafPaths(df: org.apache.spark.sql.DataFrame): Set[String] = {
        import org.apache.spark.sql.catalyst.plans.logical.Join
        import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
        val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
        val innermost = joins.filter(j =>
          !j.children.exists(_.exists(_.isInstanceOf[Join]))).head
        innermost.collectLeaves().collect {
          case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
            r.location.rootPaths.head.toUri.getPath
        }.toSet
      }
      val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
      val prevRe = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
      try {
        // without CBO the syntactic order stands: (big ⋈ mid) first
        spark.conf.set("spark.sql.cbo.enabled", "false")
        assert(innermostLeafPaths(spark.sql(sql))
          .exists(_.endsWith("-mid")))
        // with CBO: est(big⋈small) = 2000·20/2000 = 20 rows beats
        // est(big⋈mid) = 2000·400/2000 = 400 — the optimizer flips the
        // order from the stats this engine handed it
        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        val df = spark.sql(sql)
        val inner = innermostLeafPaths(df)
        assert(inner.exists(_.endsWith("-big")) &&
          inner.exists(_.endsWith("-small")),
          s"CBO should join big⋈small first, got $inner")
        // and the reordered plan computes the same answer:
        // ids 0..19 → sum 190
        assert(df.collect().head.getLong(0) === 190L)
      } finally {
        spark.conf.set("spark.sql.cbo.enabled", prevCbo)
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevRe)
      }
    }
  }

  test("overwritePartitions: type drift fails loudly before any staging") {
    withTable("graft-cat-tdrift") { path =>
      seed(path)
      import spark.implicits._
      val drifted = Seq((9L, "a", 9, 1L)) // price INT, table has DOUBLE
        .toDF("id", "part", "price", "version")
      val e = intercept[IllegalArgumentException] {
        CommittedTable.overwritePartitions(drifted, path)
      }
      assert(e.getMessage.contains("type drift"))
      assert(CommittedTable.read(spark, path).count() === 8L)
    }
  }
}
