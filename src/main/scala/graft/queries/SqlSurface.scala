package graft.queries

import org.apache.spark.sql.functions._
import graft.queries.Registry.table

/** The committed-table SQL surface (graft.sql.GraftCatalog), gated
  * against the same DuckDB oracles as the Scala lakehouse verbs: every
  * statement here goes through `spark.sql(...)` TEXT — resolution via
  * the DSv2 catalog, reads substituted with the manifest-pruned native
  * parquet scan, DML routed into the one CommittedTable protocol — so a
  * pass proves SQL is a real front end over the same semantics, not a
  * parallel implementation.
  *
  * Fixture-scrub convention (q100/q119/q126): each query writes its own
  * committed table under a temp dir inside the timed body, runs the SQL,
  * collects, deletes the dir, and returns the collected rows.
  */
object SqlSurface {

  private val DSUM = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  private def scrub(wh: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(wh).getParent)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }

  private def finish(s: org.apache.spark.sql.SparkSession,
      out: org.apache.spark.sql.DataFrame, wh: String)
      : org.apache.spark.sql.DataFrame = {
    val rows = out.collect()
    val schema = out.schema
    scrub(wh)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** The MoR gates' routing witness, asserted on the MANIFEST rather
    * than on segment-directory survival: a copy-on-write rewrite ALSO
    * leaves old segment dirs on disk (retained anchors protect them
    * from GC), so `before.subsetOf(dirs)` could stay true under a
    * silent CoW regression. What CoW cannot fake is the manifest
    * itself — it would repoint every touched partition's `segment`
    * entry at a fresh dir and publish no delta entries. The witness
    * therefore pins (a) every pre-DML partition still maps to its
    * EXACT pre-DML base segment and (b) at least one partition carries
    * a live delta segment (the DML's written rows). Falsifiability is
    * proven in DeltaSegmentSpec: the same predicate flips FALSE when
    * the DML routes copy-on-write. */
  private[graft] def morWitness(s: org.apache.spark.sql.SparkSession, wh: String,
      before: Map[String, String]): Boolean = {
    val m = graft.sources.CommittedTable.manifestAt(s, wh)
    before.forall { case (p, seg) => m.segments.get(p).contains(seg) } &&
      m.segments.keys.exists(p =>
        graft.sources.CommittedTable.liveDeltas(m, p).nonEmpty)
  }

  val queries: Seq[Q] = Seq(

    // ---- SQL SELECT over a committed table --------------------------------
    // graft.`<path>` resolves through the DSv2 catalog; the WHERE combines
    // a partition-column equality (manifest key prune — unselected
    // segments never listed) with a zone-map range on o_totalprice
    // (segment min/max prune), both decided from metadata by
    // GraftFileIndex before the native vectorized scan runs; the exact
    // predicates are ALSO pushed to parquet, so pruning changes I/O only.
    // GraftCatalogSpec pins the pruned file counts; the oracle pins the
    // answer.
    Q("q141_sql_select", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q141").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        statsCols = Seq("o_totalprice", "o_orderkey"))
      val out = s.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            WHERE o_orderstatus = 'O'
              AND o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
            GROUP BY o_orderpriority""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderstatus = 'O'
        AND o_totalprice >= 50000.0 AND o_totalprice <= 150000.0
      GROUP BY o_orderpriority""")),

    // ---- SQL DELETE FROM --------------------------------------------------
    // q134's row-level delete issued as SQL text: the routed command runs
    // CommittedTable.delete — partition-scoped rewrite, atomic manifest
    // swap, fencing — so the survivors must equal the oracle's NOT-matched
    // set exactly (NULL predicate = kept is the spec's job; here the
    // predicate is total).
    Q("q142_sql_delete", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q142").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus")
      s.sql(s"DELETE FROM graft.`$wh` " +
        "WHERE o_orderkey % 7 = 0 AND o_totalprice < 200000.0")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE NOT (o_orderkey % 7 = 0 AND o_totalprice < 200000.0)
      GROUP BY o_orderstatus""")),

    // ---- SQL UPDATE -------------------------------------------------------
    // q136's row-level update as SQL text, INCLUDING the CDC-visibility
    // guard: the table declares versionCol, so the statement must bump it
    // in the same SET (a data-only update is refused — the r14 drift
    // finding made a contract). Assignments are simultaneous against
    // pre-update values on both engines.
    Q("q143_sql_update", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q143").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      s.sql(s"UPDATE graft.`$wh` SET " +
        "o_totalprice = o_totalprice + 500.0, version = version + 1 " +
        "WHERE o_orderstatus = 'O' AND o_orderkey % 3 = 0")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH upd AS (
        SELECT o_orderstatus,
          CASE WHEN o_orderstatus = 'O' AND o_orderkey % 3 = 0
               THEN o_totalprice + 500.0 ELSE o_totalprice END AS o_totalprice,
          CASE WHEN o_orderstatus = 'O' AND o_orderkey % 3 = 0
               THEN 2 ELSE 1 END AS version
        FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM upd GROUP BY o_orderstatus""")),

    // ---- SQL MERGE INTO ---------------------------------------------------
    // q119's exact merge fixture (upsert + partition move + insert, latest
    // version wins) issued as `MERGE INTO … WHEN MATCHED THEN UPDATE SET *
    // WHEN NOT MATCHED THEN INSERT *` — routed to CommittedTable.merge
    // using the key/version columns the MANIFEST declares, so the q119
    // oracle applies verbatim: SQL changes the entry point, never the
    // merge semantics.
    Q("q144_sql_merge", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q144").toString + "/wh"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      val k = col("o_orderkey")
      val upserts = o.filter(k % 19 === 0 || k % 31 === 0)
        .withColumn("o_totalprice",
          when(k % 19 === 0, col("o_totalprice") + 1000.0)
            .otherwise(col("o_totalprice")))
        .withColumn("o_orderstatus",
          when(k % 31 === 0 && k % 19 =!= 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .withColumn("version", lit(2L))
      val inserts = o.filter(k % 53 === 0)
        .withColumn("o_orderkey", k + 100000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("version", lit(2L))
      upserts.unionByName(inserts).createOrReplaceTempView("q144_src")
      s.sql(s"MERGE INTO graft.`$wh` t USING q144_src s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 1 AS version
        FROM orders),
      upd AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 31 = 0 AND o_orderkey % 19 <> 0
               THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          CASE WHEN o_orderkey % 19 = 0
               THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
          2 AS version
        FROM orders WHERE o_orderkey % 19 = 0 OR o_orderkey % 31 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice, 2
        FROM orders WHERE o_orderkey % 53 = 0),
      merged AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY o_orderkey
                      ORDER BY version DESC) AS rn
          FROM (SELECT * FROM base UNION ALL SELECT * FROM upd))
        WHERE rn = 1)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- SQL metadata-only COUNT(*) ---------------------------------------
    // q139's zero-job count through SQL text: GraftMetadataAgg collapses
    // the groupless COUNT(*) over the unfiltered committed scan to a
    // LocalRelation fed by manifest row counts — no file listed, no job
    // run (GraftCatalogSpec pins the plan shape; EXPLAIN.md carries the
    // dump). At 100 TB this is the difference between a metadata lookup
    // and a full scan.
    Q("q145_sql_metadata_count", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q145").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus")
      val out = s.sql(s"SELECT COUNT(*) AS n FROM graft.`$wh`")
      finish(s, out, wh)
    }, Some("SELECT COUNT(*) AS n FROM orders")),

    // ---- CBO: a small committed dim auto-broadcasts ----------------------
    // The star-join shape through the SQL surface, with NO hint anywhere:
    // GraftFileIndex reports the dim's real byte size (post-snapshot, from
    // the manifest's own segment files), so Catalyst's size estimate puts
    // the committed side under the broadcast threshold and plans a
    // BroadcastHashJoin — the fact side is never shuffled.
    // GraftCatalogSpec pins the plan (broadcast side = the graft scan);
    // the oracle pins the answer.
    Q("q150_sql_broadcast_join", (s, dir) => {
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q150").toString + "/wh"
      graft.sources.CommittedTable.write(c, wh, "c_mktsegment")
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .createOrReplaceTempView("q150_orders")
      val out = s.sql(
        s"""SELECT c.c_mktsegment, COUNT(*) AS n,
              CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o.o_totalprice")} AS sum_price
            FROM q150_orders o JOIN graft.`$wh` c
              ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment""")
      finish(s, out, wh)
    }, Some("""
      SELECT c.c_mktsegment, COUNT(*) AS n,
        CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment""")),

    // ---- Incremental aggregate view, SQL-only lifecycle ------------------
    // CALL init_agg_view bootstraps the COUNT/SUM/MIN/MAX view; routed SQL
    // DML mutates the source (a DELETE plus an UPDATE that MOVES rows into
    // a brand-new group and bumps the version column so the feed sees it);
    // CALL sync_agg_view drains the CDF feed (signed folds, per-group
    // rescans where a retraction hits an extreme); the final SELECT reads
    // the view as an ordinary committed table. The oracle recomputes the
    // groups from scratch over the post-DML state — a pass proves the
    // incremental fold CONVERGES to the full recompute through arbitrary
    // DML, with every measure integer-exact (value column is a key).
    Q("q153_sql_incremental_view", (s, dir) => {
      // a 1-in-3 slice: the gate proves CONVERGENCE through the DML
      // sequence (fixture cost is 4 table writes + a real checkpointed
      // stream — the q137 convention), not bulk throughput, which
      // q141-q144 already carry
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
        .withColumn("version", lit(1L))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-sql-q153").toString
      val src = s"$tmp/src"; val vw = s"$tmp/view"
      graft.sources.CommittedTable.write(o, src, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      // CDC consumers need the DML generations diffable: the feed cannot
      // diff the oldest retained generation against its GC'd predecessor,
      // so widen retention past the planned DML depth first
      s.sql(s"CALL graft.set_retention(table => '$src', retain => 10)")
      s.sql(s"CALL graft.init_agg_view(source => '$src', view => '$vw', " +
        "group_by => 'o_orderpriority', value => 'o_orderkey')")
      s.sql(s"DELETE FROM graft.`$src` WHERE o_orderkey % 7 = 0")
      s.sql(s"UPDATE graft.`$src` SET o_orderpriority = '9-MOVED', " +
        s"version = version + 1 WHERE o_orderkey % 11 = 0")
      s.sql(s"CALL graft.sync_agg_view(source => '$src', view => '$vw', " +
        "group_by => 'o_orderpriority', value => 'o_orderkey')")
      val out = s.sql(
        s"""SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
              CAST(sum_value AS BIGINT) AS sum_value,
              CAST(min_value AS BIGINT) AS min_value,
              CAST(max_value AS BIGINT) AS max_value
            FROM graft.`$vw`""")
      finish(s, out, src)
    }, Some("""
      WITH final AS (
        SELECT CASE WHEN o_orderkey % 11 = 0 THEN '9-MOVED'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_orderkey
        FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0)
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_value,
        CAST(MIN(o_orderkey) AS BIGINT) AS min_value,
        CAST(MAX(o_orderkey) AS BIGINT) AS max_value
      FROM final GROUP BY o_orderpriority""")),

    // ---- CTAS: table birth through SQL ------------------------------------
    // CREATE TABLE … PARTITIONED BY … TBLPROPERTIES(keycol/vercol/
    // statscols) AS SELECT routes to ONE CommittedTable.write (atomic
    // first publish, roles recorded in the manifest) — then a routed
    // DELETE proves the declared roles are live, and the final aggregate
    // reads through the zone-mapped catalog scan. The oracle recomputes
    // from the same filtered source.
    Q("q154_sql_ctas", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q154_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q154").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'statscols'='o_totalprice')
            AS SELECT * FROM q154_src WHERE o_totalprice >= 1000.0""")
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 13 = 0")
      val out = s.sql(
        s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            WHERE o_totalprice <= 200000.0
            GROUP BY o_orderstatus, o_orderpriority""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_totalprice >= 1000.0 AND o_orderkey % 13 <> 0
        AND o_totalprice <= 200000.0
      GROUP BY o_orderstatus, o_orderpriority""")),

    // ---- REPLACE TABLE AS SELECT: atomic overwrite with travelable past --
    // CTAS births the table (gen 1), set_retention republished (gen 2),
    // REPLACE swaps the whole content in ONE generation (gen 3) — and the
    // output reads BOTH worlds through SQL: the current table (the
    // replacement) and VERSION AS OF 2 (the pre-replace content), tagged
    // and unioned. The oracle recomputes both filters from the raw
    // source — a pass proves the overwrite is complete AND non-destructive
    // inside the retention window.
    Q("q155_sql_replace", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q155_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q155").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version')
            AS SELECT * FROM q155_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"CALL graft.set_retention(table => '$wh', retain => 5)")
      s.sql(s"REPLACE TABLE graft.`$wh` AS " +
        "SELECT * FROM q155_src WHERE o_orderkey % 3 = 0")
      val out = s.sql(
        s"""SELECT 'now' AS world, o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
            FROM graft.`$wh` GROUP BY o_orderstatus
            UNION ALL
            SELECT 'was' AS world, o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
            FROM graft.`$wh` VERSION AS OF 2 GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT 'now' AS world, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      FROM orders WHERE o_orderkey % 3 = 0 GROUP BY o_orderstatus
      UNION ALL
      SELECT 'was' AS world, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus""")),

    // ---- INSERT OVERWRITE PARTITION: the backfill verb --------------------
    // One partition ('O') is recomputed and swapped wholesale — the query
    // result REPLACES the partition's content (no key matching, unlike
    // INSERT INTO's upsert route) while every other status's segment
    // files are carried forward untouched (GraftCatalogSpec pins the
    // file-level carry). The oracle rebuilds the table as (all statuses
    // except 'O') ∪ (the recomputed 'O' subset) — a pass proves the
    // replacement is exact and the carry lost nothing.
    Q("q156_insert_overwrite", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q156").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        statsCols = Seq("o_totalprice"))
      o.filter(col("o_orderstatus") === "O" &&
          col("o_totalprice") >= lit(100000.0))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .createOrReplaceTempView("q156_backfill")
      s.sql(s"INSERT OVERWRITE graft.`$wh` PARTITION (o_orderstatus = 'O') " +
        "SELECT o_orderkey, o_totalprice FROM q156_backfill")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH replaced AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) + 1000.0 AS o_totalprice
        FROM orders WHERE o_orderstatus = 'O' AND o_totalprice >= 100000.0
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderstatus <> 'O')
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM replaced GROUP BY o_orderstatus""")),

    // ---- ALTER TABLE ADD COLUMNS: metadata-only widen ---------------------
    // The column is DECLARED (one manifest swap, zero data files moved —
    // GraftCatalogSpec pins the segment identity), reads NULL-fill it,
    // and a routed UPDATE then materializes values in the partitions it
    // rewrites while every other partition keeps NULL-filling. The
    // aggregate reads the mixed world: materialized 'O' rows + virtual
    // NULLs elsewhere. The oracle models the declare+update as one CASE.
    Q("q157_alter_add_columns", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q157").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      s.sql(s"ALTER TABLE graft.`$wh` ADD COLUMNS (fee DOUBLE)")
      s.sql(s"UPDATE graft.`$wh` SET fee = o_totalprice * 0.01, " +
        "version = version + 1 WHERE o_orderstatus = 'O'")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              COUNT(fee) AS n_fee,
              CAST(SUM(CAST(fee AS DECIMAL(18,4))) AS DOUBLE) AS sum_fee
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH widened AS (
        SELECT o_orderstatus,
          CASE WHEN o_orderstatus = 'O'
               THEN CAST(o_totalprice AS DOUBLE) * 0.01 END AS fee
        FROM orders)
      SELECT o_orderstatus, COUNT(*) AS n,
        COUNT(fee) AS n_fee,
        CAST(SUM(CAST(fee AS DECIMAL(18,4))) AS DOUBLE) AS sum_fee
      FROM widened GROUP BY o_orderstatus""")),

    // ---- dynamic partition pruning between two committed tables ----------
    // A month-partitioned committed fact star-joined to a committed month
    // dim: the dim's year filter prunes the fact scan's partitions at
    // RUNTIME through the reused broadcast (dynamicpruningexpression in
    // PartitionFilters — GraftCatalogSpec pins the filter and the
    // 12-of-N runtime file count; EXPLAIN §q158 the plan). At 100 TB the
    // fact's unselected months are never read — the scan does the year's
    // I/O, not the table's. The oracle collapses join+filter to the
    // equivalent month predicate.
    Q("q158_sql_dpp", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("omonth"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q158").toString
      val factPath = s"$wh/fact"
      val dimPath = s"$wh/dim"
      graft.sources.CommittedTable.write(o, factPath, "omonth")
      graft.sources.CommittedTable.write(
        o.select(col("omonth")).distinct()
          .withColumn("oyear", substring(col("omonth"), 1, 4)),
        dimPath, "oyear")
      s.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      try {
        val out = s.sql(
          s"""SELECT f.omonth, COUNT(*) AS n,
                CAST(SUM(f.o_orderkey) AS BIGINT) AS sum_keys,
                ${DSUM("f.o_totalprice")} AS sum_price
              FROM graft.`$factPath` f JOIN graft.`$dimPath` d
                ON f.omonth = d.omonth
              WHERE d.oyear = '1997'
              GROUP BY f.omonth""")
        finish(s, out, factPath)
      } finally s.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }, Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS omonth, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE strftime(o_orderdate, '%Y-%m') LIKE '1997-%'
      GROUP BY 1""")),

    // ---- full MERGE clause surface ----------------------------------------
    // One statement exercising every clause kind with SQL's
    // first-true-wins arbitration: a conditional UPDATE beating a
    // conditional DELETE on matched rows, a matched row neither clause
    // claims passing through untouched, a conditional INSERT dropping
    // low-value unmatched source rows, and WHEN NOT MATCHED BY SOURCE
    // update+delete over the unmatched remainder (the whole-table verb).
    // Routed to CommittedTable.mergeClauses — partition-scoped staged
    // rewrite, atomic publish, CDC version guard (every writing clause
    // bumps `version`). The oracle rebuilds the post-merge table from the
    // raw source with the same clause logic as CASE/anti-join algebra.
    Q("q159_sql_merge_full", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q159").toString + "/wh"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      val k = col("o_orderkey")
      val matchedSrc = o.filter(k % 13 === 0)
        .select(k.as("o_orderkey"),
          (col("o_totalprice") +
            when(k % 2 === 0, lit(5000.0)).otherwise(lit(-5000.0))).as("sval"))
      val insertSrc = o.filter(k % 53 === 0)
        .select((k + 300000000L).as("o_orderkey"),
          col("o_totalprice").cast("double").as("sval"))
      matchedSrc.unionByName(insertSrc).createOrReplaceTempView("q159_src")
      s.sql(
        s"""MERGE INTO graft.`$wh` t USING q159_src s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND s.sval > t.o_totalprice THEN
              UPDATE SET o_totalprice = s.sval, version = t.version + 1
            WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
            WHEN NOT MATCHED AND s.sval >= 100000.0 THEN
              INSERT (o_orderkey, o_orderstatus, o_totalprice, version)
              VALUES (s.o_orderkey, 'N', s.sval, 1)
            WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 97 = 0 THEN
              UPDATE SET o_totalprice = 0.0, version = t.version + 1
            WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 101 = 0 THEN
              DELETE""")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS price, 1 AS version
        FROM orders),
      src AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) +
                 CASE WHEN o_orderkey % 2 = 0 THEN 5000.0
                      ELSE -5000.0 END AS sval
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 300000000, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 53 = 0),
      kept AS (
        SELECT b.o_orderkey, b.o_orderstatus,
          CASE WHEN s.o_orderkey IS NOT NULL AND s.sval > b.price THEN s.sval
               WHEN s.o_orderkey IS NULL AND b.o_orderkey % 97 = 0 THEN 0.0
               ELSE b.price END AS price,
          CASE WHEN s.o_orderkey IS NOT NULL AND s.sval > b.price
                 THEN b.version + 1
               WHEN s.o_orderkey IS NULL AND b.o_orderkey % 97 = 0
                 THEN b.version + 1
               ELSE b.version END AS version
        FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL
                   AND NOT coalesce(s.sval > b.price, FALSE)
                   AND b.o_orderstatus = 'F')
          AND NOT (s.o_orderkey IS NULL AND b.o_orderkey % 97 <> 0
                   AND b.o_orderkey % 101 = 0)),
      ins AS (
        SELECT s.o_orderkey, 'N' AS o_orderstatus, s.sval AS price,
               1 AS version
        FROM src s LEFT JOIN base b ON s.o_orderkey = b.o_orderkey
        WHERE b.o_orderkey IS NULL AND s.sval >= 100000.0),
      merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- shallow clone ------------------------------------------------------
    // CALL graft.clone branches the table as METADATA (zero data copied —
    // CloneSpec pins that no segment dir exists under the clone until a
    // write); routed DML then makes the two worlds diverge copy-on-write:
    // the clone is DELETEd, the SOURCE is UPDATEd, and the gate reads
    // both tagged — a pass proves the clone saw the full snapshot, the
    // delete touched only the clone, and the source update never leaked
    // into the clone's inherited references.
    Q("q160_shallow_clone", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q160").toString
      val srcPath = s"$wh/src"; val clonePath = s"$wh/clone"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), srcPath, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      s.sql(s"CALL graft.clone(source => '$srcPath', target => '$clonePath')")
      s.sql(s"DELETE FROM graft.`$clonePath` WHERE o_orderkey % 5 = 0")
      s.sql(s"UPDATE graft.`$srcPath` SET o_totalprice = o_totalprice " +
        "+ 100.0, version = version + 1 WHERE o_orderkey % 7 = 0")
      val out = s.sql(
        s"""SELECT 'clone' AS world, o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$clonePath` GROUP BY o_orderstatus
            UNION ALL
            SELECT 'src' AS world, o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$srcPath` GROUP BY o_orderstatus""")
      finish(s, out, srcPath)
    }, Some("""
      SELECT 'clone' AS world, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY o_orderstatus
      UNION ALL
      SELECT 'src' AS world, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
                           THEN CAST(o_totalprice AS DOUBLE) + 100.0
                           ELSE CAST(o_totalprice AS DOUBLE) END
                 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),

    // ---- CHECK constraints --------------------------------------------------
    // The table is born (via CTAS) with a declared CHECK; a violating
    // routed UPDATE is REFUSED before the manifest swap (caught here —
    // the abort burns no generation and the staging is GC'd), then a
    // clean UPDATE lands. The oracle recomputes the final state with ONLY
    // the clean update applied: a pass proves the violating write left no
    // trace AND the enforcement did not disturb the valid one.
    Q("q161_check_constraints", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q161_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q161").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'check:positive_price'='o_totalprice >= 0')
            AS SELECT * FROM q161_src""")
      val refused =
        try {
          s.sql(s"UPDATE graft.`$wh` SET o_totalprice = -1.0, " +
            "version = version + 1 WHERE o_orderkey % 9 = 0")
          false
        } catch { case e: Exception
            if e.getMessage.contains("positive_price") => true }
      require(refused, "violating UPDATE must be refused by the CHECK")
      s.sql(s"UPDATE graft.`$wh` SET o_totalprice = o_totalprice + 50.0, " +
        "version = version + 1 WHERE o_orderkey % 9 = 0")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(CASE WHEN o_orderkey % 9 = 0
                           THEN CAST(o_totalprice AS DOUBLE) + 50.0
                           ELSE CAST(o_totalprice AS DOUBLE) END
                 AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(CASE WHEN o_orderkey % 9 = 0 THEN 2 ELSE 1 END) AS BIGINT)
          AS sum_version
      FROM orders GROUP BY o_orderstatus""")),

    // ---- bucketed tables: the shuffle-free keyed join ----------------------
    // Both sides written bucketed by their join key (8 buckets,
    // pmod(murmur3, n) file splits with Spark's _NNNNN suffixes); the
    // substituted scans carry the BucketSpec, so the SQL join plans a
    // sort-merge join with NO shuffle exchange on either side — the
    // dominant cost of a 100 TB keyed join removed at write time
    // (broadcast disabled in-gate so the bucketed path, not the q150 CBO
    // broadcast, is what runs; BucketedTableSpec pins the plan shape,
    // EXPLAIN §q162 the dump). The oracle is the plain join recompute —
    // bucketing must change the plan, never the answer.
    Q("q162_bucketed_join", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q162").toString
      val fPath = s"$wh/fact"; val dPath = s"$wh/dim"
      graft.sources.CommittedTable.write(o, fPath, "o_orderstatus",
        bucketBy = Some((8, Seq("o_custkey"))))
      graft.sources.CommittedTable.write(c, dPath, "c_mktsegment",
        bucketBy = Some((8, Seq("c_custkey"))))
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val out = s.sql(
          s"""SELECT c.c_mktsegment, COUNT(*) AS n,
                CAST(SUM(f.o_orderkey) AS BIGINT) AS sum_keys,
                ${DSUM("f.o_totalprice")} AS sum_price
              FROM graft.`$fPath` f JOIN graft.`$dPath` c
                ON f.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment""")
        finish(s, out, fPath)
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }, Some("""
      SELECT c.c_mktsegment, COUNT(*) AS n,
        CAST(SUM(o.o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment""")),

    // ---- schema-only CREATE TABLE + INSERT INTO the empty table ----------
    // The one DDL verb every Delta/Iceberg migration script leads with:
    // CREATE TABLE declares the schema and roles as pure manifest
    // metadata (an atomic ZERO-ROW generation-1 publish — no data file
    // exists anywhere), the empty table immediately reads as a typed
    // empty relation, and INSERT INTO … SELECT lands as an ordinary
    // generation-2 keyed publish under the same fencing. The oracle is
    // the inserted subset recomputed from the raw source — a pass proves
    // the DDL shell added nothing, lost nothing, and the declared
    // key/version roles routed the insert correctly.
    Q("q163_sql_create_insert", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q163_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q163").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            (o_orderkey BIGINT, o_orderstatus STRING,
             o_orderpriority STRING, o_totalprice DOUBLE, version BIGINT)
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'statscols'='o_totalprice')""")
      // the freshly created table is EMPTY by contract (counted from the
      // manifest, zero jobs) — fold that witness into the gated result
      val born = s.sql(s"SELECT COUNT(*) AS n FROM graft.`$wh`")
        .collect().head.getLong(0)
      s.sql(s"INSERT INTO graft.`$wh` " +
        "SELECT * FROM q163_src WHERE o_orderkey % 5 = 0")
      val out = s.sql(
        s"""SELECT o_orderstatus, o_orderpriority,
              COUNT(*) + $born AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus, o_orderpriority""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderkey % 5 = 0
      GROUP BY o_orderstatus, o_orderpriority""")),

    // ---- ALTER TABLE RENAME COLUMN (metadata-only) ------------------------
    // The rename never touches a data file: gen-1 files physically carry
    // the OLD name and serve the new one through the manifest's was=
    // mapping (read-side coalesce); the post-rename INSERT materializes
    // the new name, so the final aggregate reads BOTH file generations
    // through one scan. The oracle recomputes the same content from the
    // raw source under the new name — a pass proves the rename is exact
    // across mixed physical layouts.
    Q("q165_sql_rename_column", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q165_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q165").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version')
            AS SELECT * FROM q165_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"ALTER TABLE graft.`$wh` RENAME COLUMN o_totalprice TO amount")
      // one partition only: every OTHER status keeps gen-1 files that
      // physically carry the old name — the final scan mixes layouts
      s.sql(s"INSERT INTO graft.`$wh` " +
        "SELECT * FROM q165_src WHERE o_orderkey % 2 = 1 " +
        "AND o_orderkey % 3 = 0 AND o_orderstatus = 'O'")
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("amount")} AS sum_amount
            FROM graft.`$wh`
            WHERE amount >= 1000.0
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount
      FROM orders
      WHERE (o_orderkey % 2 = 0
             OR (o_orderkey % 6 = 3 AND o_orderstatus = 'O'))
        AND o_totalprice >= 1000.0
      GROUP BY o_orderstatus""")),

    // ---- Metadata-only MIN/MAX/COUNT (zone-map fold) ----------------------
    // GraftMetadataAgg collapses BOTH groupless aggregate subqueries to
    // LocalRelations fed by the manifest: COUNT(*) from the per-partition
    // row counts, MIN/MAX from the zone maps (per-segment min/max are
    // exact at publish, so their fold IS the table's extremes), and the
    // second subquery's partition-only WHERE restricts the fold to the
    // surviving partitions — the Iceberg `MAX(ts)` planner-query answered
    // without listing one file. MetadataAggSpec pins the no-scan plan and
    // every bail-out shape; EXPLAIN.md carries the dump. At 100 TB these
    // are the queries schedulers fire constantly ("how fresh is the
    // table", "how many rows landed today") — metadata answers or a
    // full-scan regression, nothing between.
    Q("q166_sql_metadata_minmax", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q166").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        statsCols = Seq("o_totalprice", "o_orderkey"))
      val out = s.sql(
        s"""SELECT g.n, g.mn_key, g.mx_key, g.mn_price, g.mx_price,
                   f.mx_price_o
            FROM (SELECT COUNT(*) AS n,
                    MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
                    MIN(o_totalprice) AS mn_price,
                    MAX(o_totalprice) AS mx_price
                  FROM graft.`$wh`) g
            CROSS JOIN
                 (SELECT MAX(o_totalprice) AS mx_price_o
                  FROM graft.`$wh` WHERE o_orderstatus = 'O') f""")
      finish(s, out, wh)
    }, Some("""
      SELECT g.n, g.mn_key, g.mx_key, g.mn_price, g.mx_price, f.mx_price_o
      FROM (SELECT COUNT(*) AS n,
              MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
              MIN(o_totalprice) AS mn_price, MAX(o_totalprice) AS mx_price
            FROM orders) g
      CROSS JOIN
           (SELECT MAX(o_totalprice) AS mx_price_o
            FROM orders WHERE o_orderstatus = 'O') f""")),

    // ---- Optimistic concurrency: partition-disjoint rebase ----------------
    // Two writers race deterministically (crashPoint injection): while an
    // overwritePartitions of partition 'F' sits staged-but-unpublished, a
    // merge INSERTs brand-new keys into partition 'O' and wins the
    // generation. The overwrite then REBASES — its staged bytes depend on
    // nothing the winner touched (readParts = ∅, touched = {F}, winner
    // touched {O}) — and publishes on top instead of aborting, so the
    // final table carries BOTH effects with no retry recompute.
    // ConcurrencySpec pins the abort cases (overlap, metadata motion,
    // merge's whole-table read scope); the oracle pins that rebased =
    // both-effects-applied, exactly. The 100 TB story: ingestion and
    // backfills to disjoint partitions never serialize on the manifest.
    Q("q167_concurrent_rebase", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q167").toString + "/wh"
      graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      val overwriteF = src.filter(col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2.0)
        .withColumn("version", lit(2L))
      val insertO = src.filter(col("o_orderkey") % 997 === 0)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
          lit("O").as("o_orderstatus"), col("o_totalprice"),
          lit(2L).as("version"))
      var injected = false
      graft.sources.CommittedTable.overwritePartitions(overwriteF, wh,
        crashPoint = {
          case "before-swap" if !injected =>
            injected = true
            graft.sources.CommittedTable.merge(s, wh, insertO,
              "o_orderkey", "version", "o_orderstatus")
          case _ => ()
        })
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH src AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
                     1 AS version FROM orders),
      final AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               CASE WHEN o_orderstatus = 'F' THEN 2 ELSE 1 END AS version
        FROM src
        UNION ALL
        SELECT o_orderkey + 100000000, 'O', o_totalprice, 2
        FROM src WHERE o_orderkey % 997 = 0)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(version) AS BIGINT) AS sum_version,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM final GROUP BY o_orderstatus""")),

    // ---- Partition-scoped compaction (bounded maintenance) ----------------
    // The 100 TB maintenance verb: whole-table compact is a non-starter
    // there, but fragmentation is LOCAL (streams and small merges
    // fragment the partitions they touch). fragmentedPartitions selects
    // targets from the manifest's f= lists alone (zero listStatus), and
    // compactPartitions rewrites ONLY those — every other partition's
    // segments carry by reference — under Rebase credentials, so
    // maintenance never blocks disjoint ingestion (ConcurrencySpec races
    // it). The gate fragments every partition (salted parallel staging),
    // compacts the selected set, and proves content identity plus the
    // all-compacted witness; the aggregate afterwards still answers
    // COUNT from metadata.
    Q("q168_compact_partitions", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .repartition(8)
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q168").toString + "/wh"
      // pin AQE's small-shuffle coalescing off so the salted staging
      // actually fans out at gate scale (at real scale it always does)
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        filesPerPartition = 4,
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      finally s.conf
        .set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      val frag = graft.sources.CommittedTable
        .fragmentedPartitions(s, wh, maxFiles = 1)
      graft.sources.CommittedTable.compactPartitions(s, wh, frag)
      val compacted = graft.sources.CommittedTable
        .fragmentedPartitions(s, wh, maxFiles = 1).isEmpty
      val out = s.sql(
        s"""SELECT o_orderstatus, $compacted AS compacted, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, TRUE AS compacted, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),

    // ---- Metadata-only GROUP BY the partition column ----------------------
    // The q166 fold, grouped: GROUP BY exactly the partition column is
    // the manifest's OWN shape (one rows=/stats line per partition), so
    // COUNT(*)/MIN/MAX per partition collapse to a LocalRelation with
    // one row per live partition — zero files opened — and a
    // partition-only WHERE restricts which groups emit. At 100 TB this
    // is the partition-health dashboard ("rows and freshness per day")
    // answered entirely from metadata. MetadataAggSpec pins the no-scan
    // plan, the deleted-partition-emits-no-group rule, and every
    // bail-out (non-partition key, expression key, multi-key grouping
    // all scan and match).
    Q("q169_sql_metadata_groupby", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q169").toString + "/wh"
      graft.sources.CommittedTable.write(o, wh, "o_orderstatus",
        statsCols = Seq("o_orderkey", "o_totalprice"))
      val out = s.sql(
        s"""SELECT 'all' AS scope, o_orderstatus, COUNT(*) AS n,
              MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
              MAX(o_totalprice) AS mx_price
            FROM graft.`$wh` GROUP BY o_orderstatus
            UNION ALL
            SELECT 'filtered' AS scope, o_orderstatus, COUNT(*) AS n,
              MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
              MAX(o_totalprice) AS mx_price
            FROM graft.`$wh` WHERE o_orderstatus IN ('O', 'F')
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT 'all' AS scope, o_orderstatus, COUNT(*) AS n,
        MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
        MAX(o_totalprice) AS mx_price
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'filtered' AS scope, o_orderstatus, COUNT(*) AS n,
        MIN(o_orderkey) AS mn_key, MAX(o_orderkey) AS mx_key,
        MAX(o_totalprice) AS mx_price
      FROM orders WHERE o_orderstatus IN ('O', 'F')
      GROUP BY o_orderstatus""")),

    // ---- Deletion vectors (merge-on-read DELETE) --------------------------
    // The Delta-DV / Iceberg-position-delete move: with
    // 'deletemode'='mor', DELETE publishes the matched rows' (file,
    // row_index) positions as a parquet vector — O(deleted rows)
    // written, ZERO segments rewritten (the gate asserts the segment
    // set is bit-identical across both deletes and feeds the witness
    // through the oracle) — and every read anti-joins live vectors out.
    // The second DELETE folds the first vector (exact disjoint union).
    // COUNT(*) stays a scan-free metadata fold (logical counts =
    // physical minus vector rows); zone-map MIN/MAX turns conservative
    // and bails. At 100 TB this is a 1k-row compliance takedown costing
    // 1k positions instead of a multi-TB partition rewrite.
    // DeleteVectorSpec/DeleteVectorSqlSpec pin the protocol (time
    // travel, CDF tombstones, rewrite materialization, clone, sharded
    // roots); EXPLAIN §q170 shows the wrapped plan.
    Q("q170_delete_vectors", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q170").toString + "/wh"
      graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"),
        statsCols = Seq("o_totalprice"))
      graft.sources.CommittedTable.setDeleteMode(s, wh, Some("mor"))
      def segs(): Set[String] = {
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.map(_.getFileName.toString)
            .filter(_.startsWith("seg-")).toSet
        } finally st.close()
      }
      val before = segs()
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 7 = 3")
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 11 = 5")
      val mor = segs() == before
      val out = s.sql(
        s"""SELECT o_orderstatus, $mor AS mor, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, TRUE AS mor, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE NOT (o_orderkey % 7 = 3) AND NOT (o_orderkey % 11 = 5)
      GROUP BY o_orderstatus""")),

    // ---- Table-valued CDF: graft_changes() --------------------------------
    // Delta's `table_changes` surface as a real TVF
    // (injectTableFunction → GraftTableFunctions.changes): the
    // change-data-feed of a generation RANGE — here gen 2..current with
    // to_version defaulted — as one SQL relation, each row tagged
    // _change_type / _commit_version / _commit_timestamp. Every
    // generation's batch is manifest-pruned to the partitions that
    // generation touched (O(rewritten data), never a full-table diff),
    // and the version/timestamp columns are driver-side metadata. The
    // oracle re-derives the exact change sets: gen 2's UPDATE emits
    // pre+post images of the %97 keys; gen 3's DELETE emits tombstones
    // of the %89 keys AT THEIR CURRENT (post-update) values.
    Q("q171_sql_table_changes", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q171_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q171").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'retain'='4')
            AS SELECT * FROM q171_src""") // gen 1
      s.sql(
        s"""UPDATE graft.`$wh`
            SET o_totalprice = o_totalprice + 1000.0, version = 2
            WHERE o_orderkey % 97 = 0""") // gen 2
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 89 = 0") // gen 3
      val out = s.sql(
        s"""SELECT _commit_version AS change_gen, _change_type AS change_type,
              COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              CAST(COUNT(DISTINCT _commit_timestamp) AS BIGINT) AS n_ts
            FROM graft_changes('$wh', 2)
            GROUP BY _commit_version, _change_type""")
      finish(s, out, wh)
    }, Some("""
      WITH cdf AS (
        SELECT 2 AS change_gen, 'update_preimage' AS change_type,
          o_orderkey, o_totalprice, 1 AS version
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT 2, 'update_postimage', o_orderkey, o_totalprice + 1000.0, 2
        FROM orders WHERE o_orderkey % 97 = 0
        UNION ALL
        -- tombstones at CURRENT values: keys the update touched carry it
        SELECT 3, 'delete', o_orderkey,
          CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000.0
               ELSE o_totalprice END,
          CASE WHEN o_orderkey % 97 = 0 THEN 2 ELSE 1 END
        FROM orders WHERE o_orderkey % 89 = 0
      )
      SELECT CAST(change_gen AS BIGINT) AS change_gen, change_type,
        COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version,
        CAST(1 AS BIGINT) AS n_ts
      FROM cdf
      GROUP BY change_gen, change_type""")),

    // ---- Per-file zone maps (intra-partition data skipping) ---------------
    // The Delta/Iceberg file-skipping model: every publish records each
    // staged file's (min, max) per stats column as manifest fs= lines
    // (same aggregate, one level finer — the partition zone map is the
    // fold of its files'), and the SQL scan drops FILES a range
    // predicate cannot touch inside surviving partitions. The table is
    // range-clustered (repartitionByRange upstream makes the write's
    // deterministic salt a range bucket; AQE off so the tiny test-scale
    // staging shuffle doesn't coalesce), so the top-range query must
    // plan strictly fewer files than the table holds — that witness
    // feeds the oracle as a column. At 100 TB a partition is hundreds
    // of files; reading the two that overlap beats reading the segment.
    Q("q173_file_skipping", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .repartitionByRange(4, col("o_orderkey"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q173").toString + "/wh"
      val prevAqe = s.conf.get("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        statsCols = Seq("o_orderkey"), sortCols = Seq("o_orderkey"),
        filesPerPartition = 4)
      finally s.conf.set("spark.sql.adaptive.enabled", prevAqe)
      // scale-relative cutoff (75% of the key range) so the gate prunes
      // at every SF; the MAX itself is a metadata fold — no scan
      val maxKey = s.sql(s"SELECT MAX(o_orderkey) FROM graft.`$wh`")
        .head().getLong(0)
      val cut = 3L * maxKey / 4L
      val q = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            WHERE o_orderkey >= $cut
            GROUP BY o_orderstatus""")
      // witness: the committed scan planned strictly fewer files than
      // the table holds — the pruning is real, not just a fast answer
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val planned = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.relation.location.isInstanceOf[graft.sql.GraftFileIndex] =>
          sc.selectedPartitions.totalNumberOfFiles
      }.sum
      val total = {
        val st = java.nio.file.Files.list(java.nio.file.Paths.get(wh))
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.getFileName.toString.startsWith("seg-"))
            .map { seg =>
              val f = java.nio.file.Files.list(seg)
              try f.iterator().asScala.count(p =>
                !p.getFileName.toString.startsWith("_") &&
                !p.getFileName.toString.startsWith("."))
              finally f.close()
            }.sum
        } finally st.close()
      }
      val out = q.withColumn("skipped", lit(planned > 0 && planned < total))
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        TRUE AS skipped
      FROM orders
      WHERE o_orderkey >= (SELECT CAST(FLOOR(3 * MAX(o_orderkey) / 4.0)
                                       AS BIGINT) FROM orders)
      GROUP BY o_orderstatus""")),

    // ---- Declared clustering (layout maintains itself) --------------------
    // TBLPROPERTIES 'clusterby' + 'clusterfiles' (the liquid-clustering
    // UX): after the declaration, EVERY row-writing publish range-
    // clusters its staged partitions — here a routed SQL UPDATE rewrites
    // all three partitions and the rewritten files come out with
    // near-disjoint per-file key ranges, so the top-quartile range query
    // plans strictly fewer files than the table holds WITHOUT any
    // compact/OPTIMIZE call. The witness column proves the skip; the
    // oracle re-derives the UPDATE's arithmetic.
    Q("q174_declared_clustering", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q174_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q174").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'statscols'='o_orderkey',
                          'clusterby'='o_orderkey', 'clusterfiles'='4')
            AS SELECT * FROM q174_src""") // gen 1 + the declaration
      s.sql(
        s"""UPDATE graft.`$wh`
            SET o_totalprice = o_totalprice + 1000.0, version = 2
            WHERE o_orderkey % 9 = 1""") // rewrites every partition CLUSTERED
      val maxKey = s.sql(s"SELECT MAX(o_orderkey) FROM graft.`$wh`")
        .head().getLong(0)
      val cut = 3L * maxKey / 4L
      val q = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            WHERE o_orderkey >= $cut
            GROUP BY o_orderstatus""")
      val plan = q.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val planned = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.relation.location.isInstanceOf[graft.sql.GraftFileIndex] =>
          sc.selectedPartitions.totalNumberOfFiles
      }.sum
      // LIVE file total from the manifest's own f= lines (retired
      // generations' segments still sit on disk inside retention)
      val total = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(wh, "_commit")), "UTF-8")
        .linesIterator.count(_.startsWith("f="))
      val out = q.withColumn("skipped", lit(planned > 0 && planned < total))
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(CASE WHEN o_orderkey % 9 = 1
                           THEN o_totalprice + 1000.0
                           ELSE o_totalprice END AS DECIMAL(18,2)))
             AS DOUBLE) AS sum_price,
        TRUE AS skipped
      FROM orders
      WHERE o_orderkey >= (SELECT CAST(FLOOR(3 * MAX(o_orderkey) / 4.0)
                                       AS BIGINT) FROM orders)
      GROUP BY o_orderstatus""")),

    // ---- Merge-on-read MERGE (deletion vector + delta segment) ------------
    // CommittedTable.mergeMor: the write-amplification complement of
    // q170's MoR DELETE — a keyed upsert publishes the superseded rows'
    // (file, row_index) positions as a deletion vector and the winning
    // rows as per-partition DELTA dirs the manifest unions with the base
    // segment at read time. O(changed + new rows) written; the gate's
    // witness asserts every base segment survived both merges untouched
    // (`mor`) while the answer equals the oracle's latest-version-wins
    // replay over the raw source. The existing-side probe is
    // bloom-sidecar-pruned (bloomcols o_orderkey); COUNT/aggregates read
    // base∪delta minus vector. At 100 TB a 1k-row upsert scattered over
    // hot multi-GB partitions costs 1k rows of parquet, not the
    // partitions' rewrite. DeltaSegmentSpec pins the protocol (ties,
    // moves, time travel, CDF, clone, GC, compaction materialization,
    // the rebase race); EXPLAIN §q175 shows the wrapped plan.
    Q("q175_merge_mor", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q175").toString + "/wh"
      graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"),
        statsCols = Seq("o_totalprice"), bloomCols = Seq("o_orderkey"))
      val before = graft.sources.CommittedTable.manifestAt(s, wh).segments
      // merge 1: in-place upserts (strictly newer versions)
      graft.sources.CommittedTable.mergeMor(s, wh,
        src.filter(col("o_orderkey") % 13 === 1)
          .withColumn("o_totalprice", col("o_totalprice") + 5000.0)
          .withColumn("version", lit(2L)),
        "o_orderkey", "version", "o_orderstatus")
      // merge 2: brand-new keys (insert-only — no vector needed)
      graft.sources.CommittedTable.mergeMor(s, wh,
        src.filter(col("o_orderkey") % 17 === 3)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
            col("o_orderstatus"), lit(999.99).as("o_totalprice"),
            lit(1L).as("version")),
        "o_orderkey", "version", "o_orderstatus")
      val mor = morWitness(s, wh, before)
      val out = s.sql(
        s"""SELECT o_orderstatus, $mor AS mor, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH merged AS (
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderkey % 13 = 1 THEN o_totalprice + 5000.0
               ELSE o_totalprice END AS o_totalprice,
          CASE WHEN o_orderkey % 13 = 1 THEN 2 ELSE 1 END AS version
        FROM orders
        UNION ALL
        SELECT o_orderkey + 10000000, o_orderstatus, 999.99, 1
        FROM orders WHERE o_orderkey % 17 = 3
      )
      SELECT o_orderstatus, TRUE AS mor, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(version) AS BIGINT) AS sum_version,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Merge-on-read UPDATE through pure SQL ----------------------------
    // TBLPROPERTIES 'updatemode'='mor' routes `UPDATE` through
    // CommittedTable.updateMor: the matched rows' positions publish as a
    // deletion vector and their updated images as delta segments —
    // O(matched rows) written, zero partitions rewritten (the witness
    // asserts the CTAS segments survived). The whole statement is SQL
    // text end-to-end: CTAS declares the policy, UPDATE inherits it, the
    // SELECT reads base∪delta minus vector through the substituted scan.
    Q("q176_sql_update_mor", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q176_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q176").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'updatemode'='mor')
            AS SELECT * FROM q176_src""") // gen 1
      val before = graft.sources.CommittedTable.manifestAt(s, wh).segments
      s.sql(
        s"""UPDATE graft.`$wh`
            SET o_totalprice = o_totalprice * 2.0, version = 2
            WHERE o_orderkey % 7 = 2""") // gen 2, MoR-routed
      val mor = morWitness(s, wh, before)
      val out = s.sql(
        s"""SELECT o_orderstatus, $mor AS mor, COUNT(*) AS n,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, TRUE AS mor, COUNT(*) AS n,
        CAST(SUM(CASE WHEN o_orderkey % 7 = 2 THEN 2 ELSE 1 END)
             AS BIGINT) AS sum_version,
        CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 2 THEN o_totalprice * 2.0
                           ELSE o_totalprice END AS DECIMAL(18,2)))
             AS DOUBLE) AS sum_price
      FROM orders GROUP BY o_orderstatus""")),

    // ---- Merge-on-read MERGE INTO: the full clause surface ----------------
    // q159's exact statement (conditional matched UPDATE/DELETE chain,
    // conditional NOT MATCHED INSERT, both BY SOURCE kinds) against the
    // SAME oracle, but the table declares 'updatemode'='mor' — the
    // routed MERGE runs CommittedTable.mergeClausesMor: claimed target
    // rows retire into a deletion vector, written rows (update images +
    // inserts) land as delta segments, UNCLAIMED rows are never restaged
    // (copy-on-write must rewrite every affected partition whole). The
    // witness pins that every pre-merge base segment survived. Same
    // answers, O(claimed + written rows) published.
    Q("q177_sql_merge_mor_clauses", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q177").toString + "/wh"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      graft.sources.CommittedTable.setUpdateMode(s, wh, Some("mor"))
      val before = graft.sources.CommittedTable.manifestAt(s, wh).segments
      val k = col("o_orderkey")
      val matchedSrc = o.filter(k % 13 === 0)
        .select(k.as("o_orderkey"),
          (col("o_totalprice") +
            when(k % 2 === 0, lit(5000.0)).otherwise(lit(-5000.0))).as("sval"))
      val insertSrc = o.filter(k % 53 === 0)
        .select((k + 300000000L).as("o_orderkey"),
          col("o_totalprice").cast("double").as("sval"))
      matchedSrc.unionByName(insertSrc).createOrReplaceTempView("q177_src")
      s.sql(
        s"""MERGE INTO graft.`$wh` t USING q177_src s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND s.sval > t.o_totalprice THEN
              UPDATE SET o_totalprice = s.sval, version = t.version + 1
            WHEN MATCHED AND t.o_orderstatus = 'F' THEN DELETE
            WHEN NOT MATCHED AND s.sval >= 100000.0 THEN
              INSERT (o_orderkey, o_orderstatus, o_totalprice, version)
              VALUES (s.o_orderkey, 'N', s.sval, 1)
            WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 97 = 0 THEN
              UPDATE SET o_totalprice = 0.0, version = t.version + 1
            WHEN NOT MATCHED BY SOURCE AND t.o_orderkey % 101 = 0 THEN
              DELETE""")
      val mor = morWitness(s, wh, before)
      val out = s.sql(
        s"""SELECT o_orderstatus, $mor AS mor, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh` GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS price, 1 AS version
        FROM orders),
      src AS (
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) +
                 CASE WHEN o_orderkey % 2 = 0 THEN 5000.0
                      ELSE -5000.0 END AS sval
        FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 300000000, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 53 = 0),
      kept AS (
        SELECT b.o_orderkey, b.o_orderstatus,
          CASE WHEN s.o_orderkey IS NOT NULL AND s.sval > b.price THEN s.sval
               WHEN s.o_orderkey IS NULL AND b.o_orderkey % 97 = 0 THEN 0.0
               ELSE b.price END AS price,
          CASE WHEN s.o_orderkey IS NOT NULL AND s.sval > b.price
                 THEN b.version + 1
               WHEN s.o_orderkey IS NULL AND b.o_orderkey % 97 = 0
                 THEN b.version + 1
               ELSE b.version END AS version
        FROM base b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL
                   AND NOT coalesce(s.sval > b.price, FALSE)
                   AND b.o_orderstatus = 'F')
          AND NOT (s.o_orderkey IS NULL AND b.o_orderkey % 97 <> 0
                   AND b.o_orderkey % 101 = 0)),
      ins AS (
        SELECT s.o_orderkey, 'N' AS o_orderstatus, s.sval AS price,
               1 AS version
        FROM src s LEFT JOIN base b ON s.o_orderkey = b.o_orderkey
        WHERE b.o_orderkey IS NULL AND s.sval >= 100000.0),
      merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      SELECT o_orderstatus, TRUE AS mor, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(version) AS BIGINT) AS sum_version
      FROM merged GROUP BY o_orderstatus""")),

    // ---- Partition evolution (CALL graft.repartition_by) -------------------
    // Re-key the physical layout to a different partition column as ONE
    // content-preserving generation: the table starts o_orderstatus-
    // keyed, evolves to o_orderpriority, and the post-evolution SELECT
    // (whose WHERE now prunes on the NEW key — the witness pins both the
    // manifest's partcol and a metadata-pruned partition count) must
    // equal the oracle over the raw source. History keeps serving the
    // old generations under the old layout and the change feed sees a
    // layout-only generation (PartitionEvolutionSpec pins both); at
    // 100 TB this is the honest O(table) rewrite partitioning mistakes
    // cost — but atomic, travelable, and done while readers stay up.
    Q("q178_sql_repartition", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q178").toString + "/wh"
      graft.sources.CommittedTable.write(
        o.withColumn("version", lit(1L)), wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"),
        statsCols = Seq("o_totalprice"))
      s.sql(s"CALL graft.repartition_by(table => '$wh', " +
        "column => 'o_orderpriority')")
      // witness: the layout is REALLY the new key — a partition-value
      // count answers from the manifest under the new column
      val urgent = graft.sources.CommittedTable.count(s, wh,
        Some(Seq("1-URGENT")))
      val out = s.sql(
        s"""SELECT o_orderpriority, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              (COUNT(*) = $urgent OR o_orderpriority <> '1-URGENT')
                AS pruned_count_ok
            FROM graft.`$wh`
            GROUP BY o_orderpriority""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        TRUE AS pruned_count_ok
      FROM orders GROUP BY o_orderpriority""")),

    // ---- Per-partition manifest introspection: graft_partitions() ---------
    // The ops surface behind fragmentedPartitions/readAmplifiedPartitions
    // as one SQL relation — and a STRONG bookkeeping gate: after a MoR
    // merge (superseded base rows → vector, winners → delta) and a MoR
    // delete (positions across base AND delta files, prior vector
    // folded), the manifest's per-partition accounting must equal the
    // DATA-level truth the oracle re-derives from the raw table:
    // base_rows = the original physical counts, dv_rows = one position
    // per superseded base row (%13 keys) PLUS one per deleted visible
    // row (%7 keys — a key hit by both contributes two positions, its
    // base original and its delta image), delta_rows = the staged
    // winners, logical_rows = base − dv + delta = what every read
    // serves. Zero data files are opened to answer — manifest lines
    // only.
    Q("q179_sql_partitions", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q179").toString + "/wh"
      graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      graft.sources.CommittedTable.mergeMor(s, wh,
        src.filter(col("o_orderkey") % 13 === 1)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0)
          .withColumn("version", lit(2L)),
        "o_orderkey", "version", "o_orderstatus")
      graft.sources.CommittedTable.deleteMor(s, wh,
        col("o_orderkey") % 7 === 3, "o_orderstatus")
      val out = s.sql(
        s"""SELECT partition AS o_orderstatus, base_rows, dv_rows,
              delta_rows, logical_rows
            FROM graft_partitions('$wh')""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus,
        COUNT(*) AS base_rows,
        CAST(SUM(CASE WHEN o_orderkey % 13 = 1 THEN 1 ELSE 0 END) +
             SUM(CASE WHEN o_orderkey % 7 = 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS dv_rows,
        CAST(SUM(CASE WHEN o_orderkey % 13 = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS delta_rows,
        CAST(COUNT(*) -
             SUM(CASE WHEN o_orderkey % 7 = 3 THEN 1 ELSE 0 END)
             AS BIGINT) AS logical_rows
      FROM orders GROUP BY o_orderstatus""")),

    // ---- RESTORE (rollback as a forward generation) -----------------------
    // CALL graft.restore rolls the table back to a RETAINED generation by
    // publishing a NEW generation whose content is the anchor's —
    // metadata-only at any table size (segments carried by reference;
    // history rolls FORWARD, so the undone generations stay readable and
    // a second restore re-does). Two destructive DML generations are
    // then fully undone: the SELECT must equal the pristine CTAS input,
    // which the oracle reads straight from the source table.
    Q("q172_sql_restore", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q172_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q172").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'retain'='4')
            AS SELECT * FROM q172_src""") // gen 1
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 5 = 2") // gen 2
      s.sql(
        s"""UPDATE graft.`$wh`
            SET o_totalprice = 0.0, version = 2
            WHERE o_orderkey % 3 = 0""") // gen 3
      s.sql(s"CALL graft.restore(table => '$wh', version => 1)") // gen 4
      val out = s.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              ${DSUM("o_totalprice")} AS sum_price,
              CAST(SUM(version) AS BIGINT) AS sum_version
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      finish(s, out, wh)
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS sum_version
      FROM orders
      GROUP BY o_orderstatus""")),

    // ---- Generation history as a SQL relation: graft_history() ------------
    // The audit surface joined to the audit trail: graft_history's one
    // row per retained generation (verb, live partition count, logical
    // rows, currency) LEFT-joined to graft_changes' per-generation CDF
    // on _commit_version — so the gate pins that (a) every publish
    // recorded its verb, (b) the manifest's logical row accounting
    // tracks each DML exactly, and (c) the history relation and the
    // change feed agree on generation identity. The oracle re-derives
    // all of it from the DML script over the raw table. Driver-side
    // metadata only: one listing + one small anchor read per retained
    // generation; the CDF side is manifest-pruned to rewritten
    // partitions (the q171 contract).
    Q("q180_sql_history", (s, dir) => {
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
        .createOrReplaceTempView("q180_src")
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q180").toString + "/wh"
      s.sql(
        s"""CREATE TABLE graft.`$wh`
            PARTITIONED BY (o_orderstatus)
            TBLPROPERTIES('keycol'='o_orderkey', 'vercol'='version',
                          'retain'='6')
            AS SELECT * FROM q180_src""") // gen 1, op=write
      s.sql(
        s"""UPDATE graft.`$wh`
            SET o_totalprice = o_totalprice + 100.0, version = 2
            WHERE o_orderkey % 11 = 4""") // gen 2, op=update
      s.sql(s"DELETE FROM graft.`$wh` WHERE o_orderkey % 19 = 7") // gen 3
      val out = s.sql(
        s"""SELECT h.generation, h.operation,
              CAST(h.partitions AS BIGINT) AS n_partitions,
              h.`rows` AS n_rows, h.is_current,
              COALESCE(c.n_changes, CAST(0 AS BIGINT)) AS n_changes,
              COALESCE(c.sum_keys, CAST(0 AS BIGINT)) AS change_sum_keys
            FROM graft_history('$wh') h
            LEFT JOIN (
              SELECT _commit_version, COUNT(*) AS n_changes,
                CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
              FROM graft_changes('$wh', 2)
              GROUP BY _commit_version) c
            ON h.generation = c._commit_version""")
      finish(s, out, wh)
    }, Some("""
      WITH p AS (
        SELECT COUNT(DISTINCT o_orderstatus) AS np, COUNT(*) AS n
        FROM orders),
      upd AS (
        SELECT COUNT(*) AS nu, SUM(o_orderkey) AS su
        FROM orders WHERE o_orderkey % 11 = 4),
      del AS (
        SELECT COUNT(*) AS nd, SUM(o_orderkey) AS sd
        FROM orders WHERE o_orderkey % 19 = 7)
      SELECT CAST(1 AS BIGINT) AS generation, 'write' AS operation,
        CAST(np AS BIGINT) AS n_partitions, CAST(n AS BIGINT) AS n_rows,
        FALSE AS is_current, CAST(0 AS BIGINT) AS n_changes,
        CAST(0 AS BIGINT) AS change_sum_keys
      FROM p
      UNION ALL
      SELECT 2, 'update', CAST(np AS BIGINT), CAST(n AS BIGINT), FALSE,
        CAST(2 * nu AS BIGINT), CAST(2 * su AS BIGINT)
      FROM p, upd
      UNION ALL
      SELECT 3, 'delete', CAST(np AS BIGINT), CAST(n - nd AS BIGINT), TRUE,
        CAST(nd AS BIGINT), CAST(sd AS BIGINT)
      FROM p, del""")),

    // ---- Merge-on-read endurance: 8-deep delta stack, travel, optimize ----
    // The maintenance lifecycle as one gate: EIGHT successive mergeMor
    // generations pile deltas and fold deletion vectors on every
    // partition (merge i upserts keys ≡ 0 mod i+2 at version i+1 —
    // strictly increasing versions, so each matching merge supersedes
    // the stack beneath it), then a MoR DELETE retires keys across base
    // AND delta files, then a mid-stack `VERSION AS OF` read proves
    // time travel stays exact under live vectors+deltas, then `CALL
    // graft.optimize(max_files => 1)` materializes the whole stack back
    // to one segment per partition — the witness asserts the
    // post-optimize manifest carries ZERO delta dirs and ZERO live
    // vectors — and the final read must equal the oracle's full replay.
    // At 100 TB this is the steady state of a MoR-upserting ingest:
    // bounded read amplification, self-remediating layout, history
    // intact throughout (DeltaSegmentSpec pins the 20-deep variant with
    // crash points; this gates the end-to-end answer).
    Q("q181_mor_endurance", (s, dir) => {
      val src = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("version", lit(1L))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q181").toString + "/wh"
      graft.sources.CommittedTable.write(src, wh, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"),
        bloomCols = Seq("o_orderkey"), retainGenerations = 13)
      (1 to 8).foreach { i =>
        graft.sources.CommittedTable.mergeMor(s, wh,
          src.filter(col("o_orderkey") % (i + 2) === 0)
            .withColumn("o_totalprice", col("o_totalprice") + i * 1000.0)
            .withColumn("version", lit(i + 1L)),
          "o_orderkey", "version", "o_orderstatus") // gens 2..9
      }
      graft.sources.CommittedTable.deleteMor(s, wh,
        col("o_orderkey") % 23 === 1, "o_orderstatus") // gen 10
      val mid = s.sql(
        s"""SELECT o_orderstatus, 'mid' AS epoch, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh` VERSION AS OF 5
            GROUP BY o_orderstatus""").collect()
      s.sql(s"CALL graft.optimize(table => '$wh', max_files => 1)") // gen 11
      val m = graft.sources.CommittedTable.manifestAt(s, wh)
      val drained = m.segments.keys.forall(p =>
        graft.sources.CommittedTable.liveDeltas(m, p).isEmpty &&
          graft.sources.CommittedTable.liveDv(m, p).isEmpty)
      val fin = s.sql(
        s"""SELECT o_orderstatus, 'final' AS epoch, COUNT(*) AS n,
              CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
              CAST(SUM(version) AS BIGINT) AS sum_version,
              ${DSUM("o_totalprice")} AS sum_price
            FROM graft.`$wh`
            GROUP BY o_orderstatus""")
      val out = fin.union(s.createDataFrame(
          java.util.Arrays.asList(mid: _*), fin.schema))
        .withColumn("drained", lit(drained))
      finish(s, out, wh)
    }, Some("""
      WITH li AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          CASE WHEN o_orderkey % 10 = 0 THEN 8
               WHEN o_orderkey % 9 = 0 THEN 7
               WHEN o_orderkey % 8 = 0 THEN 6
               WHEN o_orderkey % 7 = 0 THEN 5
               WHEN o_orderkey % 6 = 0 THEN 4
               WHEN o_orderkey % 5 = 0 THEN 3
               WHEN o_orderkey % 4 = 0 THEN 2
               WHEN o_orderkey % 3 = 0 THEN 1
               ELSE 0 END AS lfin,
          CASE WHEN o_orderkey % 6 = 0 THEN 4
               WHEN o_orderkey % 5 = 0 THEN 3
               WHEN o_orderkey % 4 = 0 THEN 2
               WHEN o_orderkey % 3 = 0 THEN 1
               ELSE 0 END AS lmid
        FROM orders)
      SELECT o_orderstatus, 'final' AS epoch, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(lfin + 1) AS BIGINT) AS sum_version,
        CAST(SUM(CAST(o_totalprice + lfin * 1000.0 AS DECIMAL(18,2)))
             AS DOUBLE) AS sum_price,
        TRUE AS drained
      FROM li WHERE o_orderkey % 23 <> 1
      GROUP BY o_orderstatus
      UNION ALL
      SELECT o_orderstatus, 'mid', COUNT(*),
        CAST(SUM(o_orderkey) AS BIGINT),
        CAST(SUM(lmid + 1) AS BIGINT),
        CAST(SUM(CAST(o_totalprice + lmid * 1000.0 AS DECIMAL(18,2)))
             AS DOUBLE),
        TRUE
      FROM li GROUP BY o_orderstatus""")),

    // ---- Bucketed layout survives merge-on-read DML -----------------------
    // q162's write-time shuffle elimination composed with the MoR verbs:
    // delta files stage through the same pmod(murmur3, n) split and
    // Spark `_NNNNN` bucket naming as base segments, so after a MoR
    // merge (vector + deltas) and a MoR delete (vector spanning base and
    // delta files) the fact–dim join STILL plans with zero shuffle
    // exchanges under the sort-merge join — `bucket_free` witnesses the
    // plan (the outer join is pinned to sort-merge by hint so the tiny
    // dim's auto-broadcast can't mask the evidence; the dv anti-join
    // inside the scan broadcasts as usual), `mor` witnesses the manifest
    // (base segments untouched + live deltas present). At 100 TB this is
    // what keeps a continuously-upserted fact co-located with its dims:
    // maintenance-free bucket joins that don't decay with ingest.
    Q("q182_bucketed_mor", (s, dir) => {
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
        .withColumn("version", lit(1L))
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val wh = java.nio.file.Files
        .createTempDirectory("graft-sql-q182").toString
      val fPath = s"$wh/fact"; val dPath = s"$wh/dim"
      graft.sources.CommittedTable.write(o, fPath, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"),
        bucketBy = Some((8, Seq("o_custkey"))))
      graft.sources.CommittedTable.write(c, dPath, "c_mktsegment",
        bucketBy = Some((8, Seq("c_custkey"))))
      val before = graft.sources.CommittedTable.manifestAt(s, fPath).segments
      graft.sources.CommittedTable.mergeMor(s, fPath,
        o.filter(col("o_orderkey") % 13 === 1)
          .withColumn("o_totalprice", col("o_totalprice") + 5000.0)
          .withColumn("version", lit(2L)),
        "o_orderkey", "version", "o_orderstatus")
      graft.sources.CommittedTable.deleteMor(s, fPath,
        col("o_orderkey") % 31 === 2, "o_orderstatus")
      val mor = morWitness(s, fPath, before)
      val prevA = s.conf.get("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val j = s.sql(
          s"""SELECT /*+ SHUFFLE_MERGE(c) */ c.c_mktsegment, COUNT(*) AS n,
                CAST(SUM(f.o_orderkey) AS BIGINT) AS sum_keys,
                CAST(SUM(f.version) AS BIGINT) AS sum_version,
                ${DSUM("f.o_totalprice")} AS sum_price
              FROM graft.`$fPath` f JOIN graft.`$dPath` c
                ON f.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment""")
        val smj = j.queryExecution.executedPlan.collectFirst {
          case sm: org.apache.spark.sql.execution.joins.SortMergeJoinExec => sm }
        val bucketFree = smj.exists(_.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
        }.isEmpty)
        val out = j.withColumn("mor", lit(mor))
          .withColumn("bucket_free", lit(bucketFree))
        finish(s, out, fPath)
      } finally s.conf.set("spark.sql.adaptive.enabled", prevA)
    }, Some("""
      WITH f AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_orderkey % 13 = 1 THEN o_totalprice + 5000.0
               ELSE o_totalprice END AS price,
          CASE WHEN o_orderkey % 13 = 1 THEN 2 ELSE 1 END AS version
        FROM orders WHERE o_orderkey % 31 <> 2)
      SELECT c.c_mktsegment, COUNT(*) AS n,
        CAST(SUM(f.o_orderkey) AS BIGINT) AS sum_keys,
        CAST(SUM(f.version) AS BIGINT) AS sum_version,
        CAST(SUM(CAST(f.price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        TRUE AS mor, TRUE AS bucket_free
      FROM f JOIN customer c ON f.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment""")),

    // ---- Incremental view over MERGE-ON-READ DML ---------------------------
    // q153's exact lifecycle and oracle, but the source declares
    // deletemode/updatemode = 'mor': the routed DELETE publishes a
    // deletion vector (zero rewrites), the routed UPDATE publishes
    // vector + delta segments — and the CDF feed driving sync_agg_view
    // must read those generations identically to rewrites (tombstones
    // from vectored rows, pre/postimages across base∪delta), folding
    // the view to the same converged state. The `mor` witness pins that
    // the source really held live vector+delta state at sync time (a
    // silent CoW fallback would fail it). Three tiers composed under
    // one oracle: MoR storage, signed CDF, incremental maintenance —
    // at 100 TB this IS the steady state: an upserting ingest that
    // never rewrites hot partitions, feeding views that never rescan
    // the table.
    Q("q183_sql_incremental_view_mor", (s, dir) => {
      val o = table(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
        .withColumn("version", lit(1L))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-sql-q183").toString
      val src = s"$tmp/src"; val vw = s"$tmp/view"
      graft.sources.CommittedTable.write(o, src, "o_orderstatus",
        keyCol = Some("o_orderkey"), versionCol = Some("version"))
      s.sql(s"CALL graft.set_retention(table => '$src', retain => 10)")
      graft.sources.CommittedTable.setDeleteMode(s, src, Some("mor"))
      graft.sources.CommittedTable.setUpdateMode(s, src, Some("mor"))
      s.sql(s"CALL graft.init_agg_view(source => '$src', view => '$vw', " +
        "group_by => 'o_orderpriority', value => 'o_orderkey')")
      s.sql(s"DELETE FROM graft.`$src` WHERE o_orderkey % 7 = 0") // deleteMor
      s.sql(s"UPDATE graft.`$src` SET o_orderpriority = '9-MOVED', " +
        s"version = version + 1 WHERE o_orderkey % 11 = 0") // updateMor
      // witness BEFORE sync: live vector + delta state on the source
      val m = graft.sources.CommittedTable.manifestAt(s, src)
      val mor = m.segments.keys.exists(p =>
        graft.sources.CommittedTable.liveDv(m, p).isDefined) &&
        m.segments.keys.exists(p =>
          graft.sources.CommittedTable.liveDeltas(m, p).nonEmpty)
      s.sql(s"CALL graft.sync_agg_view(source => '$src', view => '$vw', " +
        "group_by => 'o_orderpriority', value => 'o_orderkey')")
      val out = s.sql(
        s"""SELECT o_orderpriority, CAST(n AS BIGINT) AS n,
              CAST(sum_value AS BIGINT) AS sum_value,
              CAST(min_value AS BIGINT) AS min_value,
              CAST(max_value AS BIGINT) AS max_value, $mor AS mor
            FROM graft.`$vw`""")
      finish(s, out, src)
    }, Some("""
      WITH final AS (
        SELECT CASE WHEN o_orderkey % 11 = 0 THEN '9-MOVED'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_orderkey
        FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0)
      SELECT o_orderpriority, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS sum_value,
        CAST(MIN(o_orderkey) AS BIGINT) AS min_value,
        CAST(MAX(o_orderkey) AS BIGINT) AS max_value,
        TRUE AS mor
      FROM final GROUP BY o_orderpriority""")))
}
