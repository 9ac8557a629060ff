package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{EmptyRow, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.{lit, timestamp_millis}
import org.apache.hadoop.fs.Path

import graft.sources.CommittedTable

/** Table-valued SQL functions over committed tables, registered by
  * `GraftExtensions` (`injectTableFunction`).
  *
  * `graft_changes` is the Delta `table_changes` surface: the
  * change-data-feed of a generation RANGE as one relation —
  *
  * {{{
  *   SELECT * FROM graft_changes('/wh/t', 2)        -- gen 2 .. current
  *   SELECT * FROM graft_changes('/wh/t', 2, 4)     -- gen 2 .. 4
  * }}}
  *
  * Each row is a [[CommittedTable.changesCdf]] change record
  * (`_change_type` ∈ insert / update_preimage / update_postimage /
  * delete) plus `_commit_version` (the generation that published it)
  * and `_commit_timestamp` (the generation's anchor publish time).
  * Requires the table's `keycol`/`vercol` roles (the CDF identity).
  *
  * Scale contract: each generation's batch is manifest-pruned to the
  * partitions that generation touched (segments written at the
  * generation, or partitions whose deletion vector it wrote), so the
  * whole range costs O(rewritten data) — never a full-table diff; the
  * version/timestamp columns are driver-side metadata (one anchor
  * mtime per generation). Retention is the same loud contract as every
  * time-travel read: a range reaching below the retained floor is
  * refused with the readable window, never silently truncated. */
object GraftTableFunctions {

  def changes(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 || args.length == 3,
      "graft_changes expects (table, from_version[, to_version]), got " +
        s"${args.length} argument(s)")
    def evalLit(i: Int, what: String): Any = {
      require(args(i).foldable, s"graft_changes: $what must be a literal")
      val v = args(i).eval(EmptyRow)
      require(v != null, s"graft_changes: $what must not be NULL")
      v
    }
    val path = evalLit(0, "table").toString
    val from = evalLit(1, "from_version").asInstanceOf[Number].longValue()

    val spark = SparkSession.active
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // root-only read: roles and the current generation are root metadata
    val root = CommittedTable.readManifestRoot(fs, table).getOrElse(
      throw new java.io.IOException(s"no committed table at $path"))
    val to = if (args.length == 3)
      evalLit(2, "to_version").asInstanceOf[Number].longValue()
    else root.gen
    require(from >= 1L && from <= to,
      s"graft_changes: empty version range $from..$to (current ${root.gen})")
    require(to <= root.gen,
      s"graft_changes: to_version $to has not been published yet " +
        s"(current ${root.gen})")
    val key = root.keyCol.getOrElse(throw new IllegalArgumentException(
      s"graft_changes: the table at $path records no keycol — the CDF " +
        "needs a row identity (write with keyCol=/TBLPROPERTIES 'keycol')"))
    val ver = root.verCol.getOrElse(throw new IllegalArgumentException(
      s"graft_changes: the table at $path records no vercol — the CDF " +
        "needs a version column (write with versionCol=/TBLPROPERTIES " +
        "'vercol')"))
    // one directory listing for every anchor's publish time + operation
    val gens: Map[Long, CommittedTable.GenerationInfo] =
      CommittedTable.history(spark, path).map(g => g.gen -> g).toMap
    (from to to).map { g =>
      CommittedTable.changesCdf(spark, path, g, key, ver)
        .withColumn("_commit_version", lit(g))
        .withColumn("_commit_timestamp", gens.get(g)
          .map(gi => timestamp_millis(lit(gi.publishedAtMillis)))
          .getOrElse(timestamp_millis(lit(null).cast("long"))))
        // the publishing verb (manifest op= line) — audit attribution
        // for every change row
        .withColumn("_commit_operation",
          lit(gens.get(g).flatMap(_.op).orNull).cast("string"))
    // later generations may carry widened schemas: align by name, the
    // same NULL-fill contract changesCdf applies to preimage rows
    }.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
      .queryExecution.analyzed
  }

  /** `SELECT * FROM graft_partitions('/wh/t')` — per-partition
    * operational introspection straight from the manifest (zero file
    * I/O beyond the manifest/shard reads, zero listings): one row per
    * live partition with its base segment, live data-file count/bytes
    * (base + MoR delta dirs, from the recorded `f=` lists), base
    * physical rows, live deletion-vector rows, delta dir/row counts,
    * and the LOGICAL row count every read surface serves (base − dv +
    * deltas). The partition-level companion of `CALL graft.detail`:
    * what `fragmentedPartitions` / `readAmplifiedPartitions` decide
    * from, exposed as a SQL relation — `WHERE dv_rows > 0.5 *
    * base_rows` IS the maintenance backlog query. NULL file/byte
    * counts mark a pre-feature segment with no recorded list. */
  def partitions(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1,
      s"graft_partitions expects (table), got ${args.length} argument(s)")
    require(args.head.foldable, "graft_partitions: table must be a literal")
    val pathV = args.head.eval(EmptyRow)
    require(pathV != null, "graft_partitions: table must not be NULL")
    val path = pathV.toString
    val spark = SparkSession.active
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = CommittedTable.readManifestRoot(fs, table).getOrElse(
      throw new java.io.IOException(s"no committed table at $path"))
    val m = CommittedTable.hydrateSnapshot(fs, table, root, None)
    val out = m.segments.toSeq.sortBy(_._1).map { case (pv, seg) =>
      val deltas = CommittedTable.liveDeltas(m, pv)
      val dirs = seg +: deltas.map(_.dir)
      val lists = dirs.map(m.files.get)
      val (files, bytes) =
        if (lists.forall(_.isDefined))
          (Some(lists.flatMap(_.get).size), Some(lists.flatMap(_.get).map(_._2).sum))
        else (None, None)
      val baseRows = m.rowCounts.get(pv)
      val dvRows = CommittedTable.liveDv(m, pv).map(_.rows).getOrElse(0L)
      val deltaRows = deltas.map(_.rows).sum
      (pv, CommittedTable.segLeaf(seg), files, bytes, baseRows,
        dvRows, deltas.size, deltaRows,
        baseRows.map(_ - dvRows + deltaRows))
    }
    val session = spark
    import session.implicits._
    out.toDF("partition", "segment", "files", "bytes", "base_rows",
      "dv_rows", "delta_dirs", "delta_rows", "logical_rows")
      .queryExecution.analyzed
  }

  /** `SELECT * FROM graft_history('/wh/t')` — the retained-generation
    * history as a composable relation (the `CALL graft.history` facts,
    * but usable in FROM/JOIN/WHERE): one row per retained generation
    * with its publish timestamp, live partition count, logical row
    * count (NULL when any partition predates recorded counts) and an
    * is_current marker. Driver-side metadata only — one listing plus
    * one small anchor read per retained generation. `WHERE rows <
    * lag(rows)` over it IS the shrink-audit query. */
  def history(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1,
      s"graft_history expects (table), got ${args.length} argument(s)")
    require(args.head.foldable, "graft_history: table must be a literal")
    val pathV = args.head.eval(EmptyRow)
    require(pathV != null, "graft_history: table must not be NULL")
    val path = pathV.toString
    val spark = SparkSession.active
    val out = CommittedTable.history(spark, path)
      .map(g => (g.gen, g.publishedAtMillis, g.op, g.partitions, g.rows,
        g.current))
    val session = spark
    import session.implicits._
    out.toDF("generation", "published_at_ms", "operation", "partitions",
        "rows", "is_current")
      .withColumn("published_at",
        timestamp_millis(org.apache.spark.sql.functions.col(
          "published_at_ms")))
      .drop("published_at_ms")
      .queryExecution.analyzed
  }
}
