package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S5–S7 (SURVEY §2.1): the analytical store. The reference loads BigQuery
  * (overwrite / truncate / append dispositions); in this engine the warehouse
  * is partitioned Parquet — columnar, stats-pruned, splittable — which is the
  * Spark-native equivalent and what a 100 TB deployment would use (object
  * store + partition layout + vectorized scan).
  *
  * Partitioning: `city` (26 values) × `txn_year` (~15 values) ⇒ a few hundred
  * partitions — right-sized so the A5-style queries (avg by year/city)
  * partition-prune instead of scanning everything, and small enough to avoid
  * the many-tiny-files problem at scale.
  */
object Warehouse {

  /** Overwrite-load (S5/S6: WRITE_TRUNCATE semantics). */
  def overwrite(df: DataFrame, path: String): Unit =
    write(df, path, SaveMode.Overwrite)

  /** Append-load (S7: WRITE_APPEND semantics, per-file incremental). */
  def append(df: DataFrame, path: String): Unit =
    write(df, path, SaveMode.Append)

  private def write(df: DataFrame, path: String, mode: SaveMode): Unit =
    df.withColumn("txn_year", year(col("transaction_date")))
      .write
      .partitionBy("city", "txn_year")
      .mode(mode)
      .parquet(path)

  /** Read the warehouse back; filters on city/txn_year prune partitions. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Materialize [[graft.operators.Sampling.hashBucket]] as a partition
    * layout so repeated deterministic samples prune FILE IO instead of
    * scanning the whole table (the gap `Sampling`'s scaladoc documents: a
    * bucket predicate over an expression is map-side cheap but still reads
    * every row). Layout: `hash_bucket` stored as a data column (exact
    * refinement), `bucket_group` = hash_bucket div (BUCKETS/nGroups) as the
    * partition column — nGroups=100 keeps the directory fan-out sane while
    * a fraction-f sample reads ~f of the groups. One shuffle on the group
    * key so each group is one splittable file, not one file per task per
    * group (the small-files problem compact exists to fix). */
  def writeBucketed(df: DataFrame, path: String, keyCol: String,
      nGroups: Int = 100): Unit = {
    import graft.operators.Sampling
    require(nGroups > 0 && Sampling.BUCKETS % nGroups == 0,
      s"nGroups ($nGroups) must divide ${Sampling.BUCKETS}")
    // the bookkeeping columns are recomputed here and dropped by
    // sampleBucketed on read-back — a caller column of the same name would
    // be silently destroyed in the stored table; fail loudly instead
    require(!df.columns.contains("hash_bucket") && !df.columns.contains("bucket_group"),
      "input must not contain reserved columns hash_bucket/bucket_group")
    val per = Sampling.BUCKETS / nGroups
    // data + self-describing layout are staged together and published with
    // a demote/promote swap: readers must never observe data without its
    // `_layout` — the group width comes from the table itself, never from
    // a caller constant that can silently disagree with the write — and a
    // crash mid-publish leaves the previous table recoverable at .prev,
    // not a half-written one. (ivfWriteIndex and CommittedTable have since
    // moved to manifest swaps, which also close the brief absent-table
    // window between the two renames here; this whole-table overwrite is
    // kept on the rename pair for layout compatibility.)
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    val staging = new org.apache.hadoop.fs.Path(path + ".staging")
    fs.delete(staging, true)
    df.withColumn("hash_bucket", Sampling.hashBucket(col(keyCol)))
      .withColumn("bucket_group", expr(s"hash_bucket div $per"))
      .repartition(col("bucket_group"))
      .write
      .partitionBy("bucket_group")
      .mode(SaveMode.Overwrite)
      .parquet(staging.toString)
    import spark.implicits._
    Seq((nGroups, per, Sampling.BUCKETS, keyCol))
      .toDF("n_groups", "buckets_per_group", "n_buckets", "key_col")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$staging/_layout")
    val prev = new org.apache.hadoop.fs.Path(path + ".prev")
    fs.delete(prev, true)
    if (fs.exists(live) && !fs.rename(live, prev))
      throw new java.io.IOException(s"failed to demote old bucketed table: $live -> $prev")
    if (!fs.rename(staging, live))
      throw new java.io.IOException(s"failed to publish bucketed table: $staging -> $live")
    fs.delete(prev, true)
  }

  /** Deterministic fraction-f sample over a [[writeBucketed]] table: the
    * `bucket_group` predicate prunes partitions from METADATA (no data file
    * of an unselected group is opened); the stored `hash_bucket` refines
    * the boundary group exactly. Same nested-sample semantics AND schema as
    * [[graft.operators.Sampling.sample]] — same key, larger fraction ⇒
    * superset; the bookkeeping columns are internal, not output. The group
    * width comes from the table's own `_layout`, so it can never disagree
    * with the write. */
  def sampleBucketed(spark: SparkSession, path: String, fraction: Double): DataFrame = {
    import graft.operators.Sampling
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    val df = spark.read.parquet(path)
    val sampled =
      if (fraction == 0.0) df.filter(lit(false)) // statically empty: skip _layout
      else {
        // cut derives from the table's OWN n_buckets, not the compile-time
        // Sampling.BUCKETS — a table written under a different constant
        // would otherwise silently return the wrong fraction
        val layout = spark.read.parquet(s"$path/_layout").collect().head
        val per = layout.getAs[Int]("buckets_per_group")
        val nBuckets = layout.getAs[Int]("n_buckets")
        val cut = math.round(fraction * nBuckets)
        if (cut <= 0) df.filter(lit(false))
        else df.filter(col("bucket_group") <= (cut - 1) / per &&
          col("hash_bucket") < cut)
      }
    sampled.drop("hash_bucket", "bucket_group")
  }

  /** Keyed merge/upsert ("latest version wins") into a `partitionCol`-
    * partitioned parquet table: upserts and inserts land, superseded rows
    * disappear, and ONLY the affected partitions are rewritten — untouched
    * partitions' files are never opened, rewritten, or moved, which is the
    * whole point at 100 TB (a daily update batch touches a handful of
    * partitions; a full-table rewrite merge would be a 100 TB write).
    *
    * Affected set = partitions receiving update rows ∪ partitions currently
    * holding an updated key. The second arm makes key MOVES correct: when an
    * update changes a row's partition value, the old partition is rewritten
    * without the key (and deleted outright if the moved key was its last
    * row). Both driver-side collects are bounded by the DISTINCT PARTITION
    * COUNT touched by one batch — metadata-scale, never data-scale.
    *
    * Contract: (key, versionCol) pairs are unique per logical row — the
    * merge keeps, per key, the row with the highest versionCol (ties would
    * be nondeterministic and are the caller's bug); partition values are
    * non-null, and are compared/published AS STRINGS (the raw directory
    * value — an explicit read schema types the partition column string, so
    * the collected value always reproduces the dir name Spark wrote; type
    * INFERENCE here would turn a `status=007` dir into int 7 and publish a
    * phantom `status=7` next to the stale original).
    *
    * Crash safety: each affected partition is demoted to
    * `<path>.merge-prev/` before its replacement is promoted from staging,
    * and every merge() begins by restoring any demoted-but-never-promoted
    * partition — so no crash window loses the only copy of a partition
    * (the earlier delete-then-rename draft had exactly that window: a
    * crash between delete and rename left the sole copy in staging, which
    * the next run's staging cleanup destroyed). Not table-transactional: a
    * crash mid-publish leaves some partitions merged and others not, and
    * an interrupted EMPTY-partition retirement is restored on recovery —
    * rerunning the SAME merge converges in all cases, because
    * latest-version-wins is idempotent. Single-writer contract: concurrent
    * merges into one table race the demote/promote renames — serialize
    * them (StreamingMerge's one-query-per-table loop does).
    *
    * Reader-visibility contract: readers must not run CONCURRENTLY with a
    * merge's publish window — a partition being swapped is demoted (absent
    * from the live dir) for the instant between its two renames, so a
    * racing reader can observe a PARTIAL table (the affected partition
    * silently missing) rather than an error. Likewise, after a crash
    * mid-publish, demoted partitions stay hidden until recovery runs —
    * which happens at the START of the next merge(), or on demand via
    * [[recover]] (so an operator can repair visibility without submitting
    * a new batch). Deployments that need readers concurrent with
    * publishes use [[CommittedTable]], whose manifest swap gives readers
    * an uninterrupted old-or-new view.
    *
    * Schema evolution (`allowAddColumns = true`): the update batch may ADD
    * nullable data columns beyond the table's; only the affected
    * partitions are rewritten with the widened schema, untouched
    * partitions' files stay byte-identical, and a widened column reads as
    * NULL for their rows (parquet by-name resolution — see
    * [[readEvolved]]). Dropping or renaming a table column is rejected
    * loudly in all modes: at 100 TB either would demand a full-table
    * rewrite to stay consistent, never an implicit side effect of an
    * ingest batch. Widening records the new column list in a
    * `_table_columns` sidecar (atomic rename publish) so later merges
    * validate against the TABLE schema, not whichever mixed-generation
    * footer a probe happens to hit. The default `allowAddColumns = false`
    * keeps the typo protection: without the opt-in, an extra (= misspelt)
    * updates column fails instead of becoming a surprise table column. */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      key: String, versionCol: String, partitionCol: String,
      allowAddColumns: Boolean = false): Unit = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StringType
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    val staging = new org.apache.hadoop.fs.Path(path + ".merge-staging")
    val prevRoot = new org.apache.hadoop.fs.Path(path + ".merge-prev")

    // recover from an interrupted publish BEFORE reading anything
    recover(spark, path)
    fs.delete(staging, true)

    // read with an EXPLICIT schema typing the partition column string:
    // data columns keep their on-disk types, the partition value stays the
    // raw dir string (no inference), so value == dir name, always. The
    // schema's TYPES come from the update batch (the contract: same schema
    // as the table) — full inference here would run a second complete
    // partition discovery + footer sweep of the table on every merge, pure
    // overhead on the hot ingest path. A one-footer probe validates the
    // NAMES, because an explicit-schema parquet read silently yields NULL
    // for a column absent from the files — a typo'd updates column would
    // otherwise null out a table column instead of failing.
    val strSchema = org.apache.spark.sql.types.StructType(
      updates.schema.map(f =>
        if (f.name == partitionCol) f.copy(dataType = StringType) else f))
    val probeFile = {
      val it = fs.listFiles(live, true)
      var found: Option[String] = None
      while (found.isEmpty && it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) found = Some(f.toString)
      }
      found.getOrElse(throw new java.io.IOException(
        s"no parquet data file under $path to merge into"))
    }
    // the table's data-column set: the `_table_columns` sidecar when one
    // exists (written by the first widening merge — after that the table
    // has MIXED footers and a one-file probe is no longer authoritative),
    // else the one-footer probe
    val sidecar = new org.apache.hadoop.fs.Path(live, SchemaSidecar)
    val tableDataCols: Set[String] =
      if (fs.exists(sidecar)) readSidecar(fs, sidecar).toSet
      else scala.util.Try(org.apache.spark.sql.graft.bridge
          .parquetFooterSchema(spark,
            new org.apache.hadoop.fs.Path(probeFile)).fieldNames.toSet)
        .getOrElse(spark.read.parquet(probeFile).schema.fieldNames.toSet)
    val updCols = updates.schema.fieldNames.toSet
    val dropped = (tableDataCols + partitionCol) -- updCols
    require(dropped.isEmpty,
      s"updates are missing table columns ${dropped.mkString(",")}: dropping " +
        "or renaming a column is not supported by merge (it would require a " +
        "full-table rewrite; do that explicitly, never as an ingest side effect)")
    val added = updCols -- tableDataCols - partitionCol
    require(added.isEmpty || allowAddColumns,
      s"updates carry columns ${added.mkString(",")} the table lacks; pass " +
        "allowAddColumns=true to widen the schema (default-off so a typo'd " +
        "column name fails instead of silently becoming a new table column)")
    // record the widened column list BEFORE any partition is published:
    // crash between the two leaves a widened sidecar over unwidened files —
    // later old-schema batches are rejected (safe direction) and rerunning
    // the widened merge converges; the reverse order would let a later
    // old-schema merge silently rewrite affected partitions WITHOUT the
    // new column (data loss).
    if (added.nonEmpty)
      writeSidecar(hconf, sidecar,
        updates.schema.fieldNames.filter(_ != partitionCol))
    val existing = spark.read.schema(strSchema).parquet(path)
    val cols = existing.columns
    val upd = updates.withColumn(partitionCol, col(partitionCol).cast("string"))
    // key+partition projection only: at scale this is a column-pruned scan
    // joined semi against the batch's key set (AQE picks broadcast when the
    // batch is small — the common case)
    val updKeys = upd.select(col(key)).distinct()
    val oldParts = existing.select(col(key), col(partitionCol))
      .join(updKeys, Seq(key), "left_semi")
      .select(col(partitionCol)).distinct()
    val newParts = upd.select(col(partitionCol)).distinct()
    val affected: Array[String] =
      oldParts.union(newParts).distinct().collect().map(_.getString(0))
    if (affected.isEmpty) return

    // latest version per key over (existing rows of affected partitions —
    // literal isin ⇒ statically partition-pruned read — ∪ the update batch)
    val w = Window.partitionBy(col(key)).orderBy(col(versionCol).desc)
    val merged = existing.filter(col(partitionCol).isin(affected.toIndexedSeq: _*))
      .select(cols.map(col).toIndexedSeq: _*)
      .unionByName(upd.select(cols.map(col).toIndexedSeq: _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    // stage the rewritten partitions; repartition on the partition value ⇒
    // one splittable file per partition per batch, not one per task per
    // partition
    merged.repartition(col(partitionCol))
      .write.partitionBy(partitionCol)
      .mode(SaveMode.Overwrite).parquet(staging.toString)

    // publish: demote → promote → drop the prev entry, per partition. A
    // crash at any point is repaired by the next merge()'s recovery above
    // (a demoted-not-promoted partition is restored); an affected partition
    // with no staged dir lost its last row to a key move — its demotion IS
    // its retirement
    fs.mkdirs(prevRoot)
    affected.foreach { v =>
      val dirName = s"$partitionCol=${ExternalCatalogUtils.escapePathName(v)}"
      val liveDir = new org.apache.hadoop.fs.Path(live, dirName)
      val stagedDir = new org.apache.hadoop.fs.Path(staging, dirName)
      val prevDir = new org.apache.hadoop.fs.Path(prevRoot, dirName)
      if (fs.exists(liveDir) && !fs.rename(liveDir, prevDir))
        throw new java.io.IOException(
          s"failed to demote partition: $liveDir -> $prevDir")
      if (fs.exists(stagedDir) && !fs.rename(stagedDir, liveDir))
        throw new java.io.IOException(
          s"failed to publish merged partition: $stagedDir -> $liveDir")
      fs.delete(prevDir, true)
    }
    fs.delete(prevRoot, true)
    fs.delete(staging, true)
  }

  /** Restore reader visibility after a crashed [[merge]] publish, without
    * submitting a new batch: a partition demoted to `<path>.merge-prev/`
    * whose live dir is missing was never promoted — rename it back; one
    * whose live dir exists was promoted — its prev copy is superseded.
    * Idempotent; also runs automatically at the start of every merge(). */
  def recover(spark: SparkSession, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    val prevRoot = new org.apache.hadoop.fs.Path(path + ".merge-prev")
    if (fs.exists(prevRoot)) {
      fs.listStatus(prevRoot).foreach { st =>
        val back = new org.apache.hadoop.fs.Path(live, st.getPath.getName)
        if (!fs.exists(back) && !fs.rename(st.getPath, back))
          throw new java.io.IOException(
            s"failed to recover demoted partition: ${st.getPath} -> $back")
      }
      fs.delete(prevRoot, true)
    }
  }

  /** Read a schema-evolved merge table: old-generation files simply lack
    * the widened columns, so the read resolves columns BY NAME against the
    * table column list (sidecar when present, else footer-merged) and
    * NULL-fills the gaps — the standard warehouse add-column semantics
    * (metadata change now, rewrite never). Without a sidecar this falls
    * back to `mergeSchema` (a footer sweep — fine for ad-hoc reads; the
    * sidecar path reads ZERO extra footers, which is the 100 TB shape). */
  def readEvolved(spark: SparkSession, path: String,
      partitionCol: String): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(hconf)
    val sidecar = new org.apache.hadoop.fs.Path(live, SchemaSidecar)
    if (!fs.exists(sidecar))
      return spark.read.option("mergeSchema", "true").parquet(path)
    // types: the widened columns only exist in NEW files, so one probe of
    // the newest generation (any file of an affected partition) cannot be
    // assumed — instead take types from a mergeSchema read ONLY when the
    // sidecar alone cannot name them. Common case: a recent merge wrote
    // every sidecar column into its files; probe newest-first until a
    // footer covers the full list, else fall back to the sweep.
    val wanted = readSidecar(fs, sidecar)
    val files = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
    val it = fs.listFiles(live, true)
    while (it.hasNext) { val f = it.next(); if (f.getPath.getName.endsWith(".parquet")) files += f }
    val newestFirst = files.sortBy(-_.getModificationTime)
    // driver-side footer reads (the CommittedTable.dirSchema shape): a
    // `spark.read.parquet(file).schema` per probe paid DataSource
    // resolution + an inference pass per file — 8 of them per evolved
    // read; one footer RPC each is the same answer
    val full = newestFirst.iterator
      .map(f => scala.util.Try(org.apache.spark.sql.graft.bridge
        .parquetFooterSchema(spark, f.getPath))
        .getOrElse(spark.read.parquet(f.getPath.toString).schema))
      .take(8) // bounded probe: 8 footers, then give up to the sweep
      .find(sc => wanted.forall(sc.fieldNames.contains))
    full match {
      case Some(sc) =>
        // same explicit-schema shape merge() reads with: data columns typed
        // from the probed footer, the partition column typed string (the
        // raw directory value, no inference)
        val schema = org.apache.spark.sql.types.StructType(
          wanted.map(n => sc(n)).toIndexedSeq :+
            org.apache.spark.sql.types.StructField(partitionCol,
              org.apache.spark.sql.types.StringType))
        spark.read.schema(schema).parquet(path)
      case None =>
        val swept = spark.read.option("mergeSchema", "true").parquet(path)
        // a sidecar column NO footer covers means the widening merge died
        // between sidecar publish and partition publish: fail with the
        // remedy instead of letting readers hit an unresolved-column error
        // (or worse, silently missing the column they asked this API for)
        val missing = wanted.filterNot(swept.schema.fieldNames.contains)
        if (missing.nonEmpty)
          throw new java.io.IOException(
            s"table $path: sidecar columns ${missing.mkString(",")} appear " +
              "in NO data file — a widening merge crashed after its sidecar " +
              "publish; rerun that merge (same updates, allowAddColumns=true) " +
              "to restore them")
        swept
    }
  }

  private val SchemaSidecar = "_table_columns"

  private def readSidecar(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      .filter(_.nonEmpty)
    finally in.close()
  }

  /** Publish the column-list sidecar atomically: write `<name>.tmp`, then
    * a POSIX rename-with-overwrite onto the live name — readers see the
    * old list or the new list, never a partial file. */
  private def writeSidecar(hconf: org.apache.hadoop.conf.Configuration,
      p: org.apache.hadoop.fs.Path, cols: Seq[String]): Unit = {
    val fs = p.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(p.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write((cols.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, hconf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Compact an append-accumulated warehouse into `dst`: the small-files
    * problem is the operational cost of S7 at scale (every `append` batch
    * adds a file per partition; a year of daily loads = hundreds of files
    * per partition, and scan planning degrades with file COUNT, not size).
    * One shuffle keyed by the partition columns rewrites each (city, year)
    * as a single file (splittable: `maxRecordsPerFile` re-splits the giants)
    * sorted by transaction_date, so parquet row-group stats support date
    * range skipping within the partition. Callers swap `dst` for the old
    * path once the write commits — same publish discipline as overwrite. */
  def compact(spark: SparkSession, src: String, dst: String,
      maxRecordsPerFile: Long = 1L << 22): Unit =
    read(spark, src)
      .repartition(col("city"), col("txn_year"))
      .sortWithinPartitions(col("city"), col("txn_year"), col("transaction_date"))
      .write
      .partitionBy("city", "txn_year")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(dst)
}
