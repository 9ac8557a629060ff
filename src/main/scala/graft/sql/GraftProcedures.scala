package graft.sql

import java.util.{Iterator => JIterator}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.CommittedTable

/** SQL `CALL` surface for the committed-table maintenance verbs — the
  * Iceberg-procedure shape on Spark 4's `ProcedureCatalog`:
  *
  *   CALL graft.compact(table => '/abs/path')
  *   CALL graft.compact(table => '/abs/path', zorder_by => 'x,y', zorder_bits => 12)
  *   CALL graft.set_retention(table => '/abs/path', retain => 5)
  *   CALL graft.recover(table => '/abs/path')
  *
  * Each routes into the one Scala protocol (fencing, atomic publish, GC
  * — a procedure is a front end, not a second write path) and returns a
  * one-row result set naming the table and the generation it left
  * behind, so operational runbooks can be pure SQL. The table's
  * partition column comes from the manifest's `partcol=` metadata —
  * CALL never re-declares what the table knows; a pre-metadata table
  * fails loudly naming the remedy (same contract as routed DML).
  *
  * `table` accepts an absolute path (matching the catalog's
  * `` graft.`/abs/path` `` ident convention) or a warehouse-relative
  * `ns/t` resolved against `spark.sql.catalog.<name>.warehouse`. */
private[sql] object GraftProcedures {

  private val resultSchema = StructType(Seq(
    StructField("table", StringType, nullable = false),
    StructField("generation", LongType, nullable = false)))

  private final case class ResultScan(out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = resultSchema
  }

  private def result(path: String, gen: Long): JIterator[Scan] =
    java.util.Collections.singletonList[Scan](ResultScan(Array(
      new GenericInternalRow(Array[Any](UTF8String.fromString(path), gen)))))
      .iterator()

  private def currentGen(spark: SparkSession, path: String): Long = {
    val t = new Path(path)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommittedTable.readManifestRoot(fs, t).map(_.gen).getOrElse(0L)
  }

  private def partitionColOf(spark: SparkSession, path: String,
      verb: String): String = {
    val t = new Path(path)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommittedTable.readManifestRoot(fs, t)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed table at $path"))
      .partitionCol.getOrElse(throw new UnsupportedOperationException(
        s"CALL $verb needs the table's partition column recorded in the " +
          s"manifest (partcol=); the table at $path predates that metadata " +
          "— re-write it with CommittedTable.write or run one Scala merge"))
  }

  /** One fixed-parameter procedure: `bind` is schema-validation-free
    * (Spark aligns named/positional args against `parameters()` and
    * applies the declared SQL-text defaults before `call`). */
  private abstract class Proc(val name: String,
      params: Array[ProcedureParameter]) extends UnboundProcedure
      with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def description(): String = s"graft committed-table $name"
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // mutates table state
  }

  private def str(input: InternalRow, i: Int): Option[String] =
    if (input.isNullAt(i)) None else Some(input.getUTF8String(i).toString)

  def compact(resolve: String => String): UnboundProcedure = new Proc("compact", Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("zorder_by", StringType).defaultValue("NULL")
      .comment("comma-separated z-order columns; plain compact when absent")
      .build(),
    ProcedureParameter.in("zorder_bits", IntegerType).defaultValue("12")
      .build(),
    ProcedureParameter.in("sort_by", StringType).defaultValue("NULL")
      .comment("comma-separated sort columns for a plain compact")
      .build(),
    ProcedureParameter.in("files_per_partition", IntegerType)
      .defaultValue("1")
      .comment("with sort_by/zorder_by, > 1 RANGE-CLUSTERS the rewrite: " +
        "disjoint per-file key ranges feed the manifest's per-file zone " +
        "maps (fs= lines) so range SQL skips files inside partitions")
      .build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      val pc = partitionColOf(spark, path, "compact")
      def csv(i: Int): Seq[String] = str(input, i)
        .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Nil)
      val fpp = input.getInt(4)
      csv(1) match {
        case z if z.nonEmpty =>
          CommittedTable.compactZOrder(spark, path, pc, z, input.getInt(2),
            filesPerPartition = fpp)
        case _ =>
          CommittedTable.compact(spark, path, pc, sortCols = csv(3),
            filesPerPartition = fpp)
      }
      result(path, currentGen(spark, path))
    }
  }

  /** `CALL graft.optimize(table[, max_files[, sort_by[,
    * files_per_partition[, max_dead_ratio]]]])`: one-call BOUNDED
    * maintenance — select the partitions whose live data-file count
    * (base segment + MoR delta dirs) exceeds `max_files` UNION those
    * whose live deletion vector retires more than `max_dead_ratio` of
    * their live physical rows, both from manifest metadata alone
    * ([[CommittedTable.fragmentedPartitions]] +
    * [[CommittedTable.readAmplifiedPartitions]], zero listings), then
    * [[CommittedTable.compactPartitions]] exactly those: coalesces the
    * files, materializes deletion vectors + delta segments back into one
    * (or range-clustered) segment per partition, and REBASES over
    * concurrent commits to disjoint partitions — the maintenance loop a
    * MoR-upserting ingest needs, as one verb that never blocks it. A
    * table with nothing fragmented is a no-op (no generation burned). */
  def optimizeProc(resolve: String => String): UnboundProcedure = new Proc("optimize", Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("max_files", IntegerType).defaultValue("8")
      .comment("compact partitions holding more live files than this")
      .build(),
    ProcedureParameter.in("sort_by", StringType).defaultValue("NULL")
      .comment("comma-separated sort columns for the rewrite; the " +
        "table's declared clustering applies when absent")
      .build(),
    ProcedureParameter.in("files_per_partition", IntegerType)
      .defaultValue("1").build(),
    ProcedureParameter.in("max_dead_ratio", DoubleType).defaultValue("0.5")
      .comment("also compact partitions whose live deletion vector " +
        "retires more than this fraction of their base rows " +
        "(read-amplification signal)")
      .build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      val targets = (CommittedTable.fragmentedPartitions(spark, path,
        maxFiles = input.getInt(1)) ++
        CommittedTable.readAmplifiedPartitions(spark, path,
          maxDeadRatio = input.getDouble(4))).distinct.sorted
      if (targets.nonEmpty) {
        val sortBy = str(input, 2)
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        CommittedTable.compactPartitions(spark, path, targets,
          sortCols = sortBy, filesPerPartition = input.getInt(3))
      }
      result(path, currentGen(spark, path))
    }
  }

  /** `CALL graft.repartition_by(table => …, column => …)`: partition
    * evolution — one content-preserving rewrite re-keys the layout to a
    * new STRING partition column ([[CommittedTable.repartitionTable]]);
    * retained history keeps serving each generation under its own
    * layout, the change feed sees a layout-only (empty-CDF) generation,
    * roles/CHECKs/clustering/bucketing carry over. */
  def repartitionProc(resolve: String => String): UnboundProcedure =
    new Proc("repartition_by", Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("column", StringType).build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val path = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("table must not be NULL")))
        val c = str(input, 1).getOrElse(
          throw new IllegalArgumentException("column must not be NULL"))
        CommittedTable.repartitionTable(spark, path, c)
        result(path, currentGen(spark, path))
      }
    }

  def setRetention(resolve: String => String): UnboundProcedure = new Proc("set_retention", Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("retain", IntegerType).build(),
    ProcedureParameter.in("retain_hours", LongType).defaultValue("NULL")
      .comment("wall-clock retention cap in hours; 0 clears it")
      .build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      val hours = if (input.isNullAt(2)) None else Some(input.getLong(2))
      CommittedTable.setRetention(spark, path, input.getInt(1),
        retainHours = hours.filter(_ > 0L),
        clearRetainHours = hours.contains(0L))
      result(path, currentGen(spark, path))
    }
  }

  /** `CALL graft.restore(table => …, version => N)`: roll the table
    * back to retained generation N as a NEW generation
    * ([[CommittedTable.restore]] — history rolls forward, the undone
    * generations stay readable inside the retain window, retention
    * knobs keep their current values). */
  def restoreProc(resolve: String => String): UnboundProcedure = new Proc("restore", Array(
    ProcedureParameter.in("table", StringType).build(),
    ProcedureParameter.in("version", LongType).build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      CommittedTable.restore(spark, path, input.getLong(1))
      result(path, currentGen(spark, path))
    }
  }

  def recover(resolve: String => String): UnboundProcedure = new Proc("recover", Array(
    ProcedureParameter.in("table", StringType).build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      CommittedTable.recover(spark, path)
      result(path, currentGen(spark, path))
    }
  }

  /** `CALL graft.vacuum(table => …)`: explicit retention sweep
    * ([[CommittedTable.vacuum]]) for tables that stopped receiving
    * writes (merges GC on their own). */
  def vacuumProc(resolve: String => String): UnboundProcedure = new Proc("vacuum", Array(
    ProcedureParameter.in("table", StringType).build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val path = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("table must not be NULL")))
      CommittedTable.vacuum(spark, path)
      result(path, currentGen(spark, path))
    }
  }

  /** `CALL graft.clone(source => …, target => …)`: shallow clone —
    * [[CommittedTable.cloneShallow]]'s metadata-only branch of the
    * source's current snapshot (zero data copied; see its scaladoc for
    * the copy-on-write and source-GC contracts). */
  def cloneProc(resolve: String => String): UnboundProcedure = new Proc("clone", Array(
    ProcedureParameter.in("source", StringType).build(),
    ProcedureParameter.in("target", StringType).build())) {
    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      val src = resolve(str(input, 0).getOrElse(
        throw new IllegalArgumentException("source must not be NULL")))
      val dst = resolve(str(input, 1).getOrElse(
        throw new IllegalArgumentException("target must not be NULL")))
      CommittedTable.cloneShallow(spark, src, dst)
      result(dst, currentGen(spark, dst))
    }
  }

  private def roleOf(spark: SparkSession, path: String, line: String,
      get: CommittedTable.Manifest => Option[String],
      verb: String): String = {
    val t = new Path(path)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    get(CommittedTable.readManifestRoot(fs, t)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed table at $path")))
      .getOrElse(throw new UnsupportedOperationException(
        s"CALL $verb needs the source's $line recorded in the manifest; " +
          s"the table at $path predates that metadata — re-write it with " +
          "CommittedTable.write(keyCol=…, versionCol=…) or run one Scala " +
          "merge"))
  }

  /** `CALL graft.init_agg_view(source => …, view => …, group_by => 'g',
    * value => 'v')`: bootstrap an incrementally-maintained COUNT/SUM/MIN/
    * MAX view ([[graft.streaming.IncrementalAgg.init]]) — one full
    * aggregation of the source's CURRENT state, stamped with its
    * generation so a later `sync_agg_view` folds only what changed. */
  def initAggView(resolve: String => String): UnboundProcedure =
    new Proc("init_agg_view", Array(
      ProcedureParameter.in("source", StringType).build(),
      ProcedureParameter.in("view", StringType).build(),
      ProcedureParameter.in("group_by", StringType).build(),
      ProcedureParameter.in("value", StringType).build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val src = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("source must not be NULL")))
        val dst = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("view must not be NULL")))
        val gen = graft.streaming.IncrementalAgg.init(spark, src, dst,
          str(input, 2).get, str(input, 3).get)
        result(dst, gen)
      }
    }

  /** `CALL graft.sync_agg_view(source => …, view => …, group_by => 'g',
    * value => 'v' [, checkpoint => …])`: drain the source's CDF feed into
    * the view ([[graft.streaming.IncrementalAgg.sync]], AvailableNow —
    * runs to current and stops). Key/version columns come from the
    * source manifest's own keycol=/vercol= metadata; the checkpoint
    * defaults to `<view>/_sync_checkpoint` so repeated CALLs resume the
    * same feed cursor. Folds only what the writer rewrote; idempotent
    * under replay (`applied_gen`). */
  def syncAggView(resolve: String => String): UnboundProcedure =
    new Proc("sync_agg_view", Array(
      ProcedureParameter.in("source", StringType).build(),
      ProcedureParameter.in("view", StringType).build(),
      ProcedureParameter.in("group_by", StringType).build(),
      ProcedureParameter.in("value", StringType).build(),
      ProcedureParameter.in("checkpoint", StringType).defaultValue("NULL")
        .comment("stream checkpoint dir; default <view>/_sync_checkpoint")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val src = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("source must not be NULL")))
        val dst = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("view must not be NULL")))
        val key = roleOf(spark, src, "keycol=", _.keyCol, "sync_agg_view")
        val ver = roleOf(spark, src, "vercol=", _.verCol, "sync_agg_view")
        val ckpt = str(input, 4).getOrElse(s"$dst/_sync_checkpoint")
        graft.streaming.IncrementalAgg.sync(spark, src, dst,
            key, ver, str(input, 2).get, str(input, 3).get, ckpt)
          .start().awaitTermination()
        result(dst, currentGen(spark, dst))
      }
    }

  /** `CALL graft.analyze(table => … [, columns => 'a,b'])`: one
    * aggregate pass computing approximate distinct counts for the named
    * columns (default: the table's recorded roles), published as
    * manifest metadata ([[CommittedTable.analyzeTable]]) — the ANALYZE
    * TABLE verb that feeds `CatalogStatistics` to Spark's cost-based
    * optimizer so multi-join SQL reorders. */
  def analyzeProc(resolve: String => String): UnboundProcedure =
    new Proc("analyze", Array(
      ProcedureParameter.in("table", StringType).build(),
      ProcedureParameter.in("columns", StringType).defaultValue("NULL")
        .comment("comma-separated columns; the table's roles when absent")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val path = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("table must not be NULL")))
        val cols = str(input, 1).toSeq
          .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
        CommittedTable.analyzeTable(spark, path, cols)
        result(path, currentGen(spark, path))
      }
    }

  // ---- LLM-pipeline operators as CALL procedures --------------------------
  // The curation verbs (dedup, decontamination, ANN) composed behind pure
  // SQL: each reads its input (a committed table when the path holds one,
  // a plain parquet dir otherwise — raw corpora usually predate the
  // lakehouse), runs the SAME Scala operator the Scala surface exposes
  // (one implementation, SQL is a front end), writes parquet at `output`
  // and returns (output, rows). Compose with SELECT … FROM
  // parquet.`<output>` — the q164 gate runs the full loop against the
  // q56-family DuckDB oracle.

  private val opResultSchema = StructType(Seq(
    StructField("output", StringType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  private final case class OpResultScan(out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = opResultSchema
  }

  private def opResult(output: String, rows: Long): JIterator[Scan] =
    java.util.Collections.singletonList[Scan](OpResultScan(Array(
      new GenericInternalRow(Array[Any](UTF8String.fromString(output), rows)))))
      .iterator()

  /** Committed table when the path holds one, plain parquet otherwise. */
  private def readAny(spark: SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    val t = new Path(path)
    val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (CommittedTable.readManifestRoot(fs, t).isDefined)
      CommittedTable.read(spark, path)
    else spark.read.parquet(path)
  }

  private def writeOut(df: org.apache.spark.sql.DataFrame, output: String)
      : Long = {
    df.write.mode("overwrite").parquet(output)
    df.sparkSession.read.parquet(output).count()
  }

  /** `CALL graft.dedup_minhash(input => …, output => …, id => 'doc_id',
    * text => 'text' [, n_shingle, bands, rows_per_band, threshold])`:
    * MinHash-LSH near-duplicate detection through pure SQL. Without
    * `threshold` the output is the banded CANDIDATE pairs (doc_a, doc_b)
    * — exactly [[graft.operators.Dedup.minhashCandidates]], the q56
    * shape; with a threshold each candidate is verified by true n-gram
    * Jaccard and only pairs at or above it survive
    * ([[graft.operators.Dedup.minhashNearDups]]). Scale shape unchanged
    * from the Scala verb: banded equi-join, never all-pairs. */
  def dedupMinhash(resolve: String => String): UnboundProcedure =
    new Proc("dedup_minhash", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("id", StringType).defaultValue("'doc_id'").build(),
      ProcedureParameter.in("text", StringType).defaultValue("'text'").build(),
      ProcedureParameter.in("n_shingle", IntegerType).defaultValue("3").build(),
      ProcedureParameter.in("bands", IntegerType).defaultValue("3").build(),
      ProcedureParameter.in("rows_per_band", IntegerType).defaultValue("2").build(),
      ProcedureParameter.in("threshold", DoubleType).defaultValue("NULL")
        .comment("verified-Jaccard floor; candidates only when absent")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val out = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val (id, text) = (str(input, 2).get, str(input, 3).get)
        val (n, bands, rows) =
          (input.getInt(4), input.getInt(5), input.getInt(6))
        val docs = readAny(spark, in)
        val pairs =
          if (input.isNullAt(7))
            graft.operators.Dedup.minhashCandidates(docs, text, id,
              n, bands, rows)
          else graft.operators.Dedup.minhashNearDups(docs, text, id,
            input.getDouble(7), n, bands, rows)
        opResult(out, writeOut(pairs, out))
      }
    }

  /** `CALL graft.decontaminate(input => …, benchmark => …, output => …,
    * id => 'doc_id', text => 'text' [, n, max_hits, bloom])`: benchmark
    * decontamination through pure SQL — documents sharing more than
    * `max_hits` distinct `n`-grams with the benchmark are dropped
    * ([[graft.operators.Dedup.decontaminate]]); `bloom => true` routes
    * candidate generation through the Bloom prefilter for benchmark
    * suites too large to broadcast exactly (answer identical). The
    * output is the SURVIVING corpus. */
  def decontaminateProc(resolve: String => String): UnboundProcedure =
    new Proc("decontaminate", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("benchmark", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("id", StringType).defaultValue("'doc_id'").build(),
      ProcedureParameter.in("text", StringType).defaultValue("'text'").build(),
      ProcedureParameter.in("n", IntegerType).defaultValue("13").build(),
      ProcedureParameter.in("max_hits", LongType).defaultValue("0").build(),
      ProcedureParameter.in("bloom", BooleanType).defaultValue("false").build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val bench = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("benchmark must not be NULL")))
        val out = resolve(str(input, 2).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val survivors = graft.operators.Dedup.decontaminate(
          readAny(spark, in), readAny(spark, bench),
          str(input, 4).get, str(input, 3).get,
          input.getInt(5), input.getLong(6), input.getBoolean(7))
        opResult(out, writeOut(survivors, out))
      }
    }

  /** `CALL graft.ann_topk(input => …, queries => …, output => …, k => 10
    * [, id, vec, qid, qvec, index, nprobe])`: batched cosine top-k
    * through pure SQL. Default is the EXACT brute-force baseline
    * ([[graft.operators.Similarity.batchBruteForceTopK]] — one broadcast
    * join + bounded-heap per query, the correctness yardstick); pass
    * `index => '<stored IVF index path>'` to rank against the
    * partitioned index instead ([[graft.operators.Similarity
    * .ivfBatchTopKFromIndex]] — reads only probed cells; approximate,
    * recall governed by nprobe — see the recall guidance on that
    * method). Output rows: (qid, id, cos). */
  def annTopK(resolve: String => String): UnboundProcedure =
    new Proc("ann_topk", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("queries", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("k", IntegerType).defaultValue("10").build(),
      ProcedureParameter.in("id", StringType).defaultValue("'vec_id'").build(),
      ProcedureParameter.in("vec", StringType).defaultValue("'embedding'").build(),
      ProcedureParameter.in("qid", StringType).defaultValue("'qid'").build(),
      ProcedureParameter.in("qvec", StringType).defaultValue("'qvec'").build(),
      ProcedureParameter.in("index", StringType).defaultValue("NULL")
        .comment("stored IVF index path; exact brute force when absent")
        .build(),
      ProcedureParameter.in("nprobe", IntegerType).defaultValue("4").build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val qs = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("queries must not be NULL")))
        val out = resolve(str(input, 2).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val k = input.getInt(3)
        val (id, vec) = (str(input, 4).get, str(input, 5).get)
        val (qid, qvec) = (str(input, 6).get, str(input, 7).get)
        val queries = readAny(spark, qs)
          .withColumnRenamed(qvec, "qvec")
        val top = str(input, 8) match {
          case Some(index) =>
            graft.operators.Similarity.ivfBatchTopKFromIndex(spark,
              resolve(index), queries, k, input.getInt(9), id, vec, qid)
          case None =>
            graft.operators.Similarity.batchBruteForceTopK(
              readAny(spark, in), queries, k, id, vec, qid)
        }
        opResult(out, writeOut(top, out))
      }
    }

  /** `CALL graft.phash_neardups(input => …, output => … [, max_hamming,
    * existing, hashes_out])`: perceptual-hash image near-dup through
    * pure SQL over any table carrying (media_id, payload). Default is
    * the full-corpus banded join ([[graft.operators.Multimodal
    * .phashNearDups]] — q184's shape, never all-pairs); pass
    * `existing => '<stored (media_id, phash) table>'` for the
    * INCREMENTAL shape (only the input decodes — q187's contract), and
    * `hashes_out => <path>` to also persist the input's fingerprints
    * for appending to that store (the decode runs ONCE: pairs join from
    * the written table), `kernel => 'dct'` for the tone-edit-robust
    * DCT hash ([[graft.operators.Multimodal.pHashDct64]] — q195's
    * kernel; a store and its batches must use ONE kernel), and
    * `oriented => true` for rotation/mirror-robust pairing
    * (min-over-dihedral-orbit hamming — q199's shape; aHash kernel
    * only). Output rows: (id_a, id_b, hamming). */
  def phashNearDupsProc(resolve: String => String): UnboundProcedure =
    new Proc("phash_neardups", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("max_hamming", IntegerType).defaultValue("7").build(),
      ProcedureParameter.in("existing", StringType).defaultValue("NULL")
        .comment("stored (media_id, phash) table; incremental when present")
        .build(),
      ProcedureParameter.in("hashes_out", StringType).defaultValue("NULL")
        .comment("also write the input's fingerprints here (one decode)")
        .build(),
      ProcedureParameter.in("kernel", StringType).defaultValue("'ahash'")
        .comment("perceptual-hash kernel: ahash (default) | dct")
        .build(),
      ProcedureParameter.in("oriented", BooleanType).defaultValue("false")
        .comment("rotation/mirror-robust: min-over-dihedral-orbit " +
          "hamming (ahash kernel only)")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val out = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val maxHamming = input.getInt(2)
        val kernel = str(input, 5).getOrElse("ahash")
        val oriented = !input.isNullAt(6) && input.getBoolean(6)
        if (oriented && kernel != "ahash")
          throw new IllegalArgumentException(
            "oriented pairing permutes aHash grid cells; kernel must be " +
              s"'ahash', got '$kernel'")
        import org.apache.spark.sql.functions.col
        val hashed = graft.operators.Multimodal
          .perceptualHash(readAny(spark, in), kernel)
          .filter(col("phash").isNotNull)
        val pairs = nearDupPairs(spark, resolve, hashed,
          str(input, 4), str(input, 3),
          b =>
            if (oriented) graft.operators.Multimodal
              .phashNearDupsOrientedFromHashes(b, maxHamming)
            else graft.operators.Multimodal
              .phashNearDupsFromHashes(b, maxHamming),
          (b, ex) =>
            if (oriented) graft.operators.Multimodal
              .phashPairsOrientedAgainstHashes(b, ex, maxHamming)
            else graft.operators.Multimodal
              .phashPairsAgainstHashes(b, ex, maxHamming))
        opResult(out, writeOut(pairs, out))
      }
    }

  /** The near-dup CALL family's shared plumbing (phash / audio / video
    * share one contract): optionally persist the batch's fingerprints to
    * `hashesOut` and read them back (so the decode runs ONCE — the pairs
    * join reads the written store), then pair incrementally against
    * `existing` when present, full-corpus otherwise. */
  private def nearDupPairs(spark: SparkSession, resolve: String => String,
      hashed: org.apache.spark.sql.DataFrame,
      hashesOut: Option[String], existing: Option[String],
      pairsFromAll: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
      pairsAgainst: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val batch = hashesOut match {
      case Some(ho) =>
        val p = resolve(ho)
        hashed.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      case None => hashed
    }
    existing match {
      case Some(ex) => pairsAgainst(batch, readAny(spark, resolve(ex)))
      case None => pairsFromAll(batch)
    }
  }

  /** `CALL graft.audio_neardups(input => …, output => … [, max_hamming,
    * existing, hashes_out])`: [[phashNearDupsProc]]'s contract on the
    * energy-delta audio fingerprint — default full-corpus banded join
    * over the input's WAVs (q186/q190's shape), `existing => '<stored
    * (media_id, ahash) table>'` for the incremental shape (only the
    * input's PCM parses), `hashes_out => <path>` to persist the input's
    * fingerprints for the store (one parse: pairs join from the written
    * table), and `trim_floor => <n >= 0>` for the time-shift-robust
    * silence-trimmed kernel (q196's; a store and its batches must use
    * ONE floor). Output rows: (id_a, id_b, hamming). */
  def audioNearDupsProc(resolve: String => String): UnboundProcedure =
    new Proc("audio_neardups", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("max_hamming", IntegerType).defaultValue("7").build(),
      ProcedureParameter.in("existing", StringType).defaultValue("NULL")
        .comment("stored (media_id, ahash) table; incremental when present")
        .build(),
      ProcedureParameter.in("hashes_out", StringType).defaultValue("NULL")
        .comment("also write the input's fingerprints here (one parse)")
        .build(),
      ProcedureParameter.in("trim_floor", IntegerType).defaultValue("-1")
        .comment("trim edge samples with |s| <= floor before windowing; " +
          "-1 (default) = raw boundary-sensitive fingerprint")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val out = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val maxHamming = input.getInt(2)
        // an explicit trim_floor => NULL must fall back to the raw default
        // (-1), not decode as floor-0 trimming (getInt on NULL reads 0)
        val trimFloor = if (input.isNullAt(5)) -1 else input.getInt(5)
        import org.apache.spark.sql.functions.col
        val hashed = graft.operators.Multimodal
          .audioFingerprints(readAny(spark, in), trimFloor)
          .filter(col("ahash").isNotNull)
        val pairs = nearDupPairs(spark, resolve, hashed,
          str(input, 4), str(input, 3),
          b => graft.operators.Multimodal
            .audioNearDupsFromHashes(b, maxHamming),
          (b, ex) => graft.operators.Multimodal
            .audioPairsAgainstHashes(b, ex, maxHamming))
        opResult(out, writeOut(pairs, out))
      }
    }

  /** `CALL graft.video_neardups(input => …, output => … [, every_nth,
    * max_hamming, min_shared_frames, existing, hashes_out])`: the
    * duplicate-clip detector as a runbook verb — every Nth frame of
    * every MP4 decodes to a perceptual hash, frame hashes pair through
    * the banded join, videos pair on >= min_shared_frames matched
    * frames (q185's shape). `hashes_out` persists the (media_id,
    * frame_no, fhash) store; `existing => '<stored frame-hash table>'`
    * is the incremental shape (only the input decodes),
    * `kernel => 'dct'` hashes each frame with the tone-edit-robust DCT
    * kernel (q198's case; one kernel per store), and `oriented => true`
    * matches frame pairs at min-over-dihedral-orbit hamming (the
    * rotated-clip case, q201; ahash frames only). Output rows:
    * (id_a, id_b, n_shared). */
  def videoNearDupsProc(resolve: String => String): UnboundProcedure =
    new Proc("video_neardups", Array(
      ProcedureParameter.in("input", StringType).build(),
      ProcedureParameter.in("output", StringType).build(),
      ProcedureParameter.in("every_nth", IntegerType).defaultValue("4").build(),
      ProcedureParameter.in("max_hamming", IntegerType).defaultValue("7").build(),
      ProcedureParameter.in("min_shared_frames", IntegerType)
        .defaultValue("2").build(),
      ProcedureParameter.in("existing", StringType).defaultValue("NULL")
        .comment("stored (media_id, frame_no, fhash) table; incremental " +
          "when present")
        .build(),
      ProcedureParameter.in("hashes_out", StringType).defaultValue("NULL")
        .comment("also write the input's frame hashes here (one decode)")
        .build(),
      ProcedureParameter.in("kernel", StringType).defaultValue("'ahash'")
        .comment("per-frame perceptual-hash kernel: ahash (default) | dct")
        .build(),
      ProcedureParameter.in("oriented", BooleanType).defaultValue("false")
        .comment("rotation/mirror-robust frame matching via the dihedral " +
          "orbit (ahash kernel only)")
        .build())) {
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val in = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("input must not be NULL")))
        val out = resolve(str(input, 1).getOrElse(
          throw new IllegalArgumentException("output must not be NULL")))
        val everyNth = input.getInt(2)
        val maxHamming = input.getInt(3)
        val minShared = input.getInt(4)
        val kernel = str(input, 7).getOrElse("ahash")
        val oriented = !input.isNullAt(8) && input.getBoolean(8)
        if (oriented && kernel != "ahash")
          throw new IllegalArgumentException(
            "oriented pairing permutes aHash grid cells; kernel must be " +
              s"'ahash', got '$kernel'")
        val hashed = graft.operators.Multimodal
          .videoFrameHashes(readAny(spark, in), everyNth, kernel)
        val pairs = nearDupPairs(spark, resolve, hashed,
          str(input, 6), str(input, 5),
          b =>
            if (oriented) graft.operators.Multimodal
              .videoNearDupsOrientedFromHashes(b, maxHamming, minShared)
            else graft.operators.Multimodal
              .videoNearDupsFromHashes(b, maxHamming, minShared),
          (b, ex) =>
            if (oriented) graft.operators.Multimodal
              .videoPairsOrientedAgainstHashes(b, ex, maxHamming, minShared)
            else graft.operators.Multimodal
              .videoPairsAgainstHashes(b, ex, maxHamming, minShared))
        opResult(out, writeOut(pairs, out))
      }
    }

  private val historySchema = StructType(Seq(
    StructField("generation", LongType, nullable = false),
    StructField("published_at", TimestampType, nullable = false),
    StructField("operation", StringType, nullable = true),
    StructField("partitions", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("is_current", BooleanType, nullable = false)))

  private final case class HistoryScan(out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = historySchema
  }

  private val detailSchema = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("generation", LongType, nullable = false),
    StructField("partition_col", StringType, nullable = true),
    StructField("partitions", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("files", IntegerType, nullable = true),
    StructField("bytes", LongType, nullable = true),
    StructField("key_col", StringType, nullable = true),
    StructField("version_col", StringType, nullable = true),
    StructField("stats_cols", StringType, nullable = true),
    StructField("bloom_cols", StringType, nullable = true),
    StructField("cluster_by", StringType, nullable = true),
    StructField("bucket_by", StringType, nullable = true),
    StructField("delete_mode", StringType, nullable = true),
    StructField("update_mode", StringType, nullable = true),
    StructField("live_delete_vectors", IntegerType, nullable = false),
    StructField("live_delta_dirs", IntegerType, nullable = false),
    StructField("checks", IntegerType, nullable = false),
    StructField("retain_generations", IntegerType, nullable = false),
    StructField("retain_hours", LongType, nullable = true)))

  private final case class DetailScan(out: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = out
    override def readSchema(): StructType = detailSchema
  }

  /** `CALL graft.detail(table => …)` — the DESCRIBE DETAIL surface: one
    * row of operational metadata (generation, logical row count, file
    * count/bytes, roles, declared layouts, delete routing, live
    * deletion vectors, constraints, retention), all from the manifest —
    * zero data files opened at any table size. */
  def detailProc(resolve: String => String): UnboundProcedure =
    new Proc("detail", Array(
      ProcedureParameter.in("table", StringType).build())) {
      override def isDeterministic: Boolean = false // reads table state
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val path = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("table must not be NULL")))
        val t = new Path(path)
        val fs = t.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val root = CommittedTable.readManifest(fs, t).getOrElse(
          throw new IllegalArgumentException(s"no committed table at $path"))
        val m = if (!root.partial) root
          else CommittedTable.hydrateSnapshot(fs, t, root, None)
        val live = m.segments.keys.toSeq
        val rows: Any =
          if (live.forall(m.rowCounts.contains))
            Long.box(live.map(v => m.rowCounts(v) +
              CommittedTable.morRowAdj(m, v)).sum)
          else null
        // data dirs = base segments plus live delta dirs (MoR merges)
        val segs = live.flatMap(v =>
          m.segments(v) +: CommittedTable.liveDeltas(m, v).map(_.dir))
        val (files: Any, bytes: Any) =
          if (segs.forall(m.files.contains)) {
            val fl = segs.flatMap(m.files)
            (Int.box(fl.size), Long.box(fl.map(_._2).sum))
          } else (null, null)
        def str0(v: Option[String]): Any =
          v.map(UTF8String.fromString).orNull
        def csv(vs: Seq[String]): Any =
          if (vs.isEmpty) null else UTF8String.fromString(vs.mkString(","))
        val row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(path), m.gen,
          str0(m.partitionCol), m.segments.size, rows, files, bytes,
          str0(m.keyCol), str0(m.verCol),
          csv(m.statsCols), csv(m.bloomCols),
          m.clusterBy.map { case (cs, n) =>
            UTF8String.fromString(s"${cs.mkString(",")} files=$n") }.orNull,
          m.bucketing.map { case (n, cs) =>
            UTF8String.fromString(s"${cs.mkString(",")} buckets=$n") }.orNull,
          str0(m.deleteMode), str0(m.updateMode),
          live.count(v => CommittedTable.liveDv(m, v).isDefined),
          live.map(v => CommittedTable.liveDeltas(m, v).size).sum,
          m.checks.size, m.retain,
          m.retainHours.map(Long.box).orNull))
        java.util.Collections.singletonList[Scan](DetailScan(Array(row)))
          .iterator()
      }
    }

  /** `CALL graft.history(table => …)`: one row per RETAINED generation
    * (the `VERSION AS OF` window), oldest first — generation, publish
    * time, live partition count, total rows when recorded, current flag.
    * Pure manifest metadata ([[CommittedTable.history]]): a directory
    * listing plus one anchor read per retained generation, zero data
    * files opened at any table size. */
  def history(resolve: String => String): UnboundProcedure =
    new Proc("history", Array(
      ProcedureParameter.in("table", StringType).build())) {
      override def isDeterministic: Boolean = false // reads table state
      override def call(input: InternalRow): JIterator[Scan] = {
        val spark = SparkSession.active
        val path = resolve(str(input, 0).getOrElse(
          throw new IllegalArgumentException("table must not be NULL")))
        val rows = CommittedTable.history(spark, path).map { g =>
          new GenericInternalRow(Array[Any](
            g.gen, g.publishedAtMillis * 1000L,
            g.op.map(UTF8String.fromString).orNull, g.partitions,
            g.rows.map(Long.box).orNull, g.current))
        }.toArray[InternalRow]
        java.util.Collections.singletonList[Scan](HistoryScan(rows)).iterator()
      }
    }

  def all(resolve: String => String): Map[String, UnboundProcedure] = Map(
    "compact" -> compact(resolve),
    "optimize" -> optimizeProc(resolve),
    "repartition_by" -> repartitionProc(resolve),
    "set_retention" -> setRetention(resolve),
    "restore" -> restoreProc(resolve),
    "recover" -> recover(resolve),
    "history" -> history(resolve),
    "detail" -> detailProc(resolve),
    "init_agg_view" -> initAggView(resolve),
    "sync_agg_view" -> syncAggView(resolve),
    "clone" -> cloneProc(resolve),
    "vacuum" -> vacuumProc(resolve),
    "analyze" -> analyzeProc(resolve),
    "dedup_minhash" -> dedupMinhash(resolve),
    "decontaminate" -> decontaminateProc(resolve),
    "ann_topk" -> annTopK(resolve),
    "phash_neardups" -> phashNearDupsProc(resolve),
    "audio_neardups" -> audioNearDupsProc(resolve),
    "video_neardups" -> videoNearDupsProc(resolve))
}
