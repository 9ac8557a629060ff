package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.sources.StreamSourceProvider
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.hadoop.fs.Path

import graft.sources.CommittedTable

/** Change-data-capture stream over a [[graft.sources.CommittedTable]]:
  * each micro-batch is the change batches of the generations published
  * since the last committed offset, in order — the streaming closure of
  * the CDC loop [[StreamingMerge.toCommitted]] writes.
  *
  * Offsets ARE generation numbers (the table's own commit log is the
  * write-ahead log — no side state), so delivery is exactly-once under a
  * checkpoint: the engine commits generation N only after batch (M, N]
  * is durably processed, and a restart replays from the last committed
  * generation. Each row carries `_change_gen`, the generation that
  * published it.
  *
  * Three delta granularities (`mode` option):
  *  - `full` (default): [[CommittedTable.changesFor]] — a generation's
  *    batch is the FULL rewritten contents of every partition it touched
  *    (latest-version-wins rows, an idempotent upsert batch downstream
  *    re-merges by key). This is partition-granularity CDC: one upserted
  *    row in a hot partition emits the whole partition downstream —
  *    write amplification bounded by the merge's own rewrite, correct
  *    for latest-wins consumers, wasteful for narrow ones.
  *  - `keys`: [[CommittedTable.changesForKeys]] — only rows whose
  *    `(key, versionCol)` pair is new vs the previous generation's same
  *    partitions (requires `key` + `versionCol` options). Amplification
  *    drops to the true upsert set; the consumer must stay within
  *    `retainGenerations - 2` of the writer (the baseline generation
  *    must be retained too). No tombstones: deletes do not surface.
  *  - `cdf`: [[CommittedTable.changesCdf]] — the Delta-CDF model: every
  *    changed row tagged `_change_type` ∈ insert / update_preimage /
  *    update_postimage / delete (tombstones included), replayable into a
  *    replica via [[ChangeFeed.applyCdf]]. Same lag bound as `keys`.
  *
  * Retention contract: a consumer lagging past the table's retain window
  * fails LOUDLY at the next batch ([[CommittedTable.changesFor]] names
  * the readable range) instead of silently skipping generations — resume
  * by restarting from a fresh checkpoint (a full re-sync), the same
  * remedy as any CDC reader that outlived the log.
  *
  * Schema is fixed at stream start from the table's current manifest;
  * pre-widen generations NULL-fill a later column. A column widened
  * AFTER start cannot ride the fixed schema: the batch that first
  * carries it FAILS LOUDLY naming the remedy (restart the stream — the
  * checkpoint resumes at the same generation with the widened schema)
  * unless `schemaDrift=drop` opts into delivering batches without the
  * new column — no silent narrowing either way.
  *
  * Scale shape: offset discovery is ONE manifest read (metadata, no
  * listing); a batch plans only the touched partitions' segments via the
  * generation's retained anchor manifest. Nothing here is proportional
  * to table size — only to what the writer actually rewrote.
  */
object ChangeFeed {
  /** Marker column: the generation that published each row. */
  val GenColumn = "_change_gen"

  /** `spark.readStream` assembled for a committed table at `path`.
    * `startingGeneration`: `"latest"` (only generations published after
    * stream start), `"earliest"` (every retained generation), or a
    * number (start AT that generation). `keyDelta = Some((key,
    * versionCol))` selects key-level batches ([[CommittedTable
    * .changesForKeys]]). */
  def read(spark: SparkSession, path: String,
      startingGeneration: String = "earliest",
      keyDelta: Option[(String, String)] = None): DataFrame = {
    val base = spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("path", path)
      .option("startingGeneration", startingGeneration)
    keyDelta.fold(base) { case (k, v) =>
      base.option("mode", "keys").option("key", k).option("versionCol", v)
    }.load()
  }

  /** [[read]] in FULL-CDF mode ([[CommittedTable.changesCdf]]): every
    * row additionally tagged `_change_type` ∈ insert / update_preimage /
    * update_postimage / delete — the variant whose batches [[applyCdf]]
    * can replay into a replica, deletes included. */
  def readCdf(spark: SparkSession, path: String, key: String,
      versionCol: String,
      startingGeneration: String = "earliest"): DataFrame =
    spark.readStream
      .format(classOf[ChangeFeedProvider].getName)
      .option("path", path)
      .option("startingGeneration", startingGeneration)
      .option("mode", "cdf")
      .option("key", key).option("versionCol", versionCol)
      .load()

  /** Replay one [[readCdf]] micro-batch into the committed replica at
    * `dst` (typically from `foreachBatch`): per generation in order,
    * inserts + postimages MERGE (latest-version-wins keeps the replay
    * idempotent under at-least-once delivery) and deletes remove by key
    * ([[CommittedTable.deleteKeys]] — no driver-side key list). The
    * per-generation loop is metadata-bounded (a micro-batch spans few
    * generations by construction); preimage rows are audit data, not
    * replayed. Bootstrap `dst` with a zero-row [[CommittedTable.write]]
    * of the source schema.
    *
    * `mor = true` replays through the merge-on-read verbs
    * ([[CommittedTable.mergeMor]] / [[CommittedTable.deleteKeysMor]]) —
    * the replica's per-sync cost becomes O(the batch's own rows)
    * (deletion vectors + delta segments) instead of rewriting each
    * touched partition whole; the replica self-remediates through the
    * same `fragmentedPartitions`/`optimize` loop as any MoR table. The
    * replay stays idempotent either way: a replayed upsert TIES on
    * (key, version) and MoR tie keeps the existing row (not even a
    * generation is burned); a replayed key takedown finds no visible
    * row. */
  def applyCdf(batch: DataFrame, dst: String, key: String,
      versionCol: String, partitionCol: String,
      mor: Boolean = false): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val gens = batch.select(col(GenColumn)).distinct()
      .as[Long].collect().sorted
    gens.foreach { g =>
      val b = batch.filter(col(GenColumn) === g)
      val ups = b
        .filter(col(CommittedTable.ChangeTypeColumn)
          .isin("insert", "update_postimage"))
        .drop(GenColumn, CommittedTable.ChangeTypeColumn)
      if (!ups.isEmpty) {
        if (mor)
          CommittedTable.mergeMor(spark, dst, ups, key, versionCol, partitionCol)
        else
          CommittedTable.merge(spark, dst, ups, key, versionCol, partitionCol)
      }
      val dels = b
        .filter(col(CommittedTable.ChangeTypeColumn) === "delete")
        .select(col(key))
      if (!dels.isEmpty) {
        if (mor)
          CommittedTable.deleteKeysMor(spark, dst, dels, key, partitionCol)
        else
          CommittedTable.deleteKeys(spark, dst, dels, key, partitionCol)
      }
    }
  }

  private[streaming] def tableSchema(spark: SparkSession, path: String,
      cdf: Boolean = false): StructType = {
    val s = CommittedTable.read(spark, path).schema
    require(!s.fieldNames.contains(GenColumn),
      s"committed table at $path already has a $GenColumn column; the " +
        "change feed reserves that name for its generation marker")
    val withType =
      if (cdf) s.fields :+ StructField(CommittedTable.ChangeTypeColumn,
        org.apache.spark.sql.types.StringType, nullable = false)
      else s.fields
    StructType(withType :+ StructField(GenColumn, LongType, nullable = false))
  }
}

/** DSv1 `StreamSourceProvider` for [[ChangeFeed]] — use via
  * `spark.readStream.format("graft-changefeed")` (registered through
  * META-INF/services, the standard Spark short-name route — no internal
  * class names in user code) or the [[ChangeFeed.read]] convenience. The
  * table must already exist (the feed follows a table, it does not
  * create one). */
class ChangeFeedProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-changefeed"
  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("ChangeFeed needs a 'path' option"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    ("committed-change-feed",
      ChangeFeed.tableSchema(sqlContext.sparkSession, path(parameters),
        cdf = parameters.get("mode").contains("cdf")))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val p = path(parameters)
    val spark = sqlContext.sparkSession
    val mode = parameters.getOrElse("mode", "full")
    def kv(): (String, String) = (
      parameters.getOrElse("key", throw new IllegalArgumentException(
        s"mode=$mode needs a 'key' option")),
      parameters.getOrElse("versionCol", throw new IllegalArgumentException(
        s"mode=$mode needs a 'versionCol' option")))
    val (keyDelta, cdf) = mode match {
      case "full" => (None, false)
      case "keys" => (Some(kv()), false)
      case "cdf" => (Some(kv()), true)
      case other => throw new IllegalArgumentException(
        s"unknown ChangeFeed mode '$other' (expected full, keys, or cdf)")
    }
    val start = parameters.getOrElse("startingGeneration", "earliest")
    val dropDrift = parameters.get("schemaDrift") match {
      case None | Some("fail") => false
      case Some("drop") => true
      case Some(other) => throw new IllegalArgumentException(
        s"unknown schemaDrift '$other' (expected fail or drop)")
    }
    val maxGens = parameters.get("maxGenerationsPerBatch").map { v =>
      val n = v.toInt
      require(n >= 1, s"maxGenerationsPerBatch must be >= 1, got $n")
      n
    }
    new ChangeFeedSource(spark, p, start, keyDelta, cdf, dropDrift, maxGens)
  }
}

/** The [[Source]]: `getOffset` = the table's current generation (one
  * manifest read), `getBatch(start, end)` = the union of change batches
  * for generations in `(start, end]`, re-tagged streaming via
  * [[bridge.asStreamingDataFrame]] (the `isStreaming` contract
  * `MicroBatchExecution` asserts). The base for a fresh stream
  * (`start = None`) comes from `startingGeneration`, resolved ONCE at
  * source creation so "latest" means latest-at-start, not
  * latest-at-first-batch. */
class ChangeFeedSource(spark: SparkSession, path: String,
    startingGeneration: String, keyDelta: Option[(String, String)],
    cdf: Boolean = false, dropDrift: Boolean = false,
    maxGenerationsPerBatch: Option[Int] = None)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  override val schema: StructType = ChangeFeed.tableSchema(spark, path, cdf)
  // minus _change_gen (and, in cdf mode, the _change_type the batch carries)
  private val tableCols =
    schema.fields.dropRight(if (cdf) 2 else 1)

  private def currentGen(): Long = {
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ROOT-ONLY parse: the generation number lives in the manifest root,
    // so a sharded 100k-file table's getOffset stays one small-file read
    CommittedTable.readManifestRoot(fs, table).getOrElse(
      throw new java.io.IOException(s"committed table at $path vanished " +
        "under a running change feed")).gen
  }

  // base offset of a fresh stream: batches begin at initialBase + 1
  private val initialBase: Long = startingGeneration match {
    case "latest" => currentGen()
    case "earliest" => 0L // changesFor enforces the true retained floor
    case n if n.forall(_.isDigit) && n.nonEmpty =>
      val g = n.toLong
      require(g >= 1, s"startingGeneration must be >= 1, got $g")
      g - 1
    case other => throw new IllegalArgumentException(
      s"startingGeneration must be latest, earliest, or a generation " +
        s"number; got '$other'")
  }

  // Recovery discriminator: on a checkpoint restart MicroBatchExecution
  // re-issues getBatch for the last WAL'd batch BEFORE any getOffset of
  // this run (source re-initialization — the batch's rows were already
  // delivered). Only a batch planned AFTER a getOffset of this process
  // can be genuinely new, so only that path may raise the lost-range error.
  @volatile private var offsetPolled = false

  // rate-limit watermark: the highest generation already planned into a
  // batch (synced from the WAL'd end on checkpoint recovery via getBatch)
  @volatile private var lastPlanned: Long = initialBase

  // Trigger.AvailableNow freeze: without this trait the engine would
  // wrap a v1 Source and SNAPSHOT getOffset once at start — a rate-capped
  // offset would then silently truncate the drain to the first batch.
  // Implementing SupportsTriggerAvailableNow makes the engine poll
  // getOffset per micro-batch until it stops advancing, while the cap
  // recorded here freezes the drain target so a concurrent writer cannot
  // keep the query alive forever.
  @volatile private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowCap = Some(currentGen())
  }

  /** `maxGenerationsPerBatch` caps each micro-batch at N generations —
    * a backlog (a stream started `earliest` on a long history, or one
    * resumed after downtime) drains as bounded batches instead of one
    * giant catch-up batch whose shuffle must fit at once. The cap trades
    * batch size for LAG: while draining, the consumer trails the writer,
    * so the table's `retainGenerations` must cover backlog ÷ cap extra
    * cycles — the retention contract stays loud if it doesn't. */
  private def cappedOffset(): Option[LongOffset] = {
    offsetPolled = true
    val gen = availableNowCap.fold(currentGen())(c =>
      math.min(currentGen(), c))
    val capped = maxGenerationsPerBatch match {
      case Some(n) => math.min(gen, math.max(lastPlanned, initialBase) + n)
      case None => gen
    }
    if (capped <= initialBase) None else Some(LongOffset(capped))
  }

  override def getOffset: Option[Offset] = cappedOffset()

  // the SupportsAdmissionControl form the engine actually calls once the
  // AvailableNow trait is present (FileStreamSource's shape): the rate
  // cap steps from the internal lastPlanned watermark, startOffset is
  // not needed
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      startOffset: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    cappedOffset().orNull

  private def genOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalArgumentException(
      s"unexpected offset type ${other.getClass.getName}")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    lastPlanned = math.max(lastPlanned, genOf(end))
    val base = start.map(genOf).getOrElse {
      // "earliest" floor: the oldest generation changesFor can still serve
      if (initialBase > 0L) initialBase
      else {
        // "earliest" floor: full mode can serve every retained generation;
        // keys/cdf need the BASELINE generation retained too, so on an
        // AGED table their floor is one generation tighter — otherwise an
        // earliest start dies on its very first batch's missing baseline.
        // Generation 1 (the initial load) is all-insert and needs no
        // baseline, so a table whose history still reaches gen 1 streams
        // from the very beginning in every mode.
        val oldestReadable = currentGen() - retain() + 1
        if (keyDelta.isDefined && oldestReadable > 1L) oldestReadable
        else math.max(0L, oldestReadable - 1L)
      }
    }
    val endGen = genOf(end)
    if (endGen <= base) {
      // With a committed start this is a replayed no-op range (restart
      // re-plans an already-delivered batch): zero rows, stream schema.
      // With NO start (earliest), the floor was re-derived at batch-
      // planning time; a writer racing past the retain window between
      // getOffset and here would make base swallow the whole requested
      // range — that is retention lag, and it must fail LOUDLY (the
      // module's contract), not commit a silently empty batch. The one
      // start=None call that is NOT a fresh plan is checkpoint-recovery
      // re-initialization (already delivered; precedes any getOffset of
      // this run) — benign, returns empty like any replay.
      if (start.isEmpty && offsetPolled)
        throw new IllegalStateException(
          s"change feed on $path lost generations 1..$endGen before the " +
            s"first batch: the earliest retained start is now ${base + 1} " +
            "(writer outran the retention window during stream start); " +
            "raise retainGenerations or start the stream from latest")
      return bridge.asStreamingDataFrame(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    }
    val batches = (base + 1) to endGen map { g =>
      val delta = (keyDelta, cdf) match {
        case (Some((k, v)), true) =>
          CommittedTable.changesCdf(spark, path, g, k, v)
        case (Some((k, v)), false) =>
          CommittedTable.changesForKeys(spark, path, g, k, v)
        case _ => CommittedTable.changesFor(spark, path, g)
      }
      // a column WIDENED after stream start cannot ride the stream's fixed
      // schema — narrowing it silently (the one quiet contract this module
      // had) would let a consumer replicate post-widen generations minus
      // their new column and drift; fail loudly naming the remedy unless
      // the caller opted into dropping (schemaDrift=drop)
      val reserved = Set(ChangeFeed.GenColumn, CommittedTable.ChangeTypeColumn)
      val widened = delta.columns.toSet -- tableCols.map(_.name) -- reserved
      if (widened.nonEmpty && !dropDrift)
        throw new IllegalStateException(
          s"change feed on $path: generation $g carries column(s) " +
            s"${widened.toSeq.sorted.mkString(", ")} added after stream " +
            "start; the stream's schema is fixed at start, so restart the " +
            "stream (fresh readStream, same checkpoint) to pick them up — " +
            "or set schemaDrift=drop to deliver batches without them")
      // conform to the stream's fixed schema: NULL-fill a column the
      // generation predates
      val cells = tableCols.map { f =>
        if (delta.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq
      val conformed =
        if (cdf) delta.select(
          (cells :+ col(CommittedTable.ChangeTypeColumn)): _*)
        else delta.select(cells: _*)
      conformed.withColumn(ChangeFeed.GenColumn, lit(g))
    }
    bridge.asStreamingDataFrame(batches.reduce(_ unionByName _))
  }

  private def retain(): Long = {
    val table = new Path(path)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    CommittedTable.readManifestRoot(fs, table).map(_.retain.toLong).getOrElse(2L)
  }

  override def stop(): Unit = ()
}
