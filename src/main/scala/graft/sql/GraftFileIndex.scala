package graft.sql

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.CommittedTable
import graft.sources.CommittedTable.Manifest

/** Manifest-backed [[FileIndex]] — how a SQL `SELECT` over a committed
  * table gets the SAME metadata pruning as the Scala
  * `CommittedTable.read/readRangeMulti` path while keeping Spark's
  * native vectorized parquet scan: the index snapshots one committed
  * generation at plan time, and `listFiles` prunes SEGMENTS (never
  * listing an unselected one) from the pushed-down data filters —
  *
  *  - the manifest's partition column is exposed as a REAL partition
  *    column (partitionSchema), so equality / IN on it arrives as
  *    partitionFilters (evaluated here against the manifest value list)
  *    and Spark's dynamic partition pruning applies at execution time —
  *    a filtered dim in a star join prunes this scan through the reused
  *    broadcast; the legacy dataFilter path for the same predicates is
  *    kept as a harmless belt-and-braces;
  *  - range / equality predicates on zone-mapped stats columns →
  *    [[CommittedTable.zoneSurvivors]], the same conservative min/max
  *    intersection `readRangeMulti` uses.
  *
  * Pruning only ever shrinks I/O: every predicate is ALSO pushed to the
  * parquet reader by Spark (these are ordinary data filters), so an
  * unprunable shape (OR, cast, UDF…) degrades to scanning all segments
  * with row-group skipping — never a wrong answer. */
final class GraftFileIndex(spark: SparkSession, tablePath: Path,
    m: Manifest, schema: StructType) extends FileIndex {

  private val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // `m` may be a root-only snapshot of a SHARDED manifest (partition
  // maps not yet loaded): hydration is lazy and PRUNED — a query whose
  // filters pin partition values parses only the shards whose range can
  // hold one (O(survivors)); an unconstrained scan pays the one full
  // hydration it needs anyway. Shard files are immutable and referenced
  // by name, so every hydration reproduces exactly this snapshot
  // generation regardless of concurrent publishes.
  private lazy val fullM: Manifest =
    if (!m.partial) m
    else CommittedTable.hydrateSnapshot(fs, tablePath, m, None)

  private def hydratedFor(filters: Seq[Expression]): Manifest =
    if (!m.partial) m
    else {
      val sets = m.partitionCol.toSeq.flatMap(pc =>
        filters.flatMap(partitionValuesOf(pc, _)))
      if (sets.isEmpty) fullM
      else CommittedTable.hydrateSnapshot(fs, tablePath, m,
        Some(sets.reduce(_ intersect _)))
    }

  // file lists come from the MANIFEST when recorded (one `f=` line per
  // data file, captured at staging — segments are immutable), so query
  // planning costs zero listStatus RPCs however many partitions the
  // table has; a pre-feature segment falls back to one listing and is
  // backfilled by the table's next publish
  private def filesOf(h: Manifest, v: String): Seq[FileStatus] =
    filesOf(h, v, Nil)

  /** `plans` (compiled by [[CommittedTable.zonePlans]] from the scan's
    * data filters) drops FILES whose recorded per-file zone map cannot
    * contain a matching row — the intra-partition data-skipping step: a
    * range predicate over a sorted/range-clustered partition reads the
    * overlapping files, not the whole segment. A file with no recorded
    * entry (pre-feature manifest) is kept; correctness is owned by the
    * exact pushed filter, skipping only ever shrinks I/O. */
  private def filesOf(h: Manifest, v: String,
      plans: Seq[(Int, (String, String) => Int,
                  Seq[(Option[String], Option[String])])])
      : Seq[FileStatus] = {
    // a partition's data = its base segment UNION its live delta dirs
    // (MoR merge/update appendages); the dv anti-join wrap removes the
    // superseded base rows
    val dirs = h.segments(v) +:
      CommittedTable.liveDeltas(h, v).map(_.dir)
    dirs.flatMap { seg =>
      val leaf = CommittedTable.segLeaf(seg)
      def keep(name: String): Boolean =
        plans.isEmpty || CommittedTable.zoneKeep(plans,
          idx => h.fileStats.get(s"$leaf/$name").map(_(idx)))
      h.files.get(seg) match {
        case Some(recorded) => recorded.withFilter(f => keep(f._1))
          .map { case (name, len) =>
            new FileStatus(len, false, 1, 134217728L, 0L,
              fs.makeQualified(new Path(new Path(tablePath, seg), name)))
          }
        case None =>
          fs.listStatus(new Path(tablePath, seg)).toSeq
            .filter(st => st.isFile && {
              val n = st.getPath.getName
              !n.startsWith("_") && !n.startsWith(".") && keep(n)
            })
      }
    }
  }

  private def segFiles(h: Manifest, values: Seq[String]): Seq[FileStatus] =
    values.sorted.flatMap(filesOf(h, _))

  override def rootPaths: Seq[Path] = Seq(tablePath)

  // the manifest's partition column, exposed as a REAL partition column
  // when the table records one: Spark then drives static partition
  // filters AND dynamic partition pruning (a selective dim filter in a
  // star join prunes this fact scan's partitions at RUNTIME through the
  // reused broadcast — no fact bytes read for unselected partitions)
  // through the standard FileSourceScanExec machinery. The column is
  // typed from the table schema (STRING by the stage contract) and is
  // ALSO present in the data files — harmless: the reader only
  // materializes dataSchema columns and appends the directory value.
  private val pcField = m.partitionCol.flatMap(pc =>
    schema.fields.find(_.name == pc))

  override def partitionSchema: StructType = StructType(pcField.toSeq)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // partition-column predicates arrive as partitionFilters on the
    // partitioned relation (dataFilters on the legacy shape) — both feed
    // the shard-pruned hydration
    val h = hydratedFor(partitionFilters ++ dataFilters)
    val survivors = prune(h, dataFilters)
    // per-FILE zone-map plans for the same ranges the partition prune
    // used: surviving partitions drop the files a range predicate cannot
    // touch (no-op when the manifest records no file stats)
    val filePlans =
      if (h.fileStats.isEmpty) Nil
      else {
        val ranges = dataFilters.flatMap(intervalsOf)
          .filter { case (c, _) => h.statsCols.contains(c) }
        if (ranges.isEmpty) Nil
        else CommittedTable.zonePlans(h, Some(schema), ranges)
      }
    pcField match {
      case None =>
        Seq(PartitionDirectory(InternalRow.empty,
          survivors.sorted.flatMap(filesOf(h, _, filePlans)).toArray))
      case Some(f) =>
        // static partition filters evaluate here against the manifest's
        // value list (the PartitioningAwareFileIndex contract); DYNAMIC
        // pruning filters never reach this method — FileSourceScanExec
        // re-filters the returned directories at execution time once the
        // dim side has run
        val kept =
          if (partitionFilters.isEmpty) survivors
          else {
            val bound = Predicate.createInterpreted(
              partitionFilters.reduce(And).transform {
                case _: AttributeReference =>
                  BoundReference(0, f.dataType, nullable = true)
              })
            survivors.filter(v => bound.eval(
              InternalRow(org.apache.spark.unsafe.types.UTF8String
                .fromString(v))))
          }
        kept.sorted.map(v => PartitionDirectory(
          InternalRow(
            org.apache.spark.unsafe.types.UTF8String.fromString(v)),
          filesOf(h, v, filePlans).toArray))
    }
  }

  override lazy val inputFiles: Array[String] =
    segFiles(fullM, fullM.segments.keys.toSeq).map(_.getPath.toString).toArray

  // a sharded root records per-shard byte totals, so the CBO
  // size estimate (auto-broadcast, q150) costs zero shard reads
  override lazy val sizeInBytes: Long =
    if (m.partial) CommittedTable.rootBytes(m)
    else segFiles(m, m.segments.keys.toSeq).map(_.getLen).sum

  override def refresh(): Unit = ()

  /** Sum of manifest row counts when every partition carries one — the
    * zero-job `COUNT(*)` feed for [[GraftMetadataAgg]]. A sharded root
    * answers from its per-shard totals, zero shard reads. */
  def totalRowCount: Option[Long] =
    if (m.partial) {
      // sharded-root shard/index totals are LOGICAL (dv removals already
      // subtracted at serialization)
      CommittedTable.rootRows(m)
    }
    else if (m.segments.nonEmpty && m.segments.keys.forall(m.rowCounts.contains))
      // keys is set-like: map-then-sum would DEDUPLICATE equal counts;
      // LOGICAL counts: live dvs subtract, live delta segments add
      Some(m.segments.keys.iterator.map(v =>
        m.rowCounts(v) + CommittedTable.morRowAdj(m, v)).sum)
    else if (m.segments.isEmpty) Some(0L)
    else None

  /** Whether ANY live deletion vector applies to this snapshot — the
    * SQL substitution's wrap decision, answerable from a root-only
    * hydration (the root's `dvn=` summary). */
  def hasLiveDvs: Boolean =
    if (m.partial) m.rootDvParts > 0
    else m.segments.keys.exists(v => CommittedTable.liveDv(m, v).isDefined)

  /** Every live vector dir of the snapshot, resolved against the table
    * path (clone entries are absolute) — the dv anti-join's right side.
    * Hydrates a sharded manifest fully: a dv'd table pays the one
    * hydration its scan needs anyway. */
  def liveDvPaths: Seq[String] = {
    val h = fullM
    h.segments.keys.flatMap(v => CommittedTable.liveDv(h, v)).map(_.dir)
      .toSeq.distinct.sorted
      .map(d => (if (d.contains("/")) new Path(d)
                 else new Path(tablePath, d)).toString)
  }

  /** The manifest's partition column, if the table records one — the
    * [[GraftMetadataAgg]] filter-composition guard. */
  def partitionColumn: Option[String] = m.partitionCol

  /** Every live partition value of this snapshot. */
  def livePartitionValues: Seq[String] = fullM.segments.keys.toSeq

  /** Sum of manifest row counts over exactly `parts` — None when any
    * lacks a recorded count (pre-feature segment). */
  def rowCountFor(parts: Seq[String]): Option[Long] = {
    val h = fullM
    if (parts.forall(h.rowCounts.contains))
      Some(parts.map(v => h.rowCounts(v) + CommittedTable.morRowAdj(h, v)).sum)
    else None
  }

  /** Per-partition zone-map bounds of `colName` (canonical strings, the
    * manifest encoding) for exactly `parts` — Some only when the column
    * is zone-mapped AND every named partition carries recorded stats,
    * the exactness precondition for answering MIN/MAX from metadata.
    * A (None, None) element is an all-NULL segment. */
  def columnBounds(colName: String, parts: Seq[String])
      : Option[Seq[(Option[String], Option[String])]] = {
    val h = fullM
    val idx = h.statsCols.indexOf(colName)
    if (idx < 0) None
    // a live deletion vector makes the zone maps CONSERVATIVE (they may
    // describe deleted rows): still sound for pruning, NOT exact for a
    // MIN/MAX answer — bail to the scan
    else if (parts.exists(p => CommittedTable.liveDv(h, p).isDefined)) None
    else {
      val per = parts.map(p => h.stats.get(p).flatMap(_.lift(idx)))
      if (per.forall(_.isDefined)) Some(per.map(_.get)) else None
    }
  }

  /** Partition values surviving the translatable conjuncts of
    * `dataFilters` (exposed for specs: the pruning decision without the
    * scan). */
  private[sql] def prune(dataFilters: Seq[Expression]): Seq[String] =
    prune(hydratedFor(dataFilters), dataFilters)

  private def prune(h: Manifest, dataFilters: Seq[Expression]): Seq[String] = {
    val base = h.segments.keys.toSeq
    val partPruned = h.partitionCol match {
      case Some(pc) =>
        val allowed = dataFilters.flatMap(partitionValuesOf(pc, _))
        allowed.foldLeft(base)((acc, set) => acc.filter(set))
      case None => base
    }
    // equality / IN on a bloomed column → per-segment `_bloom-*` sidecar
    // probe (the point-lookup complement to zone maps): one small-file
    // read per candidate segment at PLAN time, no false negatives, and
    // the predicate still reaches the parquet reader — the sidecars only
    // ever shrink the I/O
    val bloomPruned = dataFilters.flatMap(bloomProbeOf)
      .filter { case (c, _) => h.bloomCols.contains(c) }
      .foldLeft(partPruned) { case (acc, (c, lits)) =>
        val hashes: Array[Long] = lits.map(l =>
          new XxHash64(Seq(l)).eval(null).asInstanceOf[Long]).toArray
        CommittedTable.bloomSurvivors(spark, tablePath, h, c, hashes) match {
          case Some(surv) => val keep = surv.toSet; acc.filter(keep)
          case None => acc
        }
      }
    val ranges = dataFilters.flatMap(intervalsOf)
      .filter { case (c, _) => h.statsCols.contains(c) }
    if (ranges.isEmpty) bloomPruned
    else CommittedTable.zoneSurvivors(h, Some(schema), ranges, bloomPruned)
  }

  /** `c = lit` / `c IN (…)` → the probed literals (typed AS THE COLUMN —
    * post-analysis both sides share the attribute's type, so the driver
    * hash equals the executor-side `xxhash64(col)` the sidecar was built
    * from). NULL probes are dropped: `= NULL` selects nothing, pruning
    * nothing stays sound. */
  private def bloomProbeOf(e: Expression): Option[(String, Seq[Literal])] =
    e match {
      case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
        Some((a.name, Seq(l)))
      case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
        Some((a.name, Seq(l)))
      case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
        Some((a.name, Seq(l)))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        Some((a.name,
          vs.collect { case l: Literal if l.value != null => l }))
      case InSet(a: AttributeReference, vs) =>
        Some((a.name,
          vs.filter(_ != null).map(v => Literal(v, a.dataType)).toSeq))
      case _ => None
    }

  private def external(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  /** One conjunct → a DISJUNCTION of [lo, hi] intervals on one column
    * (the [[CommittedTable.zonePlans]] shape): a plain comparison is
    * one interval, `IN` / `InSet` a point interval per non-NULL literal
    * (dropping NULLs is sound — they admit no extra rows), a same-column
    * `OR` of prunable sides the union of both sides' intervals. None =
    * this conjunct cannot prune (kept sound by keeping everything). */
  private def intervalsOf(e: Expression)
      : Option[(String, Seq[(Option[Any], Option[Any])])] = e match {
    case In(a: AttributeReference, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      Some((a.name, vs.collect { case l: Literal if l.value != null =>
        (Some(external(l)), Some(external(l))) }))
    case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
      Some((a.name, vs.toSeq.filter(_ != null).map { v =>
        val x = CatalystTypeConverters.convertToScala(v, a.dataType)
        (Some(x), Some(x))
      }))
    case Or(x, y) =>
      for {
        (cx, ix) <- intervalsOf(x)
        (cy, iy) <- intervalsOf(y)
        if cx == cy
      } yield (cx, ix ++ iy)
    // prefix LIKE on a string column → the lexicographic range
    // [prefix, next(prefix)): every string with the prefix sorts inside
    // it, so min/max pruning applies (next() increments the last
    // non-max char; an all-max prefix degrades to lower-bound-only)
    case StartsWith(a: AttributeReference, Literal(p, _)) if p != null =>
      val prefix = p.toString
      Some((a.name, Seq((Some(prefix), nextPrefix(prefix)))))
    case other => rangeOf(other).map { case (c, lo, hi) => (c, Seq((lo, hi))) }
  }

  /** Smallest string greater than every string starting with `prefix`:
    * drop trailing Char.MaxValue chars, increment the last remaining
    * one; None when the whole prefix is Char.MaxValue (no upper bound —
    * lower-bound pruning still applies). */
  private def nextPrefix(prefix: String): Option[Any] = {
    val trimmed = prefix.reverse.dropWhile(_ == Char.MaxValue).reverse
    if (trimmed.isEmpty) None
    else Some(trimmed.init + (trimmed.last + 1).toChar)
  }

  /** `pc = 'v'` / `pc IN (…)` / `pc <=> 'v'` → the allowed value set;
    * None when this conjunct does not constrain the partition column.
    * Values compare in their string form — the partition column is typed
    * STRING by the table contract. */
  private def partitionValuesOf(pc: String, e: Expression)
      : Option[Set[String]] = e match {
    case EqualTo(a: AttributeReference, l: Literal) if a.name == pc =>
      Option(external(l)).map(v => Set(v.toString))
    case EqualTo(l: Literal, a: AttributeReference) if a.name == pc =>
      Option(external(l)).map(v => Set(v.toString))
    case EqualNullSafe(a: AttributeReference, l: Literal) if a.name == pc =>
      Option(external(l)).map(v => Set(v.toString))
    case In(a: AttributeReference, vs) if a.name == pc &&
        vs.forall(_.isInstanceOf[Literal]) =>
      Some(vs.collect { case l: Literal if l.value != null =>
        external(l).toString }.toSet)
    case InSet(a: AttributeReference, vs) if a.name == pc =>
      Some(vs.filter(_ != null).map(v =>
        CatalystTypeConverters.convertToScala(v, a.dataType).toString))
    case _ => None
  }

  /** One conjunct → a zone-map range on a column, conservative: strict
    * bounds widen to inclusive (pruning-safe), unsupported shapes (OR,
    * casts, functions) prune nothing. */
  private def rangeOf(e: Expression)
      : Option[(String, Option[Any], Option[Any])] = e match {
    case EqualTo(a: AttributeReference, l: Literal) if l.value != null =>
      Some((a.name, Some(external(l)), Some(external(l))))
    case EqualTo(l: Literal, a: AttributeReference) if l.value != null =>
      Some((a.name, Some(external(l)), Some(external(l))))
    case GreaterThan(a: AttributeReference, l: Literal) if l.value != null =>
      Some((a.name, Some(external(l)), None))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
      Some((a.name, Some(external(l)), None))
    case LessThan(a: AttributeReference, l: Literal) if l.value != null =>
      Some((a.name, None, Some(external(l))))
    case LessThanOrEqual(a: AttributeReference, l: Literal) if l.value != null =>
      Some((a.name, None, Some(external(l))))
    case GreaterThan(l: Literal, a: AttributeReference) if l.value != null =>
      Some((a.name, None, Some(external(l))))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
      Some((a.name, None, Some(external(l))))
    case LessThan(l: Literal, a: AttributeReference) if l.value != null =>
      Some((a.name, Some(external(l)), None))
    case LessThanOrEqual(l: Literal, a: AttributeReference) if l.value != null =>
      Some((a.name, Some(external(l)), None))
    case _ => None
  }
}
