package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.CommittedTable

/** DSv2 `TableCatalog` over [[CommittedTable]] warehouses — the SQL
  * front door the lakehouse verbs were missing: with
  * `spark.sql.catalog.graft = graft.sql.GraftCatalog` (+ optional
  * `spark.sql.catalog.graft.warehouse = <root>`),
  *
  *  - `SELECT … FROM graft.ns.t` resolves through [[GraftTableV2]] and is
  *    substituted by [[GraftAnalysis]] with a native parquet scan whose
  *    [[GraftFileIndex]] prunes segments from manifest METADATA
  *    (partition values + zone maps) before any file is listed;
  *  - `DELETE FROM` / `UPDATE` / `MERGE INTO` / `INSERT INTO` route to
  *    `CommittedTable.delete/update/merge` — the SAME atomic-publish,
  *    fencing, retention and CDC protocol as the Scala API (SQL is a
  *    front end, not a second write path);
  *  - `SELECT COUNT(*) FROM graft.ns.t` collapses to manifest row counts
  *    (zero jobs) via [[GraftMetadataAgg]].
  *
  * Identifier → path: `graft.ns.t` → `<warehouse>/ns/t` (any namespace
  * depth); a BACKQUOTED ABSOLUTE name — `` graft.`/data/tables/t` `` —
  * addresses a committed table by path directly, no warehouse conf
  * needed (the Delta `delta.`/path`` convention). The warehouse root is
  * re-read from the session conf on every call, so tests and multi-root
  * deployments can repoint it without a new session (the catalog
  * instance itself is cached per session by Spark's CatalogManager).
  *
  * Table metadata (partition/key/version columns) comes from the
  * manifest's `partcol=`/`keycol=`/`vercol=` lines, recorded by
  * `CommittedTable.write(keyCol=…, versionCol=…)` or backfilled by the
  * first Scala `merge` — SQL never re-declares what the table knows.
  * `CREATE TABLE` is deliberately absent: a committed table is born from
  * data (`CommittedTable.write`), not from an empty DDL shell; `DROP
  * TABLE` works (it removes the table directory).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = "graft"
  private var initOptions: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    initOptions = options
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  /** Warehouse root, re-read from the live session conf each call (the
    * conf key is `spark.sql.catalog.<name>.warehouse`); falls back to
    * the initialize-time option. Only consulted for non-path idents. */
  private def warehouse: String = {
    val key = s"spark.sql.catalog.$catalogName.warehouse"
    spark.conf.getOption(key)
      .orElse(Option(initOptions.get("warehouse")))
      .getOrElse(throw new IllegalArgumentException(
        s"$key is not set; either set it or address tables by absolute " +
          s"path: SELECT … FROM $catalogName.`/abs/path/to/table`"))
  }

  private def isPathIdent(ident: Identifier): Boolean =
    ident.namespace.isEmpty && ident.name.startsWith("/")

  private[sql] def tablePath(ident: Identifier): String =
    if (isPathIdent(ident)) ident.name
    else (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")

  private def fs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def tableExists(ident: Identifier): Boolean = {
    val p = new Path(tablePath(ident))
    try CommittedTable.readManifestRoot(fs(p), p).isDefined
    catch { case _: Exception => false }
  }

  override def loadTable(ident: Identifier): Table = {
    val path = tablePath(ident)
    val table = new Path(path)
    val m =
      // ROOT-ONLY parse: for a sharded manifest the Table handle carries
      // just the header + shard refs; GraftFileIndex hydrates shards
      // lazily and PRUNED at plan time, so a filtered SELECT over a
      // 100k-partition table parses O(surviving shards) of metadata
      try CommittedTable.readManifestRoot(fs(table), table)
        .getOrElse(throw new NoSuchTableException(ident))
      catch {
        case _: NoSuchTableException => throw new NoSuchTableException(ident)
        case _: java.io.FileNotFoundException => throw new NoSuchTableException(ident)
      }
    // ONE schema probe per load (the root's probe= line for sharded
    // manifests); the manifest snapshot rides the Table object so
    // analysis, pruning and planning all see the same generation even
    // under a concurrent publish
    val schema = CommittedTable.schemaOf(spark, table, m)
    GraftTableV2(s"$catalogName.${ident.toString}", path, m, schema)
  }

  /** `VERSION AS OF <gen>` — SQL time travel straight onto the retained
    * generation anchors: the loaded Table carries THAT generation's
    * manifest snapshot (content AND schema — a pre-widen generation reads
    * with its narrower column list), so the substituted scan, pruning and
    * metadata counts all serve the historical snapshot with zero new
    * machinery. Aged-out generations fail with the retention window, the
    * same loud contract as the Scala `readAt`. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val gen =
      try version.toLong
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"committed-table versions are generation numbers; got '$version'") }
    val path = tablePath(ident)
    val table = new Path(path)
    val f = fs(table)
    val cur = CommittedTable.readManifest(f, table)
      .getOrElse(throw new NoSuchTableException(ident))
    val m = CommittedTable.resolveAnchor(f, table, path, gen, cur)
    val schema = CommittedTable.schemaOf(spark, table, m)
    GraftTableV2(s"$catalogName.${ident.toString}@v$gen", path, m, schema)
  }

  /** `TIMESTAMP AS OF <ts>` — resolves to the newest retained generation
    * whose anchor file was published at or before `timestampMicros`
    * (anchor mtime = publish time: the `_commit.g<n>` copy is written in
    * the same swap). */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val path = tablePath(ident)
    val table = new Path(path)
    val f = fs(table)
    val cur = CommittedTable.readManifest(f, table)
      .getOrElse(throw new NoSuchTableException(ident))
    val tsMillis = timestampMicros / 1000L
    val floor = math.max(1L, cur.gen - cur.retain + 1)
    val eligible = (floor to cur.gen).reverse.find { g =>
      val anchor = new Path(table, s"_commit.g$g")
      f.exists(anchor) && f.getFileStatus(anchor).getModificationTime <= tsMillis
    }
    val gen = eligible.getOrElse(throw new IllegalArgumentException(
      s"no retained generation of $path was published at or before " +
        s"timestamp ${java.time.Instant.ofEpochMilli(tsMillis)} (retained " +
        s"window $floor..${cur.gen})"))
    loadTable(ident, gen.toString)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(root)
    if (!f.exists(root)) throw new NoSuchNamespaceException(namespace)
    f.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        f.exists(new Path(st.getPath, "_commit")))
      .map(st => Identifier.of(namespace, st.getPath.getName))
      .toArray
  }

  /** Schema-only `CREATE TABLE (…) PARTITIONED BY (pc) [TBLPROPERTIES]`
    * — the empty-DDL-shell birth every Delta/Iceberg migration script
    * starts with: one atomic zero-row publish ([[CommittedTable.create]])
    * declaring every column as manifest metadata, roles from
    * TBLPROPERTIES (`keycol`/`vercol` enable the routed `INSERT INTO` /
    * `MERGE INTO` immediately; `statscols`/`bloomcols`/`retain`/
    * `buckets`+`bucketcols`/`check:<name>` as in CTAS). The created
    * table reads as a typed empty relation and accepts inserts as
    * ordinary generation-2 publishes. Multi-column PARTITIONED BY is
    * refused here (the composite key is DERIVED from data — use CTAS,
    * which routes through writeComposite). */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = tablePath(ident)
    val props = properties.asScala.toMap
    def propList(k: String): Seq[String] =
      props.get(k).toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val pc = partitions.toList match {
      case id :: Nil if id.name == "identity" && id.references.length == 1 &&
          id.references.head.fieldNames.length == 1 =>
        id.references.head.fieldNames.head
      case Nil => throw new UnsupportedOperationException(
        s"CREATE TABLE $ident needs PARTITIONED BY (<one column>): a " +
          "committed table is partition-scoped by contract")
      case other => throw new UnsupportedOperationException(
        s"CREATE TABLE $ident: schema-only creation supports exactly ONE " +
          "identity partition column (a composite partition key is derived " +
          s"from data — use CREATE TABLE … AS SELECT); got " +
          other.map(_.describe).mkString(", "))
    }
    val unknown = props.keySet --
      Set("keycol", "vercol", "statscols", "bloomcols", "retain",
        "buckets", "bucketcols", "deletemode", "updatemode", "clusterby",
        "clusterfiles") --
      props.keySet.filter(_.startsWith("option.")) --
      props.keySet.filter(_.startsWith("check:")) --
      // Spark itself injects reserved properties (owner, provider, …)
      props.keySet.filter(TableCatalog.PROP_OWNER == _) -
      TableCatalog.PROP_PROVIDER - TableCatalog.PROP_COMMENT -
      TableCatalog.PROP_LOCATION - TableCatalog.PROP_EXTERNAL
    if (unknown.nonEmpty) throw new IllegalArgumentException(
      s"CREATE TABLE $ident: unknown TBLPROPERTIES ${unknown.mkString(", ")}" +
        " (supported: keycol, vercol, statscols, bloomcols, retain, " +
        "buckets + bucketcols, deletemode, updatemode, clusterby + " +
        "clusterfiles, check:<name>)")
    val buckets: Option[(Int, Seq[String])] =
      (props.get("buckets"), propList("bucketcols")) match {
        case (Some(n), cs) if cs.nonEmpty => Some((n.toInt, cs))
        case (None, Nil) => None
        case _ => throw new IllegalArgumentException(
          s"CREATE TABLE $ident: buckets and bucketcols must be declared " +
            "together ('buckets'='8', 'bucketcols'='k')")
      }
    val checks: Seq[(String, String)] = props.toSeq.collect {
      case (k, v) if k.startsWith("check:") && v.trim.nonEmpty =>
        (k.substring("check:".length), v) }
    CommittedTable.create(spark, path,
      schema.fields.toSeq.map(f => (f.name, f.dataType.sql)), pc,
      retainGenerations = props.get("retain").map(_.toInt).getOrElse(2),
      statsCols = propList("statscols"),
      keyCol = props.get("keycol"),
      versionCol = props.get("vercol"),
      bloomCols = propList("bloomcols"),
      checks = checks,
      bucketBy = buckets)
    props.get("deletemode").map(_.trim).filter(_.nonEmpty).foreach(v =>
      CommittedTable.setDeleteMode(spark, path, Some(v)))
    props.get("updatemode").map(_.trim).filter(_.nonEmpty).foreach(v =>
      CommittedTable.setUpdateMode(spark, path, Some(v)))
    propList("clusterby") match {
      case cs if cs.nonEmpty => CommittedTable.setClustering(spark, path,
        Some((cs, props.get("clusterfiles").map(_.trim.toInt).getOrElse(4))))
      case _ =>
    }
    loadTable(ident)
  }

  /** `ALTER TABLE` — two METADATA-ONLY verbs, both one manifest swap
    * regardless of table size:
    *
    *  - `ADD COLUMNS (c TYPE, …)`: top-level nullable columns only (a
    *    NOT NULL or defaulted or nested or positioned add would need a
    *    data rewrite — refused loudly); reads NULL-fill until a
    *    partition's next rewrite materializes values
    *    ([[CommittedTable.addColumns]]);
    *  - `SET TBLPROPERTIES`: re-declare `keycol`/`vercol`/`statscols`/
    *    `bloomcols` roles or `retain` ([[CommittedTable.setRoles]] /
    *    `setRetention`); a changed statscols resets zone maps to
    *    conservative until `CALL graft.compact` rebuilds them.
    *
    * Any other change class fails naming what IS supported. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val spark = SparkSession.active
    val path = tablePath(ident)
    def bad(what: String): Nothing = throw new UnsupportedOperationException(
      s"ALTER TABLE ${ident}: $what; supported: ADD COLUMNS (top-level, " +
        "nullable, no DEFAULT/position), DROP COLUMN(S), RENAME COLUMN " +
        "(top-level, non-role) and SET TBLPROPERTIES " +
        "(keycol, vercol, statscols, bloomcols, retain, retainhours, " +
        "check:<name>)")
    val adds = changes.collect { case a: TableChange.AddColumn =>
      if (a.fieldNames().length != 1)
        bad(s"nested column ${a.fieldNames().mkString(".")} cannot be added")
      if (!a.isNullable)
        bad(s"column ${a.fieldNames().head} NOT NULL cannot be added to " +
          "existing rows without a rewrite")
      if (a.position() != null)
        bad(s"column ${a.fieldNames().head} with a position needs a rewrite")
      if (a.defaultValue() != null)
        bad(s"column ${a.fieldNames().head} with a DEFAULT needs a rewrite")
      (a.fieldNames().head, a.dataType().sql)
    }
    val renames = changes.collect { case r: TableChange.RenameColumn =>
      if (r.fieldNames().length != 1)
        bad(s"nested column ${r.fieldNames().mkString(".")} cannot be renamed")
      (r.fieldNames().head, r.newName())
    }
    val drops = changes.collect { case d: TableChange.DeleteColumn =>
      if (d.fieldNames().length != 1)
        bad(s"nested column ${d.fieldNames().mkString(".")} cannot be dropped")
      (d.fieldNames().head, Boolean.unbox(d.ifExists()))
    }
    val rawProps = changes.collect { case p: TableChange.SetProperty =>
      (p.property(), p.value())
    }
    // CHECK constraints keep the declared name's case: 'check:<name>'
    val checkProps = rawProps.filter(
      _._1.toLowerCase(java.util.Locale.ROOT).startsWith("check:"))
      .map { case (k, v) => (k.substring("check:".length), v) }
    val props = rawProps.filterNot(
      _._1.toLowerCase(java.util.Locale.ROOT).startsWith("check:"))
      .map { case (k, v) => (k.toLowerCase(java.util.Locale.ROOT), v) }
    val known = Set("keycol", "vercol", "statscols", "bloomcols", "retain",
      "retainhours", "deletemode", "updatemode", "clusterby", "clusterfiles")
    props.collectFirst { case (k, _) if !known.contains(k) => k }
      .foreach(k => bad(s"unknown table property '$k'"))
    changes.foreach {
      case _: TableChange.AddColumn | _: TableChange.SetProperty |
           _: TableChange.DeleteColumn | _: TableChange.RenameColumn => ()
      case other => bad(s"unsupported change ${other.getClass.getSimpleName}")
    }
    if (adds.nonEmpty) CommittedTable.addColumns(spark, path, adds)
    renames.foreach { case (o, n) =>
      CommittedTable.renameColumn(spark, path, o, n) }
    if (drops.nonEmpty) {
      val existing = loadTable(ident).asInstanceOf[GraftTableV2]
        .tableSchema.fieldNames.toSet
      val toDrop = drops.collect {
        case (c, _) if existing.contains(c) => c
        case (c, false) => c // missing without IF EXISTS: fail in dropColumns
      }
      if (toDrop.nonEmpty) CommittedTable.dropColumns(spark, path, toDrop)
    }
    val pm = props.toMap
    def list(k: String): Option[Seq[String]] =
      pm.get(k).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    if (pm.contains("keycol") || pm.contains("vercol") ||
        pm.contains("statscols") || pm.contains("bloomcols"))
      CommittedTable.setRoles(spark, path,
        keyCol = pm.get("keycol"), versionCol = pm.get("vercol"),
        statsCols = list("statscols"), bloomCols = list("bloomcols"))
    if (pm.contains("retain") || pm.contains("retainhours")) {
      val curRetain = pm.get("retain").map(_.toInt).getOrElse(
        loadTable(ident).asInstanceOf[GraftTableV2].manifest.retain)
      val hours = pm.get("retainhours").map(_.trim)
      CommittedTable.setRetention(spark, path, curRetain,
        retainHours = hours.filter(_.nonEmpty).map(_.toLong),
        clearRetainHours = hours.contains(""))
    }
    pm.get("deletemode").map(_.trim).foreach(v =>
      // empty value clears back to copy-on-write
      CommittedTable.setDeleteMode(spark, path,
        if (v.isEmpty) None else Some(v)))
    pm.get("updatemode").map(_.trim).foreach(v =>
      CommittedTable.setUpdateMode(spark, path,
        if (v.isEmpty) None else Some(v)))
    pm.get("clusterby").map(_.trim).foreach { v =>
      // empty value clears the declared clustering
      if (v.isEmpty) CommittedTable.setClustering(spark, path, None)
      else CommittedTable.setClustering(spark, path,
        Some((v.split(',').map(_.trim).filter(_.nonEmpty).toSeq,
          pm.get("clusterfiles").map(_.trim.toInt).getOrElse(4))))
    }
    if (checkProps.nonEmpty) {
      // 'check:<name>' = '<expr>' adds/replaces that named check; an
      // empty value drops it. The full resulting set revalidates against
      // existing rows (setChecks' contract).
      val p2 = new Path(path)
      val m = CommittedTable.readManifest(
        p2.getFileSystem(spark.sparkContext.hadoopConfiguration), p2)
        .getOrElse(throw new java.io.IOException(
          s"no committed table at $path"))
      val dropped = checkProps.collect { case (n, v) if v.trim.isEmpty => n }.toSet
      val added = checkProps.filter(_._2.trim.nonEmpty)
      val merged = m.checks.filterNot(c =>
        dropped.contains(c._1) || added.exists(_._1 == c._1)) ++ added
      CommittedTable.setChecks(spark, path, merged)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(tablePath(ident))
    val f = fs(p)
    val existed = try CommittedTable.readManifestRoot(f, p).isDefined
      catch { case _: Exception => false }
    if (existed) f.delete(p, true) else false
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME TABLE is not supported on committed tables")

  // ---- namespaces = directories under the warehouse root ----------------

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    val f = fs(root)
    if (!f.exists(root)) Array.empty
    else f.listStatus(root).toSeq
      .filter(st => st.isDirectory && !f.exists(new Path(st.getPath, "_commit")))
      .map(st => Array(st.getPath.getName)).toArray
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
      Array.empty
    }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
      try fs(p).exists(p) catch { case _: Exception => false }
    }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map.empty[String, String].asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    fs(p).mkdirs(p); ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  // ---- maintenance procedures (CALL graft.compact(...) etc.) ------------

  private def resolveProcPath(raw: String): String =
    if (raw.startsWith("/")) raw else s"$warehouse/$raw"

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace.isEmpty || ident.namespace.sameElements(Array("system")),
      s"unknown procedure namespace ${ident.namespace.mkString(".")}")
    GraftProcedures.all(resolveProcPath).getOrElse(ident.name.toLowerCase,
      throw new UnsupportedOperationException(
        s"unknown procedure ${ident.name}; available: " +
          GraftProcedures.all(resolveProcPath).keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.all(resolveProcPath).keys.toSeq.sorted
      .map(n => Identifier.of(namespace, n)).toArray

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = new Path((warehouse +: namespace.toSeq).mkString("/"))
    val f = fs(p)
    if (!cascade && f.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty; use CASCADE")
    f.delete(p, true)
  }
}

/** The v2 [[Table]] handle [[GraftCatalog.loadTable]] returns: schema +
  * manifest SNAPSHOT (analysis, pruning and the scan all see one
  * committed generation) + the table-role metadata SQL DML routing
  * needs. Declares no read/write capabilities on purpose —
  * [[GraftAnalysis]] substitutes every reference before Spark would ask
  * for them, so the scan is a native parquet `FileSourceScanExec`, not a
  * DSv2 row reader. */
final case class GraftTableV2(ident: String, path: String,
    manifest: CommittedTable.Manifest, tableSchema: StructType)
    extends Table {

  override def name(): String = ident

  @deprecated("inherited from Table", "")
  override def schema(): StructType = tableSchema

  override def partitioning(): Array[Transform] =
    manifest.partitionCol.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    (Map("path" -> path, "generation" -> manifest.gen.toString,
      "retain" -> manifest.retain.toString) ++
      manifest.partitionCol.map("partition_col" -> _) ++
      manifest.keyCol.map("key_col" -> _) ++
      manifest.verCol.map("version_col" -> _) ++
      (if (manifest.statsCols.nonEmpty)
        Map("stats_cols" -> manifest.statsCols.mkString(",")) else Map.empty) ++
      (if (manifest.bloomCols.nonEmpty)
        Map("bloom_cols" -> manifest.bloomCols.mkString(",")) else Map.empty) ++
      manifest.deleteMode.map("deletemode" -> _) ++
      manifest.updateMode.map("updatemode" -> _))
      .asJava

  override def capabilities(): util.Set[TableCapability] =
    util.Collections.emptySet()
}
