package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator exercise: a Spark query over the driver corpus
  * (`dir` = sf directory) and, when SQL-expressible, the equivalent DuckDB
  * SQL the driver hash-compares against (correctness gate, BASELINE.md t2).
  *
  * Numeric discipline (why these queries look the way they do):
  *  - double SUMs go through DECIMAL casts (exact — FP summation order is
  *    nondeterministic in BOTH engines, so a raw double sum can differ from
  *    itself run to run, never mind across engines);
  *  - averages are exact-decimal sums cast to double then divided by a
  *    count — two deterministic IEEE ops, bit-identical everywhere;
  *  - per-row double arithmetic keeps an identical expression tree on both
  *    sides (single IEEE ops are deterministic);
  *  - computed integers are long on both sides; ties in any top-k are broken
  *    by a unique key.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object Registry {

  /** Oracle-side SQL replica of Spark's double round (SURVEY §7.4.3):
    * Spark rounds the SHORTEST DECIMAL REPR of the double (BigDecimal
    * .valueOf → setScale HALF_UP); DuckDB's round(double) rounds the exact
    * binary value, so quotients landing on .xx5 diverge. VARCHAR→DECIMAL
    * reproduces the shortest-repr semantics exactly. */
  def sroundSql(x: String, scale: Int): String =
    s"round(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(38,20)), $scale)"

  /** Engine-wide session contract (SURVEY §7.4.6): non-ANSI NULL-on-bad-cast
    * and ÷0→NULL semantics (Spark 4 flipped the default to ANSI), UTC, and
    * HALF_UP-compatible rounding. Applied to an ISOLATED child session —
    * `newSession()` shares the SparkContext, cached data, and SQL UDFs but
    * carries a PRIVATE SQLConf — memoized per caller session, so a library
    * call can never flip ANSI/timezone semantics under its host
    * application's feet (the caller's own `spark.conf` survives every
    * query; RegistrySpec pins this). Confs set during table reads (e.g.
    * nanosAsLong) land on the contract session only. */
  def contractSession(spark: SparkSession): SparkSession =
    // a contract session is its own contract — recognized by the marker
    // conf, NOT a self-referential map entry (whose strong value would pin
    // the weak key forever)
    if (spark.conf.get(contractMarker, "false") == "true") spark
    else contracts.synchronized {
      val existing = contracts.get(spark)
      if (existing != null) existing
      else {
        val c = spark.newSession()
        c.conf.set("spark.sql.ansi.enabled", "false")
        c.conf.set("spark.sql.session.timeZone", "UTC")
        // Spark 4.1's tentative single-pass resolver can't analyze glob
        // reads: it throws FileNotFoundException (logged with a full stack —
        // pure noise that pollutes Verify/Bench output) before the
        // fixed-point analyzer silently takes over. Pin the legacy analyzer;
        // it also avoids paying for dual analysis on every query.
        c.conf.set("spark.sql.analyzer.singlePassResolver.enabledTentatively", "false")
        c.conf.set("spark.sql.analyzer.singlePassResolver.enabled", "false")
        // shuffle partitioning is an operational knob the caller owns —
        // carry the caller's RUNTIME value over (newSession only inherits
        // context-level defaults, not later spark.conf.set overrides)
        c.conf.set("spark.sql.shuffle.partitions",
          spark.conf.get("spark.sql.shuffle.partitions"))
        c.conf.set(contractMarker, "true")
        contracts.put(spark, c)
        c
      }
    }

  private val contractMarker = "spark.graft.session.contract"

  // weak keys: a caller session that the host application drops must not
  // be pinned by this library-internal memo (the child holds the shared
  // SparkContext, never the caller, so entries collect with their caller)
  private val contracts =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  /** Base-table DataFrame, memoized per (contract session, dir, name).
    *
    * What is cached: the ANALYZED FRAME — i.e. the parquet footer schema
    * and the resolved plan. Never data, never results: every action
    * against the frame re-reads the parquet files (Spark plans the scan
    * at execution), and the memo dies with the session (weak-keyed, one
    * JVM). This is the metastore analogue: a real deployment types
    * `orders` once in its catalog; only this harness was re-running
    * DataSource resolution + a footer-inference job per table() call —
    * measured 40–80 ms per query at sf0.1 (a schema-inference job plus
    * driver-side `mergeSchemasInParallel`), ~187× per battery pass, with
    * zero information gained after the first call: the files are
    * immutable for the life of the run. First touch per session still
    * infers from the actual parquet inputs. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val s = contractSession(spark)
    val byTable = tables.synchronized {
      var m = tables.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()
        tables.put(s, m)
      }
      m
    }
    byTable.computeIfAbsent((dir, name), _ => table0(s, dir, name))
  }

  private val tables = new java.util.WeakHashMap[
    SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  private def table0(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as either TIMESTAMP(NANOS) parquet — which
      // Spark's TimestampType (µs) rejects outright, so it is read as raw
      // int64 nanos and truncated to µs — or plain timestamp[us] (NTZ).
      // Normalize both to session-zone TimestampType; the session zone is
      // UTC (Bench/Verify/specs), so the NTZ cast is value-identical and
      // matches the oracle's CAST(ts AS TIMESTAMP).
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        // integer `div`, not `/` — double division would lose precision on
        // ~1.7e18-ns epoch values (> 2^53)
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Full battery: relational parity + house-price semantics + LLM-pipeline
    * operators. Order = SURVEY §2 inventory order, then north star. Every
    * run is wrapped to execute under [[contractSession]], so fixture-built
    * frames (createDataFrame/toDF inside query bodies) live on the SAME
    * session as [[table]] reads and the caller's own session is never
    * reconfigured. */
  lazy val all: Seq[Q] =
    (Relational.queries ++ HousePriceQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ EventQueries.queries ++ Extended.queries ++
      SqlSurface.queries ++ ClusterQueries.queries ++ PqQueries.queries)
      .map(q => q.copy(run = (s, dir) => q.run(contractSession(s), dir)))

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
