package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle control for DataFrames persisted INSIDE composed operators
  * (LSH candidate generation materializes its signature table so the
  * self-join's two sides share one computation — without caller-visible
  * cleanup those persists accumulate for the session's lifetime, which a
  * long-lived deployment, streaming curation, or a repeated-call service
  * cannot afford). Spark has no scoped unpersist, so operators accept a
  * scope and the caller releases it once its action has consumed the
  * result:
  *
  * {{{
  * val scope = new CacheScope
  * val pairs = Dedup.minhashCandidates(docs, "text", "doc_id", scope = scope)
  * pairs.write.parquet(out)   // action runs with the cache live
  * scope.unpersistAll()       // then release executor memory
  * }}}
  *
  * The default `CacheScope.unmanaged` keeps Spark's native semantics
  * (cached until the session ends) — fine for one-shot jobs whose JVM exits
  * anyway, and exactly the previous behavior of these operators.
  */
final class CacheScope private (track: Boolean) {
  def this() = this(track = true)

  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  private[operators] def persist(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    if (track) synchronized { tracked += p }
    p
  }

  /** Release every DataFrame persisted under this scope (idempotent). */
  def unpersistAll(blocking: Boolean = false): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking))
    tracked.clear()
  }
}

object CacheScope {
  /** Never released — session-lifetime caching, Spark's own default. */
  val unmanaged: CacheScope = new CacheScope(track = false)
}
