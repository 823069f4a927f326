package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Scoped ownership of persisted DataFrames.
  *
  * Library operators persist intermediates that several consumers inside one
  * returned plan share (tokenizer output, per-doc set tables, id-assignment
  * scaffolding). The CALLER owns those caches' lifetime: it passes a registry,
  * the operator registers every persist it creates, and the caller releases
  * once the consuming plan is materialized. This replaces the round-4
  * JVM-global queue (Ids.releaseCaches), which let one caller unpersist
  * scaffolding a CONCURRENT caller's in-flight id assignment still needed —
  * the persisted copy pins the sampled range partitioning that makes the
  * two-pass dense stamp deterministic (see [[Ids]]).
  *
  * [[CacheRegistry.unmanaged]] is the default sink for one-shot sessions
  * (a single query, then the session ends): persists are NOT tracked and
  * live until the session dies — the documented round-3/4 behavior. Long
  * sessions (the 37-query bench, Verify) pass a real registry and release
  * per query, so caches from query k never compete with query k+1's memory.
  */
final class CacheRegistry private (track: Boolean) {
  def this() = this(true)

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Track an already-persisted frame for later release. */
  def add(df: DataFrame): DataFrame = {
    if (track) live.add(df)
    df
  }

  /** persist(MEMORY_AND_DISK) + track. */
  def persist(df: DataFrame): DataFrame =
    add(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Unpersist (non-blocking) every tracked cache. Entries whose session has
    * already stopped are discarded — their blocks died with the session's
    * BlockManager, and unpersist on a stopped context NPEs. */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) {
      if (!d.sparkSession.sparkContext.isStopped) {
        try d.unpersist(blocking = false)
        catch { case _: Exception => () } // racing a concurrent session stop
      }
      d = live.poll()
    }
  }
}

object CacheRegistry {

  /** Non-tracking sink: persists stay for the session's lifetime (the
    * one-shot-session default). Shared and stateless, so safe as a default
    * parameter everywhere. */
  val unmanaged: CacheRegistry = new CacheRegistry(false)
}
