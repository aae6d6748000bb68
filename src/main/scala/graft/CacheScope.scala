package graft

import org.apache.spark.sql.DataFrame

/** Session-lifetime registry of persisted intermediates.
  *
  * Several operators persist an intermediate frame that the RETURNED
  * (lazy) DataFrame reads more than once — d03/d08's inverted index,
  * t09's per-doc gram counts, t10's tokenization. The query function
  * cannot unpersist before returning (the caller has not materialized
  * the result yet), so the frames are registered here and released by
  * the caller once the result is on disk / consumed:
  * `CacheScope.drain()`. [[Verify]] and [[Bench]] drain after every
  * query; a long-lived session embedding the library should do the
  * same, otherwise cached blocks accumulate until eviction pressure.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` and register it for the next [[drain]]. */
  def cached(df: DataFrame): DataFrame = { live.add(df.persist()); df }

  /** Unpersist every frame registered since the last drain. */
  def drain(): Unit = {
    var f = live.poll()
    while (f != null) { f.unpersist(); f = live.poll() }
  }
}
