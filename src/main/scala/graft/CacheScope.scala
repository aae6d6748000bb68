package graft

import org.apache.spark.sql.DataFrame

/** Per-driver-thread registry of persisted intermediates.
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
  *
  * The registry is thread-local: query construction happens on the
  * driver thread that calls the query function (persist() is lazy, so
  * registration is part of plan construction), and that same thread
  * drains once the result is consumed. Scoping per thread means two
  * concurrent drivers sharing one SparkSession cannot unpersist each
  * other's intermediates mid-query — a process-global queue would let
  * one driver's drain() silently force the other's self-join inputs
  * to recompute. Contract: drain() from the thread that built the
  * query; frames registered on a thread that never drains stay cached
  * until unpersisted elsewhere or evicted.
  */
object CacheScope {
  // Inheritable + concurrent (r16): queries may fan independent
  // sub-plans out to short-lived driver threads (guide §2.6 — s11's
  // rungs, s25's geometries); a pool thread created inside the query
  // inherits the SAME queue object, so frames it registers drain with
  // the parent query's drain(). The queue is concurrent because two
  // branch threads can register at once. The per-driver-thread
  // isolation contract is unchanged: inheritance only flows to
  // threads the query itself creates.
  private val live = new InheritableThreadLocal[java.util.concurrent.ConcurrentLinkedQueue[DataFrame]] {
    override def initialValue(): java.util.concurrent.ConcurrentLinkedQueue[DataFrame] =
      new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]
    // the CHILD shares the parent's queue (default childValue copies
    // the reference already; stated explicitly for the contract)
    override def childValue(parent: java.util.concurrent.ConcurrentLinkedQueue[DataFrame]):
        java.util.concurrent.ConcurrentLinkedQueue[DataFrame] = parent
  }

  /** Persist `df` and register it for this thread's next [[drain]]. */
  def cached(df: DataFrame): DataFrame = { live.get.add(df.persist()); df }

  /** Unpersist every frame this thread registered since its last drain. */
  def drain(): Unit = {
    val q = live.get
    var f = q.poll()
    while (f != null) { f.unpersist(); f = q.poll() }
  }
}
