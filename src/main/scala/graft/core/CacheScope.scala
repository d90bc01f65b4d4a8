package graft.core

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted tables.
  *
  * Several operators persist an intermediate that feeds two branches of the
  * returned (lazy) plan — e.g. the minhash signature table joined against
  * itself, or a vocabulary broadcast n times. The persist cannot be released
  * inside the operator (the caller has not materialized the plan yet), so a
  * long-lived session accumulates cached blocks and re-invocations log
  * "Asked to cache already cached data".
  *
  * Operators route those persists through [[persist]]; the session owner
  * calls [[release]] after the final action consuming the returned plan
  * (Verify and Bench do this per query). Releasing is safe at any point —
  * an unpersisted table recomputes instead of failing.
  */
object CacheScope {
  private val tracked = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` and track it for the next [[release]]. */
  def persist(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df.persist()
  }

  /** Track an ALREADY-persisted frame for the next [[release]] without
    * re-persisting it (no "already cached" warning) — adopts an
    * independently-managed persist (e.g. a frozen-model table) into this
    * scope's lifetime. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked += df
    df
  }

  /** Unpersist every tracked table (non-blocking) and clear the registry. */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Number of currently tracked persisted tables (test hook). */
  def trackedCount: Int = synchronized(tracked.size)
}
