package graft.engine

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memo for an expensive persisted DataFrame keyed by
  * (session, dir) — shared by the shingle relation (Dedup) and the
  * edge relation (Graph), which each get read 2-4× per query batch.
  *
  * Correctness details, identical for every user and previously
  * copy-pasted per call site:
  *   - the cached value carries its owning session, and an `eq` check
  *     rules out identity-hash collisions serving a dead session's
  *     DataFrame;
  *   - entries of stopped sessions are evicted on every access, so a
  *     long-lived JVM cycling sessions doesn't pin dead DataFrames;
  *   - racing first-callers resolve via putIfAbsent: exactly one
  *     build wins and the loser unpersists, leaving no orphan pinned
  *     in the block manager.
  */
object SessionCache {
  // Weak ref to the OWNER (the registry must not pin caches created
  // per-query — the engine's own are static, but callers may not
  // be), paired with a STRONG ref to its entry map: a GC'd owner's
  // persisted DataFrames are still pinned by Spark's CacheManager,
  // so eviction must unpersist them — dropping the dead ref alone
  // would leak the storage with no remaining unpersist path.
  private val instances = new java.util.concurrent.ConcurrentLinkedQueue[(
    java.lang.ref.WeakReference[SessionCache],
    TrieMap[(Int, String), (SparkSession, DataFrame)])]()

  private def register(c: SessionCache,
      entries: TrieMap[(Int, String), (SparkSession, DataFrame)]): Unit =
    instances.add((new java.lang.ref.WeakReference(c), entries))

  /** Cheap emptiness probe: does ANY cache hold an entry for
    * `spark`? Lets bench/serve loops skip the invalidate pass (and
    * its catalog-cache sibling) between queries that pinned nothing
    * — the common case across the registry. */
  def hasEntries(spark: SparkSession): Boolean = {
    val it = instances.iterator()
    while (it.hasNext) {
      val (_, entries) = it.next()
      if (entries.exists { case (_, (s, _)) => s eq spark }) return true
    }
    false
  }

  /** Invalidate every cache's entries for `spark` — the between-
    * queries hygiene hook for bench/serve loops. Dead owners are
    * evicted here AFTER their remaining entries are unpersisted. */
  def invalidateAll(spark: SparkSession): Unit =
    instances.removeIf { case (ref, entries) =>
      ref.get match {
        case null =>
          entries.foreach { case (_, (_, df)) => df.unpersist(blocking = false) }
          entries.clear()
          true
        case c => c.invalidate(spark); false
      }
    }

  /** The ONE between-queries hygiene sweep shared by Bench and
    * Verify (they had diverging copies — round-11 review finding):
    * SQL-level caches are cleared only when something is actually
    * pinned (paying clearCache ~190× per loop contributed to the
    * round-9 window overrun), then RDD-level blocks are swept
    * unconditionally — localCheckpoint(true) state (superstep loops,
    * q141's assignment, q187's inverted index) lives BELOW the cache
    * manager and accumulating it across a loop had the sf1 tail
    * spiking 6-16× over isolated truth (A/B'd in SCALE.md). Safe
    * between self-contained queries: each invocation builds fresh
    * checkpoints, and the SQL-cache clear drops anything memoized on
    * top first. */
  def sweepBetweenQueries(spark: SparkSession): Unit = {
    if (hasEntries(spark) || !spark.sharedState.cacheManager.isEmpty) {
      spark.catalog.clearCache()
      invalidateAll(spark)
    }
    val leaked = spark.sparkContext.getPersistentRDDs
    if (leaked.nonEmpty) leaked.values.foreach(_.unpersist(blocking = false))
  }
}

final class SessionCache(build: (SparkSession, String) => DataFrame) {

  private val cache = TrieMap.empty[(Int, String), (SparkSession, DataFrame)]

  // Publish only after `cache` is initialized: a concurrent
  // invalidateAll must never see a half-constructed instance.
  SessionCache.register(this, cache)

  /** Drop (and unpersist) every entry owned by `spark`. Needed by
    * harnesses that clear the session's cached storage between
    * queries (`spark.catalog.clearCache()` strips the persist marker
    * off the memoized DataFrame, so keeping the entry would serve an
    * un-cached relation that recomputes on every downstream use —
    * worse than rebuilding it once). */
  def invalidate(spark: SparkSession): Unit =
    cache.filterInPlace { case (_, (s, df)) =>
      if (s eq spark) { df.unpersist(blocking = false); false } else true
    }

  def get(spark: SparkSession, dir: String): DataFrame = {
    cache.filterInPlace { case (_, (s, _)) => !s.sparkContext.isStopped }
    val key = (System.identityHashCode(spark), dir)
    cache.get(key) match {
      case Some((s, df)) if s eq spark => df
      case _ =>
        val df = build(spark, dir)
        cache.putIfAbsent(key, (spark, df)) match {
          case Some((s2, winner)) if s2 eq spark =>
            df.unpersist(blocking = false); winner
          case Some(_) => // stale entry for a dead session: replace
            cache.put(key, (spark, df)); df
          case None => df
        }
    }
  }
}
