package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bounded (session, key) → persisted-DataFrame cache — the
  * shared-subplan pattern several queries need (a frame feeding 2+
  * join sides that Spark would otherwise recompute per side, exchange
  * reuse notwithstanding). Lifetime rules (round-5 advice:
  * `identityHashCode` keys can collide after GC and pinned blocks
  * outlived every query):
  *  - keyed by the session's STABLE uuid (identity-hash fallback only
  *    for non-classic session impls) — a new session never sees
  *    another session's frame;
  *  - every access sweeps entries whose SparkContext has stopped and
  *    LRU-evicts (with unpersist) beyond `maxEntries`, so long-lived
  *    sessions touching many datasets stay bounded;
  *  - [[release]] drops a session's entries eagerly (tests, notebook
  *    teardown, or after replacing the dataset at a directory — the
  *    cache cannot see in-place dataset swaps).
  */
private[graft] final class KeyedFrameCache(maxEntries: Int) {
  private val tick = new java.util.concurrent.atomic.AtomicLong
  private final class Entry(val spark: SparkSession, val df: DataFrame) {
    @volatile var lastUsed: Long = tick.incrementAndGet()
  }
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Entry]

  def keys: Set[(String, String)] = cache.keySet.toSet

  /** Unpersist and drop every frame cached for `spark`. */
  def release(spark: SparkSession): Unit = {
    val k = KeyedFrameCache.sessionKey(spark)
    cache.keys.filter(_._1 == k).foreach { key =>
      cache.remove(key).foreach(e =>
        try e.df.unpersist(blocking = true)
        catch { case scala.util.control.NonFatal(_) => () })
    }
  }

  /** The cached persisted frame for (session, key), building it on
    * first access; housekeeping (dead sessions out, LRU bound kept)
    * runs before every lookup.
    */
  def get(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    cache.foreach { case (k, e) =>
      if (e.spark.sparkContext.isStopped) cache.remove(k)
    }
    while (cache.size >= maxEntries &&
        !cache.contains((KeyedFrameCache.sessionKey(spark), key))) {
      val oldest = cache.toSeq.minBy(_._2.lastUsed)._1
      cache.remove(oldest).foreach(e =>
        try e.df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () })
    }
    val k = (KeyedFrameCache.sessionKey(spark), key)
    // putIfAbsent, not getOrElseUpdate: the latter's value thunk runs
    // persist() BEFORE the atomic insert, so two racing first accesses
    // both persisted and the loser's storage leaked until session end
    val entry = cache.get(k) match {
      case Some(e) => e
      case None =>
        val fresh = new Entry(spark, build.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        cache.putIfAbsent(k, fresh) match {
          case None => fresh
          case Some(winner) => // lost the race: release the loser
            try fresh.df.unpersist(blocking = false)
            catch { case scala.util.control.NonFatal(_) => () }
            winner
        }
    }
    entry.lastUsed = tick.incrementAndGet()
    entry.df
  }
}

private[graft] object KeyedFrameCache {
  /** One persisted frame per (session, dataset): keyed by the
    * session's STABLE uuid so `identityHashCode` reuse after GC can
    * never serve another session's frame.
    */
  def sessionKey(spark: SparkSession): String =
    org.apache.spark.sql.graftbridge.ColumnBridge.sessionUuid(spark)
      .getOrElse("idhash-" + System.identityHashCode(spark))
}
