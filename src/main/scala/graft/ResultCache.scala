package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped TTL result cache — the Spark-native analog of the
  * reference's Redis search cache (`reference/src/services/audit.services
  * .ts:12,79-103`: results keyed by the normalized filter combination,
  * 30-minute TTL, invalidated when new data lands).
  *
  * Realization: the cached value is a PERSISTED DataFrame — Tungsten
  * columnar blocks distributed across executor memory/disk are the
  * cluster-wide "Redis"; re-serving a cached key re-reads those blocks
  * instead of re-running the scan/filter/sort. Expiry and explicit
  * invalidation `unpersist` the blocks (lazily — in-flight readers finish
  * against them). The registry itself is driver-side and thread-safe; at
  * 100 TB what's cached is the ≤limit-row search RESULT, never the scan,
  * so memory per entry is bounded by the query's own limit.
  */
final class ResultCache(
    ttlMs: Long = 30L * 60 * 1000,
    now: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(df: DataFrame, deadline: Long)
  private val entries = TrieMap.empty[String, Entry]

  /** Canonical cache key: order-insensitive over the filter map, exactly
    * like the reference's sorted-querystring key (`audit.services.ts:80-86`).
    */
  def keyOf(filters: Map[String, Any], limit: Int): String =
    filters.toSeq.map { case (k, v) => s"$k=$v" }.sorted.mkString("&") + s"#$limit"

  /** Serve `key` from cache when fresh; otherwise run `compute`, persist
    * the result, and cache it until the TTL passes.
    */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = {
    val t = now()
    entries.get(key).filter(_.deadline > t) match {
      case Some(e) => e.df
      case None =>
        entries.remove(key).foreach(_.df.unpersist(blocking = false))
        val df = compute.persist(StorageLevel.MEMORY_AND_DISK)
        entries.put(key, Entry(df, t + ttlMs))
        df
    }
  }

  def contains(key: String): Boolean =
    entries.get(key).exists(_.deadline > now())

  /** Drop everything — the reference's write-path invalidation
    * (`audit.services.ts:244-252` clears affected keys after ingest).
    */
  def invalidateAll(): Unit = {
    val keys = entries.keySet.toSeq
    keys.foreach(k => entries.remove(k).foreach(_.df.unpersist(blocking = false)))
  }

  def size: Int = entries.size
}
