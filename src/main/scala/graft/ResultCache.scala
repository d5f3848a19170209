package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped TTL result cache — the Spark-native analog of the
  * reference's Redis search cache: search results are cached under a
  * filter-derived key (`reference/src/services/audit.services.ts:94,169`)
  * with a 300-second expiry (`CACHE_EXPIRY`, `audit.services.ts:12`);
  * expiry is the ONLY invalidation the reference has (TTL-based `setEx`,
  * `:83` — nothing clears keys on ingest).
  *
  * Realization: the cached value is a PERSISTED DataFrame — Tungsten
  * columnar blocks distributed across executor memory/disk are the
  * cluster-wide "Redis"; re-serving a cached key re-reads those blocks
  * instead of re-running the scan/filter/sort. Expiry and explicit
  * invalidation `unpersist` the blocks (lazily — in-flight readers finish
  * against them). The registry itself is driver-side and thread-safe; at
  * 100 TB what's cached is the ≤limit-row search RESULT, never the scan,
  * so memory per entry is bounded by the query's own limit.
  *
  * Two deliberate improvements over the reference (not citations):
  *  - the key is order-insensitive and collision-free ([[keyOf]]); the
  *    reference keys on unsorted `JSON.stringify(filters)` (`:94`), so the
  *    same filters in a different map order miss its cache;
  *  - [[invalidateAll]] exists for the write path, so ingest can drop
  *    stale results instead of serving them until the TTL runs out.
  */
final class ResultCache(
    ttlMs: Long = 300L * 1000, // the reference's CACHE_EXPIRY (:12)
    now: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(df: DataFrame, deadline: Long)
  private val entries = TrieMap.empty[String, Entry]
  // in-flight miss computations — the single-flight registry: concurrent
  // misses of the SAME key share one compute; misses of different keys
  // never serialize behind each other (the r16 whole-call lock did both)
  private val inflight =
    TrieMap.empty[String, java.util.concurrent.CompletableFuture[DataFrame]]
  // bumped by every invalidation: a compute that STRADDLES a bump may
  // predate the write that invalidated, so its result is served to its
  // callers but never cached (see [[getOrCompute]])
  private val generation = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Canonical cache key: order-insensitive over the filter map, with
    * key/value escaping so values containing the join characters
    * (`&`, `=`, `#`, `%`) cannot collide two distinct filter maps into
    * one key. (The reference's unsorted-JSON key has both defects.)
    */
  def keyOf(filters: Map[String, Any], limit: Int): String = {
    def esc(s: String): String = s
      .replace("%", "%25").replace("&", "%26")
      .replace("=", "%3D").replace("#", "%23")
    filters.toSeq.map { case (k, v) => esc(k) + "=" + esc(String.valueOf(v)) }
      .sorted.mkString("&") + s"#$limit"
  }

  /** Remove every expired entry and release its blocks — Redis expires
    * keys by itself; a driver-side registry has to sweep, or expired
    * DataFrames stay persisted until the same key happens to be asked for
    * again.
    */
  private def sweep(t: Long): Unit =
    entries.foreach { case (k, e) =>
      if (e.deadline <= t && entries.remove(k, e)) e.df.unpersist(blocking = false)
    }

  /** Serve `key` from cache when fresh; otherwise run `compute`, persist
    * the result, and cache it until the TTL passes.
    *
    * The miss path is SINGLE-FLIGHT PER KEY, not per cache: concurrent
    * identical misses share one compute (neither pays the walk twice),
    * while a slow miss — the product walk behind [[graft.streaming
    * .PipelineIngest.searchCurated]] runs one bounded job per walked
    * partition — never blocks OTHER keys' lookups, and never blocks the
    * write path's [[invalidateSuffix]] hook (r16's whole-call lock could
    * stall the ingest loop's trigger behind a slow cached search). The
    * cache lock is held only for the registry bookkeeping around the
    * compute, which keeps the miss path atomic: two misses can't leak an
    * overwritten entry's blocks, and a sweep can't unpersist a fresh
    * entry mid-insert.
    *
    * An invalidation that arrives WHILE a compute is in flight bumps the
    * generation; the straddling compute's result is served to its
    * callers (they asked before the write, a pre-write answer is what
    * they get — the reference's TTL cache serves far staler) but is NOT
    * cached, so no post-invalidation reader can be handed a pre-write
    * result from the cache.
    */
  def getOrCompute(key: String)(compute: => DataFrame): DataFrame = {
    while (true) {
      synchronized {
        val t = now()
        sweep(t)
        entries.get(key).filter(_.deadline > t) match {
          case Some(e) => return e.df
          case None =>
            entries.remove(key).foreach(_.df.unpersist(blocking = false))
        }
      }
      val mine = new java.util.concurrent.CompletableFuture[DataFrame]()
      inflight.putIfAbsent(key, mine) match {
        case Some(other) =>
          // someone else is computing this key: share its result, off
          // every lock. If ITS compute failed, loop and try ourselves.
          try return other.join()
          catch { case _: java.util.concurrent.CompletionException => () }
        case None =>
          try {
            val gen = generation.get()
            val df = compute
            synchronized {
              // a concurrent owner may have cached this key in the gap
              // between our fresh-check and our putIfAbsent (it finished
              // and removed its inflight marker before ours went in):
              // serve ITS fresh entry and drop our never-persisted
              // result — overwriting it would strand its persisted
              // blocks outside the registry for the session
              entries.get(key).filter(_.deadline > now()) match {
                case Some(e) =>
                  mine.complete(e.df)
                  return e.df
                case None => ()
              }
              if (generation.get() == gen) {
                val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
                entries.put(key, Entry(cached, now() + ttlMs))
                mine.complete(cached)
                return cached
              }
            }
            // an invalidation raced the compute — serve, don't cache
            mine.complete(df)
            return df
          } catch {
            case e: Throwable => mine.completeExceptionally(e); throw e
          } finally { inflight.remove(key, mine); () }
      }
    }
    sys.error("unreachable")
  }

  def contains(key: String): Boolean = {
    sweep(now())
    entries.contains(key)
  }

  /** Drop everything. DELIBERATE DEVIATION: the reference has no write-path
    * invalidation at all (its cache entries only age out via `setEx`,
    * `audit.services.ts:83`) — so a search served just after ingest can be
    * up to 5 minutes stale there. [[graft.streaming.IngestJob.run]] accepts
    * a cache to invalidate after each committed batch.
    */
  def invalidateAll(): Unit = synchronized {
    generation.incrementAndGet()
    val keys = entries.keySet.toSeq
    keys.foreach(k => entries.remove(k).foreach(_.df.unpersist(blocking = false)))
  }

  /** Drop only the entries whose key ends with `suffix` — the scoped
    * form for caches serving SEVERAL product streams (the
    * [[graft.streaming.PipelineIngest.searchCurated]] key embeds
    * `"@<outDir>"` precisely so one stream's commit doesn't evict the
    * other streams' still-valid results).
    */
  def invalidateSuffix(suffix: String): Unit = synchronized {
    // the generation bump is GLOBAL even though the removal is scoped: a
    // straddling compute for another stream merely skips one caching
    // opportunity (recomputed on the next ask) — cheap, where a
    // per-suffix generation would re-create the key-parsing coupling
    // this cache deliberately avoids
    generation.incrementAndGet()
    entries.keySet.toSeq.filter(_.endsWith(suffix))
      .foreach(k => entries.remove(k).foreach(_.df.unpersist(blocking = false)))
  }

  def size: Int = entries.size
}

/** Driver-side TTL cache of individual payload blobs — the analog of the
  * reference's per-blob Redis entries: `getS3Data` caches each fetched
  * payload under `s3:\${key}` (`audit.services.ts:181`, hit path
  * `:184-188`, fetch-then-cache `:191-199`) with the same 300 s `setEx`
  * expiry as the search cache (`:83`, `:12`).
  *
  * Blob payloads are WRITE-ONCE per key (every transaction mints fresh
  * request/response s3 keys — `processQueue.ts` never overwrites), so
  * TTL-only expiry is the reference-faithful baseline — and like the
  * reference, a blob fetched inside the TTL window may be up to 300 s
  * stale if the store is rewritten under it. [[graft.streaming
  * .IngestJob.run]]'s `invalidateBlobs` hook closes that window for the
  * write path (cleared per committed batch, same as the search cache).
  * `maxEntries` bounds driver memory by evicting the earliest-expiring
  * entries first. Entry count and size are bounded by 2·limit per search
  * (the route caps `limit`), so this stays KB–MB scale on the driver —
  * the blobs themselves, not the blob TABLE, are cached.
  */
final class BlobCache(
    ttlMs: Long = 300L * 1000, // the reference's CACHE_EXPIRY (audit.services.ts:12)
    maxEntries: Int = 10000,
    now: () => Long = () => System.currentTimeMillis()) {

  private final case class Entry(payload: String, deadline: Long)
  private val entries = TrieMap.empty[String, Entry]

  /** Fresh payload for `key`, sweeping the entry if expired. */
  def get(key: String): Option[String] = {
    val t = now()
    entries.get(key) match {
      case Some(e) if e.deadline > t => Some(e.payload)
      case Some(e) => entries.remove(key, e); None
      case None => None
    }
  }

  def put(key: String, payload: String): Unit = {
    entries.put(key, Entry(payload, now() + ttlMs))
    // amortized eviction: trim back to maxEntries only once the overflow
    // reaches 10% slack — at the cap, the old per-put trim materialized
    // and sorted all 10k entries for EVERY blob insert on the search
    // path. Synchronized so concurrent overflows don't each evict.
    if (entries.size > maxEntries + maxEntries / 10) synchronized {
      val over = entries.size - maxEntries
      if (over > 0)
        entries.toSeq.sortBy(_._2.deadline).take(over)
          .foreach { case (k, e) => entries.remove(k, e) }
    }
  }

  def invalidateAll(): Unit = entries.clear()

  def size: Int = entries.size
}
