package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

/** Lookup-join resilience: retry + executor-shared LRU cache
  * (SURVEY.md §2.3 lookup join; reference
  * OP/join/lookup/RetryableLookupFunctionDelegator.java:33 for the
  * fixed-delay retry delegate and flink-table-runtime
  * .../functions/table/lookup/LookupCacheManager.java +
  * DefaultLookupCache for the per-process shared cache keyed by a
  * registered cache identifier).
  *
  * Both combinators wrap the user's `I => O` lookup function and
  * compose with [[Sinks.asyncLookup]] (or any mapPartitions call):
  *
  * {{{
  * val f = Lookup.cached("dim_user", 10000)(
  *           Lookup.withRetry(Lookup.RetryPolicy(3, 50))(callService))
  * Sinks.asyncLookup(stream, 32)(f)
  * }}}
  *
  * Scale posture: the cache is ONE instance per executor JVM per name
  * (ConcurrentHashMap registry — the same process-level sharing
  * LookupCacheManager does), so 32 tasks on an executor share hot dim
  * keys instead of each holding a copy; bounded by `maxRows` LRU.
  */
object Lookup {

  /** Fixed-delay retry, `maxAttempts` total tries
    * (RetryableLookupFunctionDelegator + FIXED_DELAY strategy). */
  case class RetryPolicy(maxAttempts: Int, delayMs: Long) {
    require(maxAttempts >= 1 && delayMs >= 0)
  }

  def withRetry[I, O](policy: RetryPolicy)(lookup: I => O): I => O = { i =>
    var attempt = 1
    var out: Option[O] = None
    while (out.isEmpty) {
      try out = Some(lookup(i))
      catch {
        // Task cancellation must not be swallowed into retries: restore
        // the interrupt flag and let the executor shut the task down.
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); throw e
        // NonFatal only — retrying OutOfMemoryError/LinkageError etc.
        // would just delay the JVM's death by maxAttempts*delayMs.
        case scala.util.control.NonFatal(e) =>
          if (attempt >= policy.maxAttempts) throw e
          attempt += 1
          if (policy.delayMs > 0) Thread.sleep(policy.delayMs)
      }
    }
    out.get
  }

  // access-ordered LinkedHashMap = LRU; one per cache name per JVM
  private final class Lru(maxRows: Int)
      extends java.util.LinkedHashMap[Any, Any](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Any, Any]): Boolean =
      size() > maxRows
  }

  private val caches = new ConcurrentHashMap[String, Lru]()
  private val hitCounters = new ConcurrentHashMap[String, LongAdder]()
  private val missCounters = new ConcurrentHashMap[String, LongAdder]()

  private def adder(m: ConcurrentHashMap[String, LongAdder], name: String) =
    m.computeIfAbsent(name, _ => new LongAdder)

  /** Executor-shared LRU cache in front of a lookup function. `name`
    * identifies the cache instance JVM-wide (LookupCacheManager's
    * cache identifier); `maxRows` bounds it. Null/None results are
    * cached too (negative caching, like Flink's cacheMissingKey). */
  def cached[I, O](name: String, maxRows: Int)(lookup: I => O): I => O = {
    require(maxRows >= 1)
    (i: I) => {
      val c = caches.computeIfAbsent(name, _ => new Lru(maxRows))
      val fromCache = c.synchronized {
        if (c.containsKey(i)) Some(c.get(i)) else None
      }
      fromCache match {
        case Some(v) =>
          adder(hitCounters, name).increment()
          v.asInstanceOf[O]
        case None =>
          adder(missCounters, name).increment()
          val v = lookup(i) // compute outside the lock: slow I/O
          c.synchronized { c.put(i, v) }
          v
      }
    }
  }

  /** Cache observability (test + ops hook; Flink exposes the same via
    * cache metrics groups). */
  def hitCount(name: String): Long = adder(hitCounters, name).sum()
  def missCount(name: String): Long = adder(missCounters, name).sum()
  def invalidate(name: String): Unit = {
    caches.remove(name)
    hitCounters.remove(name)
    missCounters.remove(name)
    ()
  }
}
