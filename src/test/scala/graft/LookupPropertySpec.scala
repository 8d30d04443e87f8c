package graft

import graft.streaming.Lookup
import org.scalatest.funsuite.AnyFunSuite

/** Differential property tests for the lookup-join resilience
  * combinators (streaming/Lookup.scala — reference
  * RetryableLookupFunctionDelegator.java:33, LookupCacheManager +
  * DefaultLookupCache). The example specs pin single scenarios; these
  * draws check the EXACT call-count/eviction contracts:
  *
  *  - retry: a function failing its first F calls per input must be
  *    invoked exactly min(F+1, maxAttempts) times — success returns
  *    the value on try F+1, exhaustion rethrows the last error after
  *    exactly maxAttempts tries (never one more, never one fewer);
  *  - cached: the underlying lookup's CALL SEQUENCE must equal the
  *    miss sequence of a plain-Scala access-ordered LRU replayed over
  *    the same random key stream (hits refresh recency; eviction is
  *    eldest-by-access at maxRows), with hit/miss counters summing to
  *    the access count;
  *  - composition: cached ∘ withRetry — a key that succeeded after
  *    retries is served from cache with zero further underlying calls.
  */
class LookupPropertySpec extends AnyFunSuite {

  test("differential: retry invokes the flaky function exactly " +
      "min(failures+1, maxAttempts) times across random draws") {
    (1 to 40).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val maxAttempts = 1 + rnd.nextInt(4)
      val failures = rnd.nextInt(maxAttempts + 2) // 0..maxAttempts+1
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      val f = Lookup.withRetry(Lookup.RetryPolicy(maxAttempts, 0)) {
        (i: Int) =>
          if (calls.incrementAndGet() <= failures)
            throw new RuntimeException(s"flaky $i try ${calls.get()}")
          i * 10
      }
      if (failures < maxAttempts) {
        assert(f(7) == 70, s"seed=$seed")
        assert(calls.get() == failures + 1,
          s"seed=$seed: ${calls.get()} calls for $failures failures")
      } else {
        val e = intercept[RuntimeException] { f(7) }
        assert(calls.get() == maxAttempts,
          s"seed=$seed: ${calls.get()} calls, maxAttempts=$maxAttempts")
        assert(e.getMessage.endsWith(s"try $maxAttempts"),
          s"seed=$seed: must rethrow the LAST attempt's error")
      }
    }
  }

  test("differential: cached call sequence equals the access-ordered " +
      "LRU model's miss sequence over random key streams") {
    var evictions = 0
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val name = s"lkprop_$seed"
      val maxRows = 2 + rnd.nextInt(5)
      val keys = Vector.fill(120)(rnd.nextInt(maxRows + 3))
      val calls = scala.collection.mutable.ArrayBuffer[Int]()
      val f = Lookup.cached(name, maxRows) { (i: Int) =>
        calls += i; i.toString * 2
      }
      // plain-Scala access-ordered LRU replay
      val model = scala.collection.mutable.LinkedHashMap[Int, String]()
      val wantMisses = scala.collection.mutable.ArrayBuffer[Int]()
      var wantHits = 0
      keys.foreach { k =>
        if (model.contains(k)) {
          wantHits += 1
          val v = model.remove(k).get; model.put(k, v) // refresh recency
        } else {
          wantMisses += k
          model.put(k, k.toString * 2)
          if (model.size > maxRows) { model.remove(model.head._1); evictions += 1 }
        }
        assert(f(k) == k.toString * 2, s"seed=$seed key=$k wrong value")
      }
      assert(calls.toSeq == wantMisses.toSeq,
        s"seed=$seed maxRows=$maxRows: underlying calls diverge from " +
          s"the LRU model\ngot=${calls.toSeq}\nwant=${wantMisses.toSeq}")
      assert(Lookup.missCount(name) == wantMisses.size.toLong, s"seed=$seed")
      assert(Lookup.hitCount(name) == wantHits.toLong, s"seed=$seed")
      Lookup.invalidate(name)
    }
    assert(evictions >= 100, s"only $evictions evictions exercised")
  }

  test("composition: a key that succeeded after retries is served " +
      "from cache with no further underlying calls") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val f = Lookup.cached("lkprop_comp", 8)(
      Lookup.withRetry(Lookup.RetryPolicy(3, 0)) { (i: Int) =>
        if (calls.incrementAndGet() <= 2)
          throw new RuntimeException("transient")
        i + 1
      })
    assert(f(5) == 6)
    assert(calls.get() == 3, "two transient failures + one success")
    (1 to 10).foreach(_ => assert(f(5) == 6))
    assert(calls.get() == 3, "cache hits must not re-invoke the lookup")
    Lookup.invalidate("lkprop_comp")
  }
}
