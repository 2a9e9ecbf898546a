package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, DocSimilarity}
import graft.util.Memo

/** Session memos are bounded with unpersist-on-evict hooks: a long-lived
  * service session iterating over many data dirs must not accumulate
  * persisted frames (round-5 verdict item 3). */
class MemoEvictionTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bounded memo evicts the eldest entry and unpersists it") {
    val memo = new Memo[Int, org.apache.spark.sql.DataFrame](maxEntries = 2)(
      Memo.unpersistDf)
    def frame(i: Int) = {
      val df = Seq(i).toDF("v").persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
    val f1 = memo.getOrElseUpdate(1)(frame(1))
    val f2 = memo.getOrElseUpdate(2)(frame(2))
    assert(f1.storageLevel != StorageLevel.NONE)
    val f3 = memo.getOrElseUpdate(3)(frame(3))
    assert(memo.size == 2)
    assert(f1.storageLevel == StorageLevel.NONE, "eldest entry released on overflow")
    assert(f2.storageLevel != StorageLevel.NONE)
    assert(f3.storageLevel != StorageLevel.NONE)
    memo.clear()
    assert(f2.storageLevel == StorageLevel.NONE, "clear releases everything")
    assert(f3.storageLevel == StorageLevel.NONE)
    assert(memo.size == 0)
  }

  test("eviction is LRU: a re-read early entry survives, the stale one evicts") {
    val memo = new Memo[Int, org.apache.spark.sql.DataFrame](maxEntries = 2)(
      Memo.unpersistDf)
    def frame(i: Int) = {
      val df = Seq(i).toDF("v").persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
    val f1 = memo.getOrElseUpdate(1)(frame(1))
    val f2 = memo.getOrElseUpdate(2)(frame(2))
    memo.getOrElseUpdate(1)(fail("key 1 must be a hit")) // touch 1: now 2 is LRU
    memo.getOrElseUpdate(3)(frame(3))
    assert(memo.size == 2)
    assert(f1.storageLevel != StorageLevel.NONE,
      "recently-used early entry must survive (FIFO would evict it)")
    assert(f2.storageLevel == StorageLevel.NONE, "least-recently-used entry evicts")
    memo.clear()
  }

  test("racing builders on one cold key: one canonical value wins, loser NOT released") {
    val released = new java.util.concurrent.atomic.AtomicInteger(0)
    val memo = new Memo[Int, Int](maxEntries = 4)(_ => released.incrementAndGet())
    val gate = new java.util.concurrent.CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        results.add(memo.getOrElseUpdate(42) {
          gate.countDown()
          gate.await() // both threads are mid-build simultaneously
          i * 100
        })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(memo.size == 1)
    val got = results.toArray(Array.empty[Integer]).map(_.toInt).toSet
    assert(got.size == 1, s"both callers must see one canonical value, got $got")
    // the loser's persisted plans alias the winner's CacheManager entries
    // (plan-keyed), so releasing it would de-cache the canonical value
    assert(released.get == 0, "the losing build must NOT be released (cache aliasing)")
  }

  test("two data dirs: the first dir's persisted pair set is released by resetCaches") {
    val first = DocSimilarity.nearDupPairs(spark, TestSpark.sf0001)
    first.count()
    assert(first.storageLevel != StorageLevel.NONE)
    val second = DocSimilarity.nearDupPairs(spark, TestSpark.sf001)
    second.count()
    DocSimilarity.resetCaches()
    assert(first.storageLevel == StorageLevel.NONE,
      "first dir's frame must be unpersisted after clear")
    assert(second.storageLevel == StorageLevel.NONE)
    // warm call after clear rebuilds (and re-persists) without error
    val again = DocSimilarity.nearDupPairs(spark, TestSpark.sf0001)
    assert(again.count() == first.count())
    DocSimilarity.resetCaches()
  }

  test("localCheckpoint-backed memo releases its RDD storage on clear") {
    // pull the checkpoint's backing RDD out of the LogicalRDD leaf (the
    // same reflection the release hook uses) and watch ITS storage level —
    // immune to other suites' persist/unpersist traffic
    def checkpointRdds(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().collect {
        case l if l.getClass.getSimpleName == "LogicalRDD" =>
          l.getClass.getMethod("rdd").invoke(l)
            .asInstanceOf[org.apache.spark.rdd.RDD[_]]
      }
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val labels = Components.connectedComponentsCached(edges, "memo-eviction-test")
    labels.count()
    val rdds = checkpointRdds(labels)
    assert(rdds.nonEmpty, "localCheckpoint should back the frame with an RDD leaf")
    assert(rdds.forall(_.getStorageLevel != StorageLevel.NONE))
    Components.clearMemo()
    assert(rdds.forall(_.getStorageLevel == StorageLevel.NONE),
      "checkpoint RDD storage must be released by clearMemo")
  }
}
