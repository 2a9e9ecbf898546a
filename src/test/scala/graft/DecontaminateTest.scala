package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Decontaminate}

/** Decontamination (d5) and dedup-group (d6) operators: Bloom-prefilter
  * exactness, shingle edge cases, and connected components vs a driver-side
  * union-find on random graphs. */
class DecontaminateTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bloom-prefiltered hits equal the exact join on the fixture corpus") {
    val sh = Decontaminate.wordShingles(
      Tables.table(spark, TestSpark.sf001, "documents").select($"doc_id", $"text"), 3)
    val corpus = sh.filter($"doc_id" % 50 =!= 0)
    val bench = sh.filter($"doc_id" % 50 === 0)
    val exact = Decontaminate.hits(corpus, bench)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    val bloom = Decontaminate.hitsBloom(corpus, bench)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(exact.nonEmpty, "fixture must contain contaminated docs")
    assert(bloom == exact)
    // a deliberately high-fpp filter must still be exact (false positives
    // die in the exact join)
    val coarse = Decontaminate.hitsBloom(corpus, bench, expectedItems = 100L, fpp = 0.5)
      .orderBy($"doc_id").collect().map(_.toString).toSeq
    assert(coarse == exact)
  }

  test("wordShingles: short docs yield none; shingles are consecutive-token joins") {
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "x  y"), // double space → empties dropped, only 2 tokens
      (3L, "")
    ).toDF("doc_id", "text")
    val got = Decontaminate.wordShingles(docs, 3)
      .select($"doc_id", $"shingle").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("connected components match a union-find oracle on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val inGraph = edges.flatMap(e => Seq(e._1, e._2)).toSet
      val expect = inGraph.map(v => v -> {
        // canonical label = min vertex in component
        val root = find(v.toInt)
        inGraph.filter(u => find(u.toInt) == root).min
      }).toMap
      val got = Components.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("dedupGroups: path graph converges (diameter > 1) and groups by min id") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("d1", "d2")
    val got = Components.dedupGroups(path)
      .orderBy($"group_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L), (10L, 2L)))
  }

  test("ascending 60-path (adversarial for naive min-propagation) converges fast") {
    // a naive per-round min-propagation needs 59 full-edge passes here; the
    // large-star/small-star alternation must finish within the default
    // O(log²) round budget
    val path = (1L until 60L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Components.dedupGroups(path).as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 60L)))
  }
}
