package graft

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DocSimilarity

/** SURVEY §2.8: the spark.ml LSH estimators (fixed seeds) recover the exact
  * operators' results within documented recall — closing the checklist line
  * alongside the engine's own sketch implementations (graft.operators
  * .Sketches).
  */
class MlLshTest extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ml MinHashLSH approxSimilarityJoin recall >= 0.85 vs exact Jaccard pairs") {
    val toks = DocSimilarity.distinctTokens(spark, TestSpark.sf0001)
    val vocab = toks.select($"tok").distinct().orderBy($"tok")
      .collect().map(_.getString(0)).zipWithIndex.toMap
    val bv = spark.sparkContext.broadcast(vocab)
    val toVec = udf { (ts: Seq[String]) =>
      val v = bv.value
      Vectors.sparse(v.size, ts.map(t => (v(t), 1.0)).sortBy(_._1))
    }
    val docs = toks.groupBy($"doc_id", $"lang").agg(collect_set($"tok").as("ts"))
      .select($"doc_id", $"lang", toVec($"ts").as("features"))

    val model = new MinHashLSH().setNumHashTables(8).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
      .fit(docs)
    // Jaccard >= 0.6  <=>  Jaccard distance <= 0.4
    val cand = model.approxSimilarityJoin(docs, docs, 0.4, "jdist")
      .select(
        col("datasetA.doc_id").as("d1"), col("datasetB.doc_id").as("d2"),
        col("datasetA.lang").as("l1"), col("datasetB.lang").as("l2"))
      .filter($"d1" < $"d2" && $"l1" === $"l2")
      .select($"d1", $"d2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = DocSimilarity.nearDupPairs(spark, TestSpark.sf0001)
      .select($"d1", $"d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.count(cand.contains).toDouble / exact.size
    assert(recall >= 0.85, s"ml MinHashLSH recall $recall over ${exact.size} pairs")
  }

  test("ml BucketedRandomProjectionLSH approxNearestNeighbors vs exact kNN") {
    val toVec = udf((emb: Seq[Float]) => Vectors.dense(emb.map(_.toDouble).toArray))
    val em = Tables.table(spark, TestSpark.sf0001, "embeddings")
      .select($"vec_id", toVec($"embedding").as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setBucketLength(0.5).setNumHashTables(6).setSeed(42)
      .setInputCol("features").setOutputCol("hashes")
      .fit(em)
    val q = em.filter($"vec_id" === 0).select($"features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    val ann = model.approxNearestNeighbors(em.filter($"vec_id" =!= 0), q, 10)
      .select($"vec_id").as[Long].collect().toSet
    // embeddings are unit vectors: euclidean-NN order == cosine-NN order
    val exact = SparkEntry.queries("v1_vector_knn")(spark, TestSpark.sf0001)
      .select($"vec_id").as[Long].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.5, s"BRP-LSH recall $recall")
  }
}
