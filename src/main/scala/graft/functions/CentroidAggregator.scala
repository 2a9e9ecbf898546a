package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-UDAF surface demo (SURVEY §2.8): per-label centroid of the first 8
  * embedding components, accumulated in exact fixed-point integers
  * (floor(x·1e6 + 0.5)) so the final rounded centroid is bit-identical to
  * the declarative j3 query regardless of merge order.
  */
object CentroidAggregator {

  final case class Buf(sums: Array[Long], n: Long)
  final case class Out(sums: Seq[Long], n: Long)

  val DIMS = 8

  object agg extends Aggregator[(Int, Seq[Float]), Buf, Out] {
    override def zero: Buf = Buf(new Array[Long](DIMS), 0L)

    override def reduce(b: Buf, in: (Int, Seq[Float])): Buf = {
      val emb = in._2
      var i = 0
      while (i < DIMS && i < emb.length) {
        b.sums(i) += math.floor(emb(i).toDouble * 1e6 + 0.5).toLong
        i += 1
      }
      Buf(b.sums, b.n + 1)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      var i = 0
      while (i < DIMS) { a.sums(i) += b.sums(i); i += 1 }
      Buf(a.sums, a.n + b.n)
    }

    override def finish(b: Buf): Out = Out(b.sums.toSeq, b.n)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }
}
