package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) self-join over a string column — the fuzzy
  * string matching step of entity resolution / record dedup.
  *
  * An all-pairs `levenshtein` scan is quadratic; the scalable reformulation
  * is LENGTH-BAND BLOCKING: `lev(a,b) <= d` implies `|len(a)-len(b)| <= d`,
  * so each left string is expanded to the (2d+1) length buckets it can match
  * and the pair enumeration becomes an EQUI-join on `bucket = len(right)` —
  * a shuffle-partitionable key instead of a nested-loop inequality. Each
  * qualifying pair is enumerated exactly once (its right length hits exactly
  * one left bucket), and the exact `levenshtein` kernel (codegen'd builtin)
  * runs only on band survivors. At 10⁹ names the bands are still skewed by
  * popular lengths — the standard escalation is an added prefix/q-gram
  * blocking key on top of the band, same equi-join shape.
  */
object FuzzyMatch {

  /** Distinct unordered pairs (name1 < name2, dist) from `df`'s column
    * `nameCol` with `levenshtein <= maxDist`. Input rows need not be
    * distinct — the operator dedups the key column first. */
  def levenshteinSelfJoin(df: DataFrame, nameCol: String, maxDist: Int): DataFrame = {
    val names = df.select(col(nameCol).as("_n")).filter(col("_n").isNotNull).distinct()
    val left = names
      .withColumn("_bucket",
        explode(sequence(length(col("_n")) - maxDist, length(col("_n")) + maxDist)))
      .select(col("_n").as("name1"), col("_bucket"))
    val right = names.select(col("_n").as("name2"), length(col("_n")).as("_len"))
    left.join(right, col("_bucket") === col("_len") && col("name1") < col("name2"))
      .withColumn("dist", levenshtein(col("name1"), col("name2")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name1"), col("name2"), col("dist"))
  }
}
