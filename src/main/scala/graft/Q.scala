package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query of the contract (SURVEY.md §2): a DataFrame builder
  * plus, when SQL-expressible, the DuckDB oracle text the driver runs over
  * the same parquet files.
  */
final case class DeclaredQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object DeclaredQuery {
  def apply(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): DeclaredQuery =
    DeclaredQuery(name, build, Some(oracle))
  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): DeclaredQuery =
    DeclaredQuery(name, build, None)
}

/** Shared portable-arithmetic helpers (SURVEY §2.7b determinism contract).
  *
  * Money/fixed-decimal values are summed as exact integer cents:
  * `cents(x) = CAST(FLOOR(x*100 + 0.5) AS BIGINT)` — one IEEE
  * multiply+add+floor, bit-identical in Spark and DuckDB (verified in the
  * survey [M]); `ROUND(double,2)` is NOT portable on fixed-decimal data.
  */
object Fns {
  // --- Column (Spark) side -------------------------------------------------
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5)).cast("long")
  /** Exact portable money sum: SUM(cents)/100 as DOUBLE. */
  def msum(c: Column): Column = (sum(cents(c)).cast("double") / lit(100.0))
  /** Fixed-point sum at 10^k grain (k=6 used for float folds in outputs). */
  def fsum(c: Column, k: Int): Column = {
    val g = math.pow(10, k)
    sum(floor(c * lit(g) + lit(0.5)).cast("long")).cast("double") / lit(g)
  }
  def D(c: Column): Column = c.cast("double")

  // --- SQL-text (DuckDB oracle) side --------------------------------------
  def centsS(x: String): String = s"CAST(FLOOR(($x)*100 + 0.5) AS BIGINT)"
  def msumS(x: String): String = s"CAST(SUM(${centsS(x)}) AS DOUBLE)/100.0"
  /** DuckDB SUM(BIGINT) widens to HUGEINT — always cast back for schema
    * parity with Spark's BIGINT. */
  def bsumS(x: String): String = s"CAST(SUM($x) AS BIGINT)"
  val mrevS: String = msumS("l_extendedprice*(1-l_discount)")

  /** DuckDB inline view of `events` with canonical µs time (no reliance on a
    * pre-created `e` view in the driver's DuckDB session). */
  val eViewS: String = "(SELECT *, epoch_us(ts) AS ts_us FROM events)"
  /** DuckDB inline trajectory view (SURVEY §2.7 fixture). */
  def ptsViewS(eventType: String): String =
    s"""(SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |        CAST(epoch_us(ts) - 1704067200000000 AS DOUBLE)/86400e6 AS x,
       |        value AS y
       |   FROM events WHERE event_type = '$eventType')""".stripMargin
}
