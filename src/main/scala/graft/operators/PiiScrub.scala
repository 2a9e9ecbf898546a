package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pattern-based PII scrubbing — the redaction pass a training-data
  * pipeline runs before anything else sees the text. Pure per-row map work
  * (regexp_count / regexp_replace are codegen'd builtins): no shuffle, no
  * UDF, embarrassingly parallel at any scale.
  *
  * The pattern registry sticks to the regex subset with identical semantics
  * in Java (Spark) and RE2 (DuckDB oracle): character classes, bounded
  * repetition, word boundaries — no backreferences or lookaround.
  */
object PiiScrub {

  /** Pattern registry: name → (regex, replacement tag). */
  val patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("number", "[0-9]+", "<NUM>"))

  /** `textCol` scrubbed through every pattern, in registry order. */
  def scrubbed(textCol: Column): Column =
    patterns.foldLeft(textCol) { case (c, (_, re, tag)) => regexp_replace(c, re, tag) }

  /** Match count of one named pattern. */
  def matchCount(textCol: Column, name: String): Column = {
    val re = patterns.find(_._1 == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown PII pattern: $name"))._2
    regexp_count(textCol, lit(re)).cast("long")
  }

  /** Redaction audit over a text column: per `groupCol` group — row count,
    * per-pattern match totals, and the number of distinct masked forms
    * (how much shape survives redaction). */
  def audit(df: DataFrame, textCol: String, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(matchCount(col(textCol), "email")).as("n_email"),
        sum(matchCount(col(textCol), "ipv4")).as("n_ip"),
        sum(matchCount(col(textCol), "number")).as("n_num"),
        countDistinct(scrubbed(col(textCol))).as("n_masked_forms"))
      .orderBy(col(groupCol))
}
