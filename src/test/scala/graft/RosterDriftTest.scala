package graft

import org.scalatest.funsuite.AnyFunSuite

/** Roster-drift guard (round-6 verdict #4): the SURVEY §2 normative roster,
  * the README count lines, and the §2.8 oracle-exempt roster must all agree
  * with the single source of truth — `SparkEntry.queries` /
  * `SparkEntry.oracleSql`. The judge re-does this bookkeeping by hand every
  * round; this suite makes any drift a test failure instead.
  *
  * Pure text + map arithmetic — no SparkSession.
  */
class RosterDriftTest extends AnyFunSuite {

  private def read(name: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(name)),
      java.nio.charset.StandardCharsets.UTF_8)

  private lazy val survey = read("SURVEY.md")
  private lazy val readme = read("README.md")

  private lazy val queryKeys = SparkEntry.queries.keySet
  private lazy val oracleKeys = SparkEntry.oracleSql.keySet
  /** Short name: the roster prose names queries `t3`, `d3b`, … — the token
    * before the first underscore of the declared key. */
  private def shortName(key: String): String = key.takeWhile(_ != '_')

  test("SURVEY totals line matches SparkEntry (declared / oracle-bearing / exempt)") {
    val m = """Round-(\d+) totals \(normative roster\): (\d+)\s+declared queries = (\d+)\s+oracle-bearing \+ (\d+) oracle-exempt""".r
      .findFirstMatchIn(survey)
      .getOrElse(fail("SURVEY.md totals line not found / format drifted"))
    assert(m.group(2).toInt == queryKeys.size,
      s"SURVEY declared count ${m.group(2)} != SparkEntry.queries ${queryKeys.size}")
    assert(m.group(3).toInt == oracleKeys.size,
      s"SURVEY oracle-bearing count ${m.group(3)} != SparkEntry.oracleSql ${oracleKeys.size}")
    assert(m.group(4).toInt == (queryKeys -- oracleKeys).size,
      s"SURVEY exempt count ${m.group(4)} != actual ${(queryKeys -- oracleKeys).size}")
  }

  test("SURVEY per-prefix counts match SparkEntry.queries") {
    val byPrefixBlock = survey.substring(survey.indexOf("By prefix:"),
      survey.indexOf("Every oracle-bearing"))
    // chunks like "r1–r34 relational (34)", "j1–j5 + j3b JSON/arrays (6)"
    val parsed = """([a-z])\d+[–-][^()]*\((\d+)\)""".r
      .findAllMatchIn(byPrefixBlock)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    val actual = queryKeys.groupBy(_.head.toString).map { case (p, ks) => p -> ks.size }
    assert(parsed == actual,
      s"SURVEY by-prefix roster $parsed != SparkEntry.queries $actual")
  }

  test("README count lines match SparkEntry") {
    val declared = queryKeys.size
    val bearing = oracleKeys.size
    val exempt = declared - bearing
    assert(readme.contains(s"$declared declared queries ($bearing hash-match"),
      s"README status line drifted from $declared/$bearing")
    assert(readme.contains(
      s"($declared queries: $bearing hash-checked against a DuckDB oracle, $exempt oracle-exempt"),
      s"README summary line drifted from $declared/$bearing/$exempt")
  }

  test("SURVEY §2.8 oracle-exempt roster == queries without oracleSql, and its round label is current") {
    val start = survey.indexOf("oracle-exempt roster (round")
    assert(start >= 0, "§2.8 roster paragraph not found")
    val para = survey.substring(start, survey.indexOf("### 2.9", start))
    val listed = """`([a-z0-9/]+)`""".r.findAllMatchIn(para)
      .flatMap(_.group(1).split('/'))
      .filter(_.matches("[a-z]\\d+[a-z]?"))
      .toSet
    val actual = (queryKeys -- oracleKeys).map(shortName)
    assert(listed == actual,
      s"§2.8 roster drift: listed-only ${listed -- actual}, missing ${actual -- listed}")

    val totalsRound = """Round-(\d+) totals \(normative roster\)""".r
      .findFirstMatchIn(survey).get.group(1).toInt
    val rosterRound = """oracle-exempt roster \(round (\d+)""".r
      .findFirstMatchIn(survey).get.group(1).toInt
    assert(rosterRound == totalsRound,
      s"§2.8 header says round $rosterRound but the normative totals are round $totalsRound")
  }

  test("every oracle key is a declared query (no orphan oracle SQL)") {
    assert((oracleKeys -- queryKeys).isEmpty,
      s"oracleSql keys without a declared query: ${oracleKeys -- queryKeys}")
  }

  test("SURVEY round label tracks the latest CORRECTNESS file (round-8 directive #7)") {
    // The roster labeled round R is current iff the newest CORRECTNESS file
    // is r(R-1) (this round's queries landed, driver hasn't verified yet)
    // or rR (driver verified this roster). A label ≤ the newest file's
    // round while new queries exist would be the stale-header drift the
    // round-7 judge flagged.
    val latest = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .flatMap(f => """CORRECTNESS_r(\d+)\.json""".r
        .findFirstMatchIn(f.getName).map(_.group(1).toInt))
      .maxOption.getOrElse(fail("no CORRECTNESS_r*.json present"))
    val totalsRound = """Round-(\d+) totals \(normative roster\)""".r
      .findFirstMatchIn(survey).get.group(1).toInt
    assert(totalsRound == latest || totalsRound == latest + 1,
      s"SURVEY roster says round $totalsRound but the latest CORRECTNESS file is r$latest " +
        "— the header drifted from the verification record")
  }
}
