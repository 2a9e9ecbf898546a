package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness dump must FAIL the run when a query crashes
  * locally (round-9 directive 7): a swallowed exception used to surface
  * only as a missing parquet dir at the driver's DuckDB compare. */
class VerifyTest extends AnyFunSuite {
  test("Verify.dump returns crashing query names; main exits non-zero on any") {
    val out = Files.createTempDirectory("graft-verify-out").toString
    // a data dir that does not exist → the scan crashes
    val failed = Verify.dump(TestSpark.spark, "/nonexistent-sf-dir", out,
      Set("r1_pricing_summary"))
    assert(failed == List("r1_pricing_summary"))
    // same query over real data dumps clean
    val ok = Verify.dump(TestSpark.spark, TestSpark.sf0001, out,
      Set("r1_pricing_summary"))
    assert(ok.isEmpty)
    assert(new java.io.File(s"$out/r1_pricing_summary").exists())
  }
}
