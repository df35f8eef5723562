package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md's header count drifted twice against the registry
  * (r6→r7: 201 vs 204; fixed by hand in r8). This spec makes the
  * header lie loudly instead: it parses the "Round-N status: K
  * registered queries" line and asserts K equals the actual registry
  * size, so `sbt test` goes red the moment a query lands without the
  * doc following (round-8 verdict item #6). */
class CoverageDriftSpec extends AnyFunSuite {

  test("COVERAGE.md header count equals SparkEntry.queries.size") {
    val src = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    val text = try src.mkString finally src.close()
    val m = """Round-\d+ status: (\d+) registered queries""".r.findFirstMatchIn(text)
    assert(m.nonEmpty, "COVERAGE.md lost its 'Round-N status: K registered queries' header line")
    val documented = m.get.group(1).toInt
    val actual = SparkEntry.queries.size
    assert(documented == actual,
      s"COVERAGE.md header says $documented registered queries but SparkEntry.queries has " +
        s"$actual — update the header (and the round-batch list) in the same commit")
  }

  test("every registered query has an oracle or a documented omission") {
    // the driver records a weaker rows-only check for queries missing
    // from oracleSql; this repo's standing claim is ALL queries carry
    // exact oracles — make a silent omission fail here instead of
    // quietly downgrading the gate
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
