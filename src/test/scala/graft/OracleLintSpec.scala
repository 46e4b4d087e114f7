package graft

import org.scalatest.funsuite.AnyFunSuite

class OracleLintSpec extends AnyFunSuite {

  test("bare SUM over an int column is rejected") {
    assert(OracleLint.violations("SELECT SUM(x) AS s FROM t").nonEmpty)
    assert(OracleLint.violations("SELECT sum(x) FROM t").nonEmpty)
    assert(OracleLint.violations(
      "SELECT SUM(CASE WHEN a = 'x' THEN 1 ELSE 0 END) AS n FROM t").nonEmpty)
  }

  test("window SUM without a cast is rejected") {
    assert(OracleLint.violations(
      "SELECT SUM(b) OVER (PARTITION BY u ORDER BY ts) AS sid FROM t").nonEmpty)
  }

  test("list_sum is linted like SUM") {
    assert(OracleLint.violations("SELECT list_sum(xs) FROM t").nonEmpty)
    assert(OracleLint.violations("SELECT CAST(list_sum(xs) AS BIGINT) FROM t").isEmpty)
  }

  test("CAST-wrapped SUM is accepted") {
    assert(OracleLint.violations("SELECT CAST(SUM(x) AS BIGINT) FROM t").isEmpty)
    assert(OracleLint.violations("SELECT CAST( SUM (x) AS DOUBLE) FROM t").isEmpty)
    assert(OracleLint.violations(
      "SELECT CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) FROM t").isEmpty)
  }

  test("SUM over a DECIMAL/DOUBLE-cast operand is accepted") {
    assert(OracleLint.violations(
      "SELECT SUM(CAST(v AS DECIMAL(18,2))) AS s FROM t").isEmpty)
    assert(OracleLint.violations(
      "SELECT SUM(CAST(p AS DECIMAL(12,2)) * CAST(1.0 - d AS DECIMAL(4,2))) FROM t").isEmpty)
    assert(OracleLint.violations("SELECT SUM(CAST(v AS DOUBLE)) FROM t").isEmpty)
  }

  test("SUM over a BIGINT-cast operand is still rejected (BIGINT sums go HUGEINT)") {
    assert(OracleLint.violations("SELECT SUM(CAST(v AS BIGINT)) FROM t").nonEmpty)
  }

  test("a nested safe cast inside an outer integer cast does not fool the lint") {
    // the cast that types the SUM is the OUTER one (BIGINT -> HUGEINT sum);
    // the inner AS DOUBLE must not make this pass
    assert(OracleLint.violations(
      "SELECT SUM(CAST(CASE WHEN f THEN CAST(x AS DOUBLE) ELSE 0 END AS BIGINT)) FROM t")
      .nonEmpty)
    // and depth-0 safe cast still passes even with a nested int cast
    assert(OracleLint.violations(
      "SELECT SUM(CAST(CAST(x AS BIGINT) AS DOUBLE)) FROM t").isEmpty)
  }

  test("identifiers merely containing 'sum' are not flagged") {
    assert(OracleLint.violations("SELECT checksum(x), sum_k, total_sum FROM t").isEmpty)
  }

  test("violation carries the offending snippet") {
    val v = OracleLint.violations(Map("q99_bad" -> "SELECT SUM(x) FROM t"))
    assert(v.exists { case (n, s) => n == "q99_bad" && s.toLowerCase.startsWith("sum(") })
  }

  test("every registered oracle passes the lint") {
    val bad = OracleLint.violations(SparkEntry.oracleSql)
    assert(bad.isEmpty, s"lint-dirty oracles: ${bad.mkString("; ")}")
  }
}
