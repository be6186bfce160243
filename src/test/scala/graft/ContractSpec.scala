package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: every query must carry an oracle (a
  * missing entry silently downgrades the driver's check to rows-only)
  * and names must stay driver-parseable.
  */
class ContractSpec extends AnyFunSuite {

  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("query names are stable and sortable") {
    SparkEntry.queries.keySet.foreach { n =>
      assert(n.matches("q\\d{2}_[a-z0-9_]+"), s"bad query name: $n")
    }
    assert(SparkEntry.queries.size == 80)
  }

  test("oracle SQL contains no tab or CR characters that could break the JSON dump") {
    SparkEntry.oracleSql.foreach { case (n, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$n has tab/CR")
    }
  }
}
