package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: a typo between the queries map and the
  * oracle map would silently weaken or fail the correctness gate. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query carries an oracle — zero rows-only checks") {
    // round 11 closed the approximate family's oracle gap: each of
    // the five formerly rows-only queries now emits exact-side values
    // plus bound/recall booleans the oracle asserts as literal true
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"rows-only queries crept back in: $unoracled")
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }
}
