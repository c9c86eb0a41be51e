package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: a typo between the queries map and the
  * oracle map would silently weaken or fail the correctness gate. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("queries without oracles are the documented approximate ones") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled === Set(
      "approx_distinct_users", "knn_lsh_bucketed", "knn_ivf", "knn_ivf_kmeans",
      "approx_quantiles"),
      s"unexpected rows-only queries: $unoracled")
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }
}
