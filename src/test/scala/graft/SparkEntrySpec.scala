package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory guard over the driver contract: every registered query is
  * oracle-gated unless it carries a documented rows-only exemption, and
  * every oracle names a real query. An accidentally-omitted oracle
  * would silently downgrade a query to the weaker rows-only check —
  * this spec makes that a test failure instead of a verdict finding. */
class SparkEntrySpec extends AnyFunSuite {

  /** The ONLY queries allowed to ship without a SQL oracle, each with
    * its reason on record. Growing this set is a deliberate act.
    * EMPTY since r14: q_pca_project — the last rows-only entry — gained
    * a hash gate via the basis-as-literal fixture device (the
    * driver-side eigenbasis as integer literals, the projection an
    * all-long fold both engines replay bit-exactly). */
  private val rowsOnlyExempt = Map.empty[String, String]

  test("every query has an oracle or a documented rows-only exemption") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val undocumented = missing -- rowsOnlyExempt.keySet
    assert(undocumented.isEmpty,
      s"queries without oracle or exemption: ${undocumented.toSeq.sorted}")
    // exemptions must not go stale: each names a live rows-only query
    val stale = rowsOnlyExempt.keySet -- missing
    assert(stale.isEmpty, s"stale exemptions (query gained an oracle or " +
      s"was removed): ${stale.toSeq.sorted}")
  }

  test("no orphan oracles; names well-formed") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without a query: ${orphans.toSeq.sorted}")
    // driver artifacts key on these names: keep them path/JSON-safe
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z][a-z0-9_]*"))
    assert(bad.isEmpty, s"non-kebab query names: ${bad.toSeq.sorted}")
  }
}
