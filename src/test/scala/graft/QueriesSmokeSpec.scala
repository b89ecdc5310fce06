package graft

/** Regression net: every SparkEntry query must execute end-to-end on the
  * sf0.001 fixtures and (for deterministic queries) return rows. Catches a
  * broken query at test time instead of at the driver's verify gate.
  */
class QueriesSmokeSpec extends SparkSpec {

  // LSH/threshold queries can legitimately return 0 rows at the tiny SF
  private val mayBeEmpty = Set(
    "q08_except_users", "q11_customers_no_orders", "q22_dedup_minhash",
    "q23_dedup_simhash", "q24_dedup_jaccard", "q25_embed_neardup",
    "q47_winnow_overlap")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"$name executes at sf0.001") {
      val n = SparkEntry.queries(name)(spark, sf0001).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
}
