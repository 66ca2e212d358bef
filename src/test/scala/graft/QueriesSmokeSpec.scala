package graft

/** Every registered query runs end-to-end at sf0.001 inside `sbt test` —
  * catches runtime breakage without waiting for the driver gate. Oracled
  * queries must return rows; approximate/rows-only ones just must not
  * throw (LSH recall at 50-row scale can legitimately be zero). */
class QueriesSmokeSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // q31's synthesized collision moduli exceed the 150-customer key range at
  // sf0.001, so zero pairs is the correct answer there (the oracle agrees);
  // q245's 3-core, q271's blocking pairs, and q289's community edges ride
  // the same pair graph — no pairs, no rows
  private val mayBeEmptyAtTinyScale = Set("q31_fuzzy_dups", "q245_kcore",
    "q271_sorted_neighborhood", "q289_modularity")

  for ((name, fn) <- Queries.all.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val n = fn(spark, dir).count()
      if (Oracles.all.contains(name) && !mayBeEmptyAtTinyScale(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a registered query") {
    assert(Oracles.all.keySet.subsetOf(Queries.all.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
