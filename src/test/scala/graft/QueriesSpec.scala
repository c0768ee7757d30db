package graft

/** Smoke: every declared query runs and yields rows at sf0.001, and
  * every oracle key points at a declared query. */
class QueriesSpec extends SparkSpec {

  test("every query returns rows at sf0.001") {
    Queries.all.foreach { q =>
      val n = q.run(spark, sfSmoke).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("oracle keys are a subset of query names") {
    val names = Queries.all.map(_.name).toSet
    assert(Queries.oracles.keySet.subsetOf(names))
  }

  test("query names are unique") {
    val names = Queries.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("cdc40: refreshed-index search serves fresh docs, never deleted ones") {
    // the composition's three invariants, independent of the DuckDB
    // replay: (a) a doc this epoch deletes (doc_id % 9 == 0) never
    // surfaces for ANY probe — a stale index row would leak it;
    // (b) probe 1 (' revised edition') only exists in POST-refresh
    // text, so every hit is an updated survivor and there is at least
    // one — a missed junction gram would return nothing; (c) probe 3
    // is drawn from doc 18, which the epoch deletes — 18 itself gone.
    val out = Queries.byName("cdc40_refresh_search_pipeline")(spark, sfSmoke).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(1) % 9 != 0), "a deleted doc surfaced")
    val byQ = out.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val p1 = byQ.getOrElse(1L, Set.empty)
    assert(p1.nonEmpty && p1.forall(id => id % 6 == 0 && id % 9 != 0),
      s"probe 1 must hit exactly updated survivors, got $p1")
    assert(!byQ.getOrElse(3L, Set.empty).contains(18L), "deleted probe-source doc leaked")
  }
}
