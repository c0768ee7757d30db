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
}
