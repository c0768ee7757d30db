package graft.operators

import graft.SparkSpec
import graft.model.Envelope
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-fixture tests mirroring the reference's inventory.customers
  * scenario (FIXTURES.md §1: 4 snapshot rows + 1 insert + CRUD ops). */
class EventShapingSpec extends SparkSpec {

  private val rowType = StructType(Seq(
    StructField("id", IntegerType), StructField("first_name", StringType),
    StructField("last_name", StringType), StructField("email", StringType)))
  private val keyType = StructType(Seq(StructField("id", IntegerType)))

  private def rec(dest: String, id: Integer, op: String,
                  before: Row, after: Row, lsn: Long): Row =
    Row(dest, Row(id),
        if (op == null) null
        else Row(op, before, after, Row("postgresql", "db", "inventory", "customers", lsn, "false", 0L), 0L),
        Map("h1" -> "v1"))

  private def customer(id: Int, fn: String, ln: String, em: String): Row = Row(id, fn, ln, em)

  private lazy val fixture = {
    val schema = Envelope.recordSchema(keyType, rowType)
    val rows = Seq(
      rec("testc.inventory.customers", 1001, "r", null, customer(1001, "Sally", "Thomas", "sally.thomas@acme.com"), 1L),
      rec("testc.inventory.customers", 1002, "r", null, customer(1002, "George", "Bailey", "gbailey@foobar.com"), 2L),
      rec("testc.inventory.customers", 1003, "r", null, customer(1003, "Edward", "Walker", "ed@walker.com"), 3L),
      rec("testc.inventory.customers", 1004, "r", null, customer(1004, "Anne", "Kretchmar", "annek@noanswer.org"), 4L),
      rec("testc.inventory.customers", 1005, "c", null, customer(1005, "Jon", "Snow", "jon_snow@gameofthrones.com"), 5L),
      rec("testc.inventory.customers", 1005, "d", customer(1005, "Jon", "Snow", "jon_snow@gameofthrones.com"), null, 6L),
      rec("__debezium-heartbeat.testc", null, null, null, null, 7L),
      rec("testc.inventory.customers", 1004, null, null, null, 8L)) // tombstone
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("dropHeartbeats removes the heartbeat stream") {
    assert(EventShaping.dropHeartbeats(fixture).count() == 7)
  }

  test("tombstones filtered for sinks without support, kept otherwise") {
    assert(EventShaping.filterTombstones(fixture, sinkSupportsTombstones = false).count() == 6)
    assert(EventShaping.filterTombstones(fixture, sinkSupportsTombstones = true).count() == 8)
  }

  test("extractNewRecordState flattens snapshot+insert, drops delete") {
    val flat = EventShaping.extractNewRecordState(
      EventShaping.filterTombstones(EventShaping.dropHeartbeats(fixture), false))
    val ids = flat.select("id").collect().map(_.getInt(0)).sorted
    assert(ids.sameElements(Array(1001, 1002, 1003, 1004, 1005)))
    val sally = flat.filter(col("id") === 1001).head()
    assert(sally.getAs[String]("first_name") == "Sally")
    assert(sally.getAs[String]("email") == "sally.thomas@acme.com")
  }

  test("extractNewRecordState keepDeletes surfaces before-state with __deleted") {
    val flat = EventShaping.extractNewRecordState(
      EventShaping.filterTombstones(EventShaping.dropHeartbeats(fixture), false),
      keepDeletes = true)
    val deleted = flat.filter(col("__deleted")).collect()
    assert(deleted.length == 1 && deleted.head.getAs[Int]("id") == 1005)
  }

  test("sanitizers match reference regexes") {
    import spark.implicits._
    val df = Seq("testc.inventory.customers#v 1").toDF("d")
    val r = df.select(
      EventShaping.sanitizeFluss(col("d")).as("f"),
      EventShaping.sanitizeMilvus(col("d")).as("m")).head()
    assert(r.getString(0) == "testc_inventory_customers_v_1")
    assert(r.getString(1) == "testc_inventory_customers#v 1")
  }

  test("projectHeaders uppercases keys and applies prefix") {
    val out = fixture.limit(1)
      .select(EventShaping.projectHeaders(col("headers"), "X-DEBEZIUM-").as("h"))
      .head().getAs[Map[String, String]]("h")
    assert(out == Map("X-DEBEZIUM-H1" -> "v1"))
  }

  test("columnLevel smt gates per-row in a single projection") {
    val chain = Seq(EventShaping.Smt.columnLevel(
      "route-customers",
      Map("destination" -> concat(col("destination"), lit(".routed"))),
      predicate = col("destination").startsWith("testc.")))
    val out = EventShaping.applyChain(fixture, chain)
    assert(out.filter(col("destination").endsWith(".routed")).count() == 7)
    assert(out.filter(col("destination") === "__debezium-heartbeat.testc").count() == 1)
    // single scan: no Union in the plan (whole-frame predicated SMTs split-union)
    assert(!out.queryExecution.optimizedPlan.toString.contains("Union"))
    // negate flips the gate
    val neg = EventShaping.applyChain(fixture, Seq(EventShaping.Smt.columnLevel(
      "route-others",
      Map("destination" -> lit("other")),
      predicate = col("destination").startsWith("testc."), negate = true)))
    assert(neg.filter(col("destination") === "other").count() == 1)
  }

  test("smt chain with predicate leaves non-matching rows unchanged") {
    val chain = Seq(EventShaping.Smt(
      "route-customers",
      df => EventShaping.route(df, concat(col("destination"), lit(".routed"))),
      predicate = Some(col("destination").startsWith("testc."))))
    val out = EventShaping.applyChain(fixture, chain)
    assert(out.filter(col("destination").endsWith(".routed")).count() == 7)
    assert(out.filter(col("destination") === "__debezium-heartbeat.testc").count() == 1)
  }
}
