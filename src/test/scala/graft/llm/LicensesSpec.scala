package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins license detection: full-copy containment, argmax selection,
  * the minPct floor, edit robustness, and the no-license path. */
class LicensesSpec extends SparkSpec {
  import spark.implicits._

  private val mit =
    "permission is hereby granted free of charge to any person obtaining a copy of this software and associated documentation files"
  private val gpl =
    "this program is free software you can redistribute it and or modify it under the terms of the general public license as published"
  private val refs = Seq("mit" -> mit, "gpl" -> gpl)

  private def detect(docs: Seq[(Long, String)], minPct: Int = 25) =
    Licenses.detect(docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        refs, k = 16, w = 8, minPct = minPct)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(4))).toMap

  test("a doc embedding a full license detects it at 100% containment") {
    val out = detect(Seq(
      1L -> s"some project readme body text here $mit trailing words",
      2L -> "plain body with no license boilerplate at all in sight"))
    assert(out(1L) == ("mit", 100))
    assert(!out.contains(2L))
  }

  test("argmax picks the license with higher containment; floor drops weak matches") {
    val out = detect(Seq(
      // full gpl + a fragment of mit: gpl must win
      3L -> s"$gpl and also permission is hereby granted free of charge to some",
      // a tiny fragment only: below the floor at minPct=60
      4L -> "permission is hereby granted free of charge to nobody in particular"))
    assert(out(3L)._1 == "gpl" && out(3L)._2 == 100)
    val strict = detect(Seq(
      4L -> "permission is hereby granted free of charge to nobody in particular"),
      minPct = 60)
    assert(!strict.contains(4L))
  }

  test("local edits lower containment proportionally, not to zero") {
    // replace one word mid-license: windows spanning the edit miss,
    // the rest still match
    val edited = mit.replace("any person", "любой")
    val out = detect(Seq(5L -> s"header $edited footer"))
    assert(out(5L)._1 == "mit" && out(5L)._2 > 40 && out(5L)._2 < 100)
  }
}
