package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the scrub audit: clean scrub paths, card masking that spares
  * non-PII digit runs, and the adjacent-phone leak it must surface. */
class ScrubAuditSpec extends SparkSpec {
  import spark.implicits._

  test("maskCards redacts valid cards in any separator form, spares invalid runs") {
    val out = Seq(
      "pay 4111 1111 1111 1111 or 4111-1111-1111-1111 ref 1234567890123 done")
      .toDF("t").select(Pii.maskCards(col("t"))).first().getString(0)
    assert(out == "pay <CARD> or <CARD> ref 1234567890123 done")
  }

  test("the audit reports the adjacent-phone leak and clean email/card recall") {
    val rows = Seq(
      ("s", "mail a@b.com call 555-1234 pay 4111 1111 1111 1111"),
      ("s", "dial 555-1234/555-6789 now"))
    val r = Pii.scrubAudit(rows.toDF("source", "t"), col("source"), col("t"))
      .first()
    // planted: 1 email, 2 phones visible pre-mask, 1 card
    assert(r.getAs[Long]("planted_emails") == 1 && r.getAs[Long]("resid_emails") == 0)
    assert(r.getAs[Long]("planted_cards") == 1 && r.getAs[Long]("resid_cards") == 0)
    // the second phone of the pair leaks through one mask pass
    assert(r.getAs[Long]("planted_phones") == 2 && r.getAs[Long]("resid_phones") == 1)
  }
}
