package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins text45's scrub contract: every planted document is detected
  * with all three PII kinds, the Luhn verdict exercises BOTH arms on
  * the fixture, an independent Scala Luhn agrees, and redaction is
  * idempotent (re-running the detector on redacted text finds
  * nothing).
  */
class PiiRedactSpec extends SparkSpec {

  private lazy val rows =
    graft.SparkEntry.queries("text45_pii_redact")(spark, sfDir).collect()

  test("planted docs are all detected with email + phone + card") {
    val planted = rows.filter(_.getAs[Long]("doc_id") % 9 == 2)
    assert(planted.nonEmpty)
    planted.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_phones") >= 1, s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Long]("n_cards") >= 1, s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("Luhn verdict exercises both arms and matches an independent fold") {
    val valid = rows.map(_.getAs[Long]("n_valid_cards")).sum
    val cards = rows.map(_.getAs[Long]("n_cards")).sum
    assert(valid > 0, "no Luhn-valid candidate on the fixture")
    assert(valid < cards, "every candidate Luhn-valid — verdict vacuous")
    // independent Luhn over the planted digits
    def luhn(digits: String): Boolean = {
      val s = digits.reverse.zipWithIndex.map { case (ch, j) =>
        val d = ch - '0'
        if (j % 2 == 1) { val dd = 2 * d; if (dd > 9) dd - 9 else dd }
        else d
      }.sum
      s % 10 == 0
    }
    rows.filter(_.getAs[Long]("doc_id") % 9 == 2).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val d8 = f"${id % 100000000}%08d"
      val expected = if (luhn(d8 + d8)) 1L else 0L
      assert(
        r.getAs[Long]("n_valid_cards") === expected,
        s"doc $id Luhn disagrees with the independent fold"
      )
    }
  }

  test("redaction is idempotent: no PII survives the scrub") {
    val redacted = graft.Tables(spark, sfDir).documents
      .filter(pmod(col("doc_id"), lit(9)) === 2)
      .select(
        concat(
          col("text"),
          lit(" reach me at u"),
          col("doc_id").cast("string"),
          lit("@example.com or 555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" card "),
          lpad(pmod(col("doc_id"), lit(100000000)).cast("string"), 8, "0"),
          lpad(pmod(col("doc_id"), lit(100000000)).cast("string"), 8, "0")
        ).as("ptext")
      )
      .select(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              col("ptext"),
              "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
              "[PII]"
            ),
            "555-[0-9][0-9][0-9][0-9]",
            "[PII]"
          ),
          "[0-9]{16}",
          "[PII]"
        ).as("red")
      )
    val survivors = redacted
      .filter(
        expr(
          "size(regexp_extract_all(red, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', 0)) + " +
            "size(regexp_extract_all(red, '555-[0-9][0-9][0-9][0-9]', 0)) + " +
            "size(regexp_extract_all(red, '[0-9]{16}', 0)) > 0"
        )
      )
      .count()
    assert(survivors === 0L, s"$survivors docs still carry PII after redaction")
  }
}
