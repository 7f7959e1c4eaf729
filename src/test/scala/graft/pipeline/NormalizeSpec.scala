package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_normalize: unicode/text normalization semantics \u2014 NFC composition
  * via the native kernel, zero-width/control stripping, whitespace and
  * typographic-punctuation folding, idempotence, and the clean-text
  * no-op fast path. All non-ASCII test input is written as \u escapes so
  * the decomposed/precomposed distinction is visible in the source.
  */
class NormalizeSpec extends SparkSpec {

  private def norm(texts: (Long, String)*): Map[Long, (String, Long, Long, Long)] = {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val df = texts.toSeq.toDF("doc_id", "text")
    TextOps.normalizeText(df).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_norm"), r.getAs[Long]("chars_raw"),
          r.getAs[Long]("chars_norm"), r.getAs[Long]("changed")))
    }.toMap
  }

  test("NFC composes decomposed sequences (native kernel)") {
    // "cafe" + combining acute (2 codepoints) -> precomposed \u00E9 (1)
    val out = norm(1L -> "cafe\u0301 au lait")
    val (t, raw, clean, changed) = out(1L)
    assert(t == "caf\u00E9 au lait")
    assert(raw == 13L && clean == 12L && changed == 1L)
  }

  test("zero-width, BOM and control characters are stripped; \\n and \\t survive") {
    val out = norm(2L -> "\uFEFFab\u200Bcd\ne\tfg")
    assert(out(2L)._1 == "abcd\ne\tfg")
  }

  test("exotic spaces fold to ASCII space and runs collapse") {
    val out = norm(3L -> "a\u00A0b  c\u2009\u2009\t d")
    assert(out(3L)._1 == "a b c d")
  }

  test("typographic punctuation folds to ASCII") {
    val out = norm(4L -> "\u2018q\u2019 \u201Cw\u201D \u2013 \u2014 x\u2026")
    assert(out(4L)._1 == "'q' \"w\" - - x...")
  }

  test("clean ASCII text is unchanged and flagged unchanged") {
    val s = "plain ascii text.\nwith a newline"
    val out = norm(5L -> s)
    val (t, raw, clean, changed) = out(5L)
    assert(t == s && raw == clean && changed == 0L)
  }

  test("normalization is idempotent") {
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val noisy = Seq(
      (1L, "cafe\u0301  mix \u2014 \u2018y\u2019\u2026"),
      (2L, "already clean"))
    val once = TextOps.normalizeText(noisy.toDF("doc_id", "text"))
      .select(col("doc_id"), col("text_norm").as("text"))
    val twice = TextOps.normalizeText(once)
    assert(twice.collect().forall(_.getAs[Long]("changed") == 0L))
  }
}
