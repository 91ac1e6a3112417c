package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextAnalysis

/** The fused entropy kernel vs the portable exchange-based reference:
  * row-identical output on real corpus data and on the edge shapes
  * (all-space, single symbol, repeated symbol, unicode beyond the BMP,
  * null text, boundary-rounding probes). The DuckDB oracle (q164/q168 +
  * fuzz family 48) pins both against an independent engine; THIS spec
  * pins kernel ≡ reference so the fast path can never drift. */
class EntropyProfileSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val cols = Seq("doc_id", "n_chars_nospace", "h_chars", "n_tokens",
      "h_words", "low_entropy")
    val k = TextAnalysis.entropyProfile(df, "doc_id", col("text"), 2.0)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    val r = TextAnalysis.entropyProfileExchange(df, "doc_id", col("text"), 2.0)
      .select(cols.map(col): _*).collect().map(_.toSeq).toSet
    (k, r)
  }

  test("kernel == exchange reference on the documents table") {
    val docs = graft.model.Tables(spark, sfDir, "documents")
    val (k, r) = both(docs.select(col("doc_id"), col("text")))
    assert(k.nonEmpty && k === r)
  }

  test("edge shapes: empty / all-space / single char / repeated / unicode / null") {
    val df = Seq(
      (1L, Some("")),                       // no symbols: dropped
      (2L, Some("    ")),                   // spaces only: dropped
      (3L, Some("a")),                      // single symbol: h = 0
      (4L, Some("aaaa aaaa aaaa")),         // tiny alphabet: low entropy
      (5L, Some("ab ab ab ab")),
      (6L, Some("the quick brown fox jumps over the lazy dog")),
      (7L, Some("éé 世界 😀😀")), // é, CJK, surrogate pair
      (8L, None: Option[String]),           // null text: dropped
      (9L, Some("x  y")),                   // double space: empty token dropped
      (10L, Some((('a' to 'z').mkString("") + " ") * 3))
    ).toDF("doc_id", "text")
    val (k, r) = both(df)
    assert(k === r)
    // the drops happened in both
    val ids = k.map(_.head.asInstanceOf[Long])
    assert(ids === Set(3L, 4L, 5L, 6L, 7L, 9L, 10L))
    // single symbol: zero entropy, flagged low
    val one = k.find(_.head == 3L).get
    assert(one(2) === 0.0 && one(5) === true)
  }

  test("SQL registration: entropy_profile(text) resolves via the extension") {
    Seq((1L, "ab ab cd")).toDF("id", "text").createOrReplaceTempView("ep_t")
    val row = spark.sql(
      "SELECT entropy_profile(text) AS ep FROM ep_t").select(
      col("ep")("n_chars_nospace"), col("ep")("n_tokens")).collect().head
    assert(row.getLong(0) === 6L && row.getLong(1) === 3L)
  }
}
