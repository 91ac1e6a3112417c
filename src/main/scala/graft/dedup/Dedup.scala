package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.text.TextAnalysis

/** Deduplication operators for a pretraining-data pipeline (north-star ⊕):
  * exact (hash groupBy / keep-first), MinHash+LSH near-dup candidate pairs,
  * SimHash, and n-gram Jaccard verification.
  *
  * Design for scale:
  *  - exact dedup = one shuffle on the fingerprint; at 100 TB use the md5
  *    fingerprint (16 bytes) as the shuffle key, never the full text.
  *  - MinHash/LSH avoids the O(n²) cross join: docs are exploded to
  *    (band_id, band_hash) buckets, pairs are generated *within buckets*
  *    via an equi self-join, then verified with exact Jaccard — the classic
  *    shingle→minhash→band→bucket-join pipeline, all shuffle-partitioned by
  *    bucket key so the worst case is the hottest bucket, not n².
  *  - hashes are md5-based (engine-portable, deterministic across runs and
  *    across engines — the DuckDB oracle computes the identical signature).
  */
object Dedup {

  /** Exact dedup, deterministic keep-first by `order`, keyed on the
    * normalized-text fingerprint. */
  def exact(docs: DataFrame, text: Column, order: Seq[Column]): DataFrame =
    Relational.dedupKeepFirst(
      docs.withColumn("fp", TextAnalysis.fingerprint(text)), Seq("fp"), order)

  /** Word k-shingles (default 3) of the text, as space-joined strings.
    * Output: one row per (doc, shingle). */
  def shingles(docs: DataFrame, idCol: String, text: Column, k: Int = 3): DataFrame = {
    val ws = TextAnalysis.words(text)
    docs.select(col(idCol),
        when(size(ws) >= k, sequence(lit(1), size(ws) - (k - 1)))
          .otherwise(array().cast("array<int>")).as("__idx"), ws.as("__ws"))
      .select(col(idCol), explode(col("__idx")).as("__i"), col("__ws"))
      .select(col(idCol),
        array_join(slice(col("__ws"), col("__i"), lit(k)), " ").as("shingle"))
  }

  /** MinHash signature: numHashes columns h0..h{n-1}, where
    * h_i = min over shingles of md5(i || '|' || shingle). Lexicographic min
    * over fixed-width lowercase hex == numeric min over the 128-bit hash,
    * so no hex→int conversion is needed (and the oracle can reproduce it).
    * One shuffle (groupBy doc id); map-side partial min keeps it cheap. */
  def minhashSignature(docs: DataFrame, idCol: String, text: Column,
                       numHashes: Int = 8, k: Int = 3): DataFrame = {
    val sh = shingles(docs, idCol, text, k)
    val aggs = (0 until numHashes).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("shingle")))).as(s"h$i"))
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures split into `bands` bands of
    * `rowsPerBand` hashes; docs sharing any band bucket become a candidate
    * pair (a < b). Equi self-join on (band, bucket) — no cross join. */
  def lshCandidates(sig: DataFrame, idCol: String,
                    bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("_", hs: _*).as("bucket"))
    }
    val buckets = sig.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val a = buckets.select(col("band"), col("bucket"), col(idCol).as("a"))
    val b = buckets.select(col("band"), col("bucket"), col(idCol).as("b"))
    a.join(b, Seq("band", "bucket")).filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact word-set Jaccard for given (a, b) id pairs — the verification
    * stage after LSH candidate generation. Joins the pair list to an
    * exploded distinct-word table twice; cost is bounded by candidate
    * count, never n². Returns (a, b, jaccard). */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    text: Column): DataFrame = {
    val w = docs.select(col(idCol).as("__id"),
      explode(array_distinct(TextAnalysis.words(text))).as("w"))
    val sizes = w.groupBy("__id").agg(count("*").as("sz"))
    val inter = pairs
      .join(w.select(col("__id").as("a"), col("w")), Seq("a"))
      .join(w.select(col("__id").as("b"), col("w")), Seq("b", "w"))
      .groupBy("a", "b").agg(count("*").as("inter"))
    pairs.join(inter, Seq("a", "b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.select(col("__id").as("a"), col("sz").as("sza")), Seq("a"))
      .join(sizes.select(col("__id").as("b"), col("sz").as("szb")), Seq("b"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"), 6).as("jaccard"))
  }

  /** 16-bit SimHash over the word multiset, engine-portable: bit i of a
    * word's hash = high bit of hex digit i of md5(word); signature bit i =
    * 1 iff Σ_words (±1) > 0. Returned as a 16-char '0'/'1' string (stable
    * lexicographic grouping key; hamming distance = differing chars). */
  def simhash16(text: Column): Column = {
    val ws = TextAnalysis.words(text)
    val bits = (1 to 16).map { i =>
      val contrib = aggregate(ws, lit(0),
        (acc, w) => acc + when(substring(md5(w), i, 1)
          .isInCollection(Seq("8", "9", "a", "b", "c", "d", "e", "f")), 1)
          .otherwise(-1))
      when(contrib > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }
}
