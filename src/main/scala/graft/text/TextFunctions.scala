package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the training-data text/embedding pipeline
  * (deduplication, similarity, text analysis). No reference counterpart —
  * greenfield operators a 100 TB corpus pipeline needs.
  *
  * Design rules:
  *  - every hash is md5 (identical across Spark and the DuckDB oracle);
  *  - float arrays are cast to double BEFORE arithmetic so both engines
  *    do the same IEEE ops in the same order;
  *  - everything is a per-row expression or a hash-partitioned agg/join —
  *    no driver-side loops, no O(n^2) blowup on the scale path.
  */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (space-joined). Empty array when < n words —
    * guarded because sequence(1, m) would count DOWN for m < 1.
    */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Distinct n-gram shingles in ONE codegen'd traversal — semantics of
    * `array_distinct(shingles(ws, n))` (parity-tested in
    * TextKernelsSuite); the HOF chain is interpreted and cost ~3 s at
    * sf0.1 before any dedup work started.
    */
  def shinglesDistinct(ws: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      DistinctShingles(org.apache.spark.sql.graftbridge.Bridge.expression(ws), n))

  /** MinHash over a shingle column (pre-exploded): the k-th hash of one
    * shingle. min() of this per doc gives the k-th signature component.
    * String min over md5 hex == numeric min over the 128-bit value.
    */
  def minhashOf(shingle: Column, seed: Int): Column =
    md5(concat(lit(s"$seed|"), shingle))

  /** 60-bit word hash: md5 hex prefix parsed as a number (fits in a Long
    * with sign bit clear; conv() is codegen'd).
    */
  def wordHash60(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** 60-bit SimHash of a words array: majority vote per bit over the
    * (frequency-weighted) word hashes. One md5 per word, all 60 bit-votes
    * accumulated in a single codegen'd traversal ([[TextKernels]]) — the
    * HOF formulation ([[simhash60Hof]]) recomputed the hash array up to
    * 60x per row (round-3 VERDICT #1, 29 s at sf0.1).
    */
  def simhash60(ws: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHash60(org.apache.spark.sql.graftbridge.Bridge.expression(ws)))

  /** Reference HOF formulation of [[simhash60]] — kept as the parity
    * oracle for TextKernelsSuite (matches the DuckDB SQL term-by-term).
    */
  def simhash60Hof(ws: Column): Column = {
    val hashes = transform(ws, wordHash60 _)
    val n = size(hashes)
    (0 until 60).map { i =>
      when(size(filter(hashes,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L))) * 2 > n,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Per-marker-set word-membership counts (ARRAY<INT>, one count per
    * set) in a single codegen'd traversal of the words array.
    */
  def markerScores(ws: Column, sets: Seq[Seq[String]]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      WordMarkerScores(org.apache.spark.sql.graftbridge.Bridge.expression(ws), sets))

  /** Repetition stats `[maxWordCount, distinctWords, distinct2grams]`
    * (ARRAY<LONG>) over a words array in a single codegen'd traversal —
    * the per-document inputs of the Gopher-style repetition quality
    * gates (Rae et al. 2021, arXiv:2112.11446 §A1.1).
    */
  def repetitionStats(ws: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      RepetitionStats(org.apache.spark.sql.graftbridge.Bridge.expression(ws)))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** The j-th 15-bit band of a 60-bit simhash. With 4 bands, any pair at
    * hamming distance <= 3 shares at least one identical band (pigeonhole)
    * — so a band-equality join is an EXACT candidate filter for the
    * hamming <= 3 predicate, not an approximation (Manku et al., WWW'07).
    */
  def simhashBand(h: Column, j: Int): Column =
    shiftright(h, 15 * j).bitwiseAND(lit(0x7FFFL))

  /** Double-precision dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Canonical document fingerprint: md5 of the whitespace-collapsed,
    * lower-cased text (catches formatting-only duplicates).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))
}
