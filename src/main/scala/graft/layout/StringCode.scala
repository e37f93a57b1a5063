package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** THE order-preserving string→double prefix code — one definition shared
  * by the curve writers ([[LayoutWriter]]), the clustering-health metric
  * ([[Compactor.scanFraction]]) and the advisor, so the three can never
  * drift apart (round-16 VERDICT Next #6; before this object there were
  * two independent copies, and the driver twin used `charAt & 0xFF`
  * where the writer used Spark's `ascii` — code points > 255 measured a
  * different domain than they clustered in, r16 ADVICE).
  *
  * Shape: skip the column's COMMON PREFIX, then weight the next
  * [[Width]] code points positionally (`cp0·2^40 + cp1·2^32 + …`).
  *
  * The common-prefix strip (round-16 VERDICT Next #1) is what keeps
  * space-filling curves alive on realistic id pools: ASINs all starting
  * "B0...", UUIDs with a tenant prefix, zero-padded numeric ids — a
  * fixed-width code over the RAW string collapses to ONE value when the
  * distinguishing characters sit past its width (measured: curves fell
  * to 1× files-ratio on deep-prefix asins while linear held 12×,
  * results/rq1_amazon C1deep). Soundness of the strip: the skip count
  * comes from the common prefix of the column's global MIN and MAX, and
  * lexicographic betweenness forces every value in [min, max] to carry
  * that same prefix (at the first position where a value departed from
  * the prefix it would sort strictly below min or above max) — so the
  * strip is a constant offset for every value coded and order is
  * preserved exactly.
  *
  * Caveat (unchanged from the 4-byte code): code points > 255 overflow
  * their positional weight, so two strings differing only in a later
  * position can collide or reorder when an earlier position carries a
  * >255 code point. Writer and driver twin share the caveat — the
  * HEALTH metric always measures exactly the domain the curve was
  * clustered in. Zone-map PRUNING never uses this code (string zones
  * compare raw strings in [[StrOrder]]), so the caveat costs clustering
  * quality at worst, never correctness.
  */
object StringCode {

  /** Code points coded after the stripped prefix. 6 × 8-bit weights =
    * 48 bits — exactly representable in a double for Latin-1 text (the
    * previous 4-byte code wasted the mantissa's remaining headroom).
    */
  val Width = 6

  /** Cap on the stripped prefix length — a guard against degenerate
    * near-constant columns paying an unbounded codePointAt scan per row
    * on the driver twin; 64 code points is far past any realistic id
    * scheme's shared prefix.
    */
  val MaxSkip = 64

  private val Weights: Array[Double] =
    (0 until Width).map(i => math.pow(256d, (Width - 1 - i).toDouble)).toArray

  /** Code-point common-prefix length of two strings, capped at `cap`. */
  def commonPrefixLen(a: String, b: String, cap: Int = MaxSkip): Int = {
    var i = 0; var j = 0; var n = 0
    while (n < cap && i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return n
      i += Character.charCount(ca); j += Character.charCount(cb); n += 1
    }
    n
  }

  /** Per-string-column skip offsets for a layout write: ONE min/max
    * aggregate over all string layout columns (no job when there are
    * none), skip = common prefix of (min, max) — shared by every value
    * in between (see object doc). All-null columns skip 0.
    */
  def offsets(df: DataFrame, cols: Seq[String]): Map[String, Int] = {
    val strCols = cols.filter(c => df.schema(c).dataType == StringType)
    if (strCols.isEmpty) return Map.empty
    val aggs = strCols.flatMap(c =>
      Seq(min(col(c)).as(s"__mn_$c"), max(col(c)).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    strCols.map { c =>
      val skip = (Option(r.getAs[String](s"__mn_$c")),
          Option(r.getAs[String](s"__mx_$c"))) match {
        case (Some(lo), Some(hi)) => commonPrefixLen(lo, hi)
        case _ => 0
      }
      c -> skip
    }.toMap
  }

  /** Spark-side code: positionally weighted `ascii(substring(...))` —
    * code-point semantics (Spark's substring counts code points and
    * ascii returns the full code point; probed on 4.1.2), codegen-
    * friendly (plain expression arithmetic, no UDF). NULL and
    * past-the-end positions code as 0.
    */
  def codeColumn(c: Column, skip: Int): Column =
    (0 until Width).map { i =>
      coalesce(ascii(substring(c, skip + i + 1, 1)), lit(0))
        .cast(DoubleType) * lit(Weights(i))
    }.reduce(_ + _)

  /** Driver twin of [[codeColumn]] — identical code-point semantics AND
    * identical accumulation order (left-assoc sum of cp·weight terms),
    * so results are bit-identical to the Spark column even past the
    * 2^53 exactness bound.
    */
  def code(s: String, skip: Int): Double = {
    var i = 0; var n = 0
    while (n < skip && i < s.length) {
      i += Character.charCount(s.codePointAt(i)); n += 1
    }
    var v = 0.0
    var k = 0
    while (k < Width) {
      val cp =
        if (i < s.length) {
          val c = s.codePointAt(i); i += Character.charCount(c); c
        } else 0
      v += cp.toDouble * Weights(k)
      k += 1
    }
    v
  }
}
