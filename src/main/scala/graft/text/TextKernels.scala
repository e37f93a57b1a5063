package graft.text

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-hash kernels. Round-3 VERDICT #1: expressing SimHash as
  * 60 higher-order-function terms recomputes the per-word md5 array up to
  * 60x per row (HOFs are interpreted — no codegen, no common-subexpression
  * elimination), which turned q31 into a 29 s scale-killer. These kernels
  * hash each word exactly once and accumulate every bit-vote / marker
  * count in a single traversal, invoked from codegen'd expressions (same
  * pattern as [[FloatVecDot]]).
  *
  * Parity contract: [[hash60]] equals the SQL expression
  * `conv(substring(md5(w),1,15),16,10)::long` (== DuckDB
  * `('0x' || substr(md5(w),1,15))::BIGINT`) — the first 15 hex nibbles of
  * the md5 digest, i.e. the top 60 bits — so the DuckDB oracles are
  * unchanged. Verified against the HOF formulation in TextKernelsSuite.
  */
object TextKernels {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5(bytes): first 8 digest bytes big-endian, dropping
    * the low nibble of byte 7 == parse of the first 15 hex chars.
    */
  def hash60(bytes: Array[Byte]): Long = {
    val d = md5.get().digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** 60-bit SimHash of a words array: per-bit majority vote over the
    * (frequency-weighted) 60-bit word hashes, one md5 per word. Null
    * elements count toward the total (size() semantics of the HOF
    * formulation) but cast no votes.
    */
  def simhash60(ws: ArrayData): Long = {
    val n = ws.numElements()
    val votes = new Array[Long](60)
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val h = hash60(ws.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) { votes(b) += (h >>> b) & 1L; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) * 2 > n) out |= 1L << b; b += 1 }
    out
  }

  /** Distinct word n-gram shingles (space-joined, first-occurrence order)
    * in one traversal — equals
    * `array_distinct(shingles(ws, n))` from TextFunctions, whose
    * interpreted transform/slice/concat_ws lambda chain cost ~3 s at
    * sf0.1 just to *produce* the shingle rows (round-4 profile). Null
    * words are skipped inside a shingle join (concat_ws semantics).
    */
  def distinctShingles(ws: ArrayData, n: Int): ArrayData = {
    val m = ws.numElements()
    if (m < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.LinkedHashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      out.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Repetition statistics over a words array in ONE traversal:
    * `[maxWordCount, distinctWords, distinct2grams]` — the inputs of the
    * Gopher-style repetition quality gates (top-word fraction, duplicate
    * 2-gram fraction). The HOF formulation
    * (`list_max(transform(array_distinct(ws), w -> size(filter(ws, =w))))`)
    * is O(distinct x n) interpreted work per row; this kernel is one
    * hash-map pass. Null words are skipped for the word/2-gram counts but
    * callers divide by size(ws), matching the HOF semantics where nulls
    * never equal anything.
    */
  def repetitionStats(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    val counts = new java.util.HashMap[UTF8String, Int]()
    val grams = new java.util.HashSet[UTF8String]()
    val sep = UTF8String.fromString(" ")
    var maxC = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val w = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      if (w != null) {
        val c = counts.merge(w, 1, (a, b) => a + b)
        if (c > maxC) maxC = c
        // exact distinct 2-grams (space-joined, like the SQL `a||' '||b`);
        // grams touching a null word are skipped, matching SQL where
        // null-concat yields null and list_distinct counts it separately
        // from every real gram — callers never see null words from words()
        if (prev != null) grams.add(UTF8String.concatWs(sep, prev, w))
      }
      prev = w
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      Array(maxC.toLong, counts.size().toLong, grams.size().toLong))
  }

  /** Per-marker-set membership counts over a words array in one traversal
    * (q26 lang-ID: 5 interpreted `size(filter(ws, isin(...)))` terms each
    * re-evaluated the split — round-3 VERDICT #2).
    */
  def markerScores(ws: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): ArrayData = {
    val counts = new Array[Int](sets.length)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val w = ws.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(w)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}

/** `simhash60(ARRAY<STRING>) -> LONG` as a codegen'd expression. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `distinctShingles(ARRAY<STRING>, n) -> ARRAY<STRING>` as a codegen'd
  * expression; equals `array_distinct(shingles(ws, n))`.
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_distinct_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.distinctShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.distinctShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `repetitionStats(ARRAY<STRING>) -> ARRAY<LONG>`:
  * `[maxWordCount, distinctWords, distinct2grams]` in one codegen'd pass.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>")
  }

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `markerScores(ARRAY<STRING>) -> ARRAY<INT>`: element k counts how many
  * words fall in the k-th marker set.
  */
case class WordMarkerScores(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_marker_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires ARRAY<STRING>")
  }

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { s =>
      val hs = new java.util.HashSet[UTF8String](s.size * 2)
      s.foreach(w => hs.add(UTF8String.fromString(w)))
      hs
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.markerScores(input.asInstanceOf[ArrayData], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c => s"graft.text.TextKernels.markerScores($c, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
