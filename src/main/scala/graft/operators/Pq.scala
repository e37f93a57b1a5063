package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Product-quantization index in its SCALE formulation: the whole code
  * word packed into ONE BIGINT per vector (8 subspaces × 4-bit codes =
  * 32 bits), scored by [[PqAdcScore]] — 8 table lookups against a
  * 128-double per-query distance table, no join, no per-subspace rows.
  *
  * q97/q97b (queries/SimilarityQueries) define the SEMANTICS in the
  * oracle-checkable join formulation (codes as (vid, j, cid) rows, ADC
  * as a join + decimal sum); this object is the same math shaped for
  * 100 TB, where what matters is bytes-per-vector on the scan:
  *  - the raw corpus reads 64 floats (256 B) + overhead per row;
  *  - the PQ index reads one BIGINT (8 B, of which 4 are used) — a
  *    32-64× scan reduction, and the reason PQ exists (Jégou et al.
  *    2011 §II: RAM-resident codes for billion-vector search);
  *  - scoring is 8 array lookups per row (vs 64 multiply-adds), inside
  *    whole-stage codegen;
  *  - the per-query table (m×k = 128 doubles) rides into the scan as a
  *    broadcast row, so Q queries cost ONE pass over the codes;
  *  - top-k per query is the [[TopKAgg.topKByScore]] bounded-heap
  *    AGGREGATE (k rows per partition shuffled), not a window over the
  *    Q×N scored rows.
  * Encode semantics are IDENTICAL to q97 (per-subspace L2 argmin over
  * the 16 data-derived codebook entries, tie → smaller cid) — pinned
  * against the join formulation in PqSuite. ADC sums the same 8 doubles
  * in the same ascending-j order but in plain double arithmetic (q97's
  * gate rounds each term to DECIMAL(27,12) first for cross-engine
  * hashing; the two differ by at most 8 quantization ulps).
  *
  * cli/AnnBench measures this path against brute force at millions of
  * vectors → results/ann_scale.json.
  */
object Pq {
  val M = 8 // subspaces
  val SubDim = 8 // dims per subspace (64-dim vectors)
  val K = 16 // codebook entries per subspace (4-bit codes)

  /** Bits per subspace code for a k-entry codebook (k=16 → 4-bit
    * nibbles, k=256 → 8-bit bytes; m×bits ≤ 64 packs the whole word
    * into one BIGINT). `m` is the CALLER's subspace count — a coarse
    * quantizer (m=1) legitimately uses many more than 256 lists, so
    * the width check must not assume the global M.
    */
  def bitsFor(k: Int, m: Int = M): Int = {
    require(k > 1 && (k & (k - 1)) == 0 && m * Integer.numberOfTrailingZeros(k) <= 64,
      s"k=$k must be a power of two with ${m}×log2(k) <= 64")
    Integer.numberOfTrailingZeros(k)
  }

  /** Per-subspace (j, squared-L2) pairs of `v` against codebook row `c`
    * — one codegen'd FloatVecSubL2 per subspace, literal slice bounds.
    */
  private def subDists(v: Column, c: Column): Column = array(
    (0 until M).map(j => struct(lit(j).as("j"),
      graft.text.VectorExpressions.vecSubL2(v, c, j * SubDim, SubDim)
        .as("dist"))): _*)

  /** Encode a corpus to packed code words. `corpus` needs (vid LONG,
    * vemb ARRAY<FLOAT>); `cents` (cid in 0..K-1, cemb ARRAY<FLOAT>) is
    * broadcast. Returns (vid, codes BIGINT) — subspace j's code in bits
    * [4j, 4j+4). One shuffle (the per-(vid, j) argmin partial-agg);
    * at scale this output IS the persisted index.
    */
  def encode(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.join(broadcast(cents))
      .select(col("vid"), col("cid"),
        explode(subDists(col("vemb"), col("cemb"))).as("sd"))
      .select(col("vid"), col("sd.j").as("j"), col("cid"), col("sd.dist").as("dist"))
      .groupBy(col("vid"), col("j"))
      .agg(min(struct(col("dist"), col("cid"))).as("best"))
      .groupBy(col("vid"))
      // nibbles are disjoint, so SUM of shifted codes == OR-merge
      // (SQL shiftleft, not functions.shiftleft — the shift is a column)
      .agg(sum(expr("shiftleft(CAST(best.cid AS BIGINT), CAST(4 * j AS INT))"))
        .as("codes"))

  /** Per-subspace Lloyd (k-means) refinement of a PQ codebook — the
    * training step real PQ uses instead of raw sampled vectors (Jégou
    * et al. 2011 §III.A trains k-means per subspace). One iteration =
    * assign every vector's subspace slice to its nearest codebook entry
    * (the same argmin [[encode]] uses) and replace each entry's slice
    * with the MEAN of its assigned slices; empty entries keep their old
    * slice. Fully distributed: the assign is the encode join, the mean
    * is a (j, cid, dim) partial agg — per iteration one extra shuffle
    * of m×k×subDim aggregate rows, nothing driver-side but the 1 KB
    * codebook itself. Deterministic (argmin ties → smaller cid; means
    * via DECIMAL-free avg are partitioning-dependent in the last ulp,
    * which moves a centroid by <1e-12 — irrelevant for assignment).
    *
    * Returns centroids as full 64-dim vectors (subspace j's slice in
    * positions [8j, 8j+8)), the shape [[encode]]/[[adcTable]] expect.
    */
  def trainCodebooks(corpus: DataFrame, init: IndexedSeq[Array[Float]],
      iters: Int): IndexedSeq[Array[Float]] = {
    var cents = init
    val bits = bitsFor(init.length)
    for (_ <- 0 until iters) {
      // assign via the map-only [[encodeWord]] kernel (bit-identical to
      // the join-formulation argmin, pinned in PqSuite) — the iteration
      // touches corpus × m rows, not corpus × k candidates, so Lloyd
      // stays cheap even at k=256
      val means = corpus
        .select(col("vemb"), encodeWord(col("vemb"), cents).as("codes"))
        .select(col("vemb"), col("codes"),
          explode(sequence(lit(0), lit(M - 1))).as("j"))
        .select(col("j"),
          // SQL shiftrightunsigned, not functions.* — the shift amount
          // is a column (same caveat as encode's shiftleft)
          expr(s"shiftrightunsigned(codes, CAST($bits * j AS INT))")
            .bitwiseAND(lit((1L << bits) - 1)).as("cid"),
          posexplode(expr(s"slice(vemb, j * $SubDim + 1, $SubDim)"))
            .as(Seq("i", "v")))
        .groupBy(col("j"), col("cid"), col("i"))
        .agg(avg(col("v").cast("double")).as("mean"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        val j = r.getInt(0); val c = r.getLong(1).toInt; val i = r.getInt(2)
        next(c)(j * SubDim + i) = r.getDouble(3).toFloat
      }
      cents = next
    }
    cents
  }

  /** Mean per-vector quantization error (Σ_j ||v_j − cb_j[code_j]||²)
    * of a codebook over a corpus — the Lloyd objective; train should
    * not increase it.
    */
  def quantizationError(corpus: DataFrame, cents: IndexedSeq[Array[Float]]): Double = {
    val spark = corpus.sparkSession
    val centsDf = {
      import spark.implicits._
      cents.zipWithIndex.map { case (v, c) => (c.toLong, v) }.toDF("cid", "cemb")
    }
    corpus.join(broadcast(centsDf))
      .select(col("vid"), explode(subDists(col("vemb"), col("cemb"))).as("sd"))
      .select(col("vid"), col("sd.j").as("j"), col("sd.dist").as("dist"))
      .groupBy(col("vid"), col("j")).agg(min(col("dist")).as("d"))
      .agg(avg(col("d")) * lit(M)).collect()(0).getDouble(0)
  }

  /** Driver-side ADC distance table of one query against the codebook:
    * table(j*k + c) = ||q_j − cent_c_j||², same double ops and order as
    * [[graft.text.VecKernels.subL2FF]]. k = cents.length (16 → a
    * 128-double table, 256 → 2048 doubles ≈ 16 KB — both small enough
    * to ride into the scan as a foldable literal).
    */
  def adcTable(q: Array[Float], cents: IndexedSeq[Array[Float]]): Array[Double] = {
    val k = cents.length
    val t = new Array[Double](M * k)
    var j = 0
    while (j < M) {
      var c = 0
      while (c < k) {
        val cv = cents(c)
        var acc = 0.0
        var i = 0
        while (i < SubDim) {
          val d = q(j * SubDim + i).toDouble - cv(j * SubDim + i).toDouble
          acc += d * d
          i += 1
        }
        t(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    t
  }

  /** ADC score of a packed code word against an m×k-double table
    * (bits = log2 k; default the 4-bit / 128-double q97 shape).
    */
  def adcScore(codes: Column, table: Column, bits: Int = 4): Column =
    Bridge.column(PqAdcScore(Bridge.expression(codes), Bridge.expression(table), bits))

  /** Map-only packed-word encoder: the whole per-row argmin runs inside
    * ONE codegen'd expression ([[PqEncodeWord]]) — no candidate-join row
    * multiplication, no (vid, j) shuffle. Bit-identical to [[encode]]
    * (same subL2 kernel, same tie → smaller cid; pinned in PqSuite);
    * this is the index-build shape for 100 TB, where the build must be
    * a single pass over the corpus.
    */
  def encodeWord(vemb: Column, cents: IndexedSeq[Array[Float]]): Column =
    Bridge.column(PqEncodeWord(Bridge.expression(vemb),
      PqCodebook(cents, M, SubDim, bitsFor(cents.length))))

  /** Coarse-quantizer assignment (IVF list id): the SAME argmin kernel
    * with one subspace spanning the full vector — m=1, subDim=64.
    */
  def coarseAssign(vemb: Column, cents: IndexedSeq[Array[Float]]): Column =
    Bridge.column(PqEncodeWord(Bridge.expression(vemb),
      PqCodebook(cents, 1, M * SubDim, bitsFor(cents.length, m = 1))))

  /** Coarse RESIDUAL x − c(x) (Jégou et al. 2011 §IV, IVFADC): the
    * vector minus its nearest coarse centroid (the same full-vector
    * argmin as [[coarseAssign]] — tie → smaller cid), element-wise in
    * double then rounded to FLOAT. Residual-encoding concentrates the
    * PQ error budget on the within-list displacement instead of the
    * vector's absolute position — the standard fix for recall at fixed
    * code width (r18: raw-vector codes needed a 5000-wide shortlist for
    * recall@5 ≥ 0.8 at 64M; residual codes are the named repair).
    * Map-only and codegen'd, so `encodeWord(residual(v), pqCents)`
    * stays a zero-shuffle single pass over the corpus.
    */
  def residual(vemb: Column, cents: IndexedSeq[Array[Float]]): Column =
    Bridge.column(PqResidual(Bridge.expression(vemb),
      PqCodebook(cents, 1, M * SubDim, bitsFor(cents.length, m = 1))))

  /** Residual w.r.t. an ALREADY-COMPUTED list id — the index-build
    * composition `encodeWord(residualAt(v, coarseAssign(v)), pq)` runs
    * the k'×dim coarse argmin ONCE per row instead of twice (at k'=1024
    * the argmin dominates the whole build pass). Bit-identical to
    * [[residual]] when `list` comes from [[coarseAssign]] over the same
    * centroids (pinned in PqSuite).
    */
  def residualAt(vemb: Column, list: Column,
      cents: IndexedSeq[Array[Float]]): Column =
    Bridge.column(PqResidualAt(Bridge.expression(vemb), Bridge.expression(list),
      PqCodebook(cents, 1, M * SubDim, bitsFor(cents.length, m = 1))))

  /** Distributed Lloyd for the COARSE quantizer (m=1, full-vector):
    * k-means over whole vectors, k up to 2^bits lists. Same shape as
    * [[trainCodebooks]] — assign via the codegen [[coarseAssign]]
    * kernel (one pass, corpus × k×dim flops), means via a (list, dim)
    * partial agg (k×dim aggregate rows shuffle) — so training a
    * 1024-list quantizer over millions of vectors is a handful of
    * passes, nothing driver-side but the k×dim centroid table. A
    * cluster-resolution coarse quantizer is what makes RESIDUAL codes
    * sharp: with k' ≈ √N lists (Jégou et al. 2011 §V sizes IVFADC this
    * way) the residual spans one neighborhood, not the whole space.
    * Empty lists keep their previous centroid.
    */
  def trainCoarse(corpus: DataFrame, init: IndexedSeq[Array[Float]],
      iters: Int): IndexedSeq[Array[Float]] = {
    val dim = M * SubDim
    var cents = init
    for (_ <- 0 until iters) {
      // assign in its OWN projection below the explode: fused into the
      // same select, Catalyst evaluates the k×dim argmin once per
      // GENERATED row (64×) instead of once per input row — measured
      // 88 s vs ~2 s for a 200k-row sample at k=1024
      val means = corpus
        .select(coarseAssign(col("vemb"), cents).cast("int").as("list"),
          col("vemb"))
        .select(col("list"), posexplode(col("vemb")).as(Seq("i", "v")))
        .groupBy(col("list"), col("i"))
        .agg(avg(col("v").cast("double")).as("mean"))
        .collect()
      val next = cents.map(_.clone())
      means.foreach { r =>
        val l = r.getInt(0); val i = r.getInt(1)
        if (i < dim) next(l)(i) = r.getDouble(2).toFloat
      }
      cents = next
    }
    cents
  }

  /** Train PQ codebooks on coarse RESIDUALS (the IVFADC formulation):
    * identical to [[trainCodebooks]] but every corpus vector is replaced
    * by x − coarse-centroid first (map-only [[PqResidual]] kernel).
    */
  def trainResidualCodebooks(corpus: DataFrame, coarse: IndexedSeq[Array[Float]],
      init: IndexedSeq[Array[Float]], iters: Int): IndexedSeq[Array[Float]] =
    trainCodebooks(
      corpus.select(col("vid"), residual(col("vemb"), coarse).as("vemb")),
      init, iters)
}

/** A flattened PQ codebook baked into an encode expression: k rows of
  * m×subDim floats, row-major. Value class with content equality so
  * Catalyst expression canonicalization works across copies.
  */
case class PqCodebook(flat: Array[Float], k: Int, m: Int, subDim: Int, bits: Int) {
  require(k <= (1 << bits) && m * bits <= 64 && flat.length == k * m * subDim,
    s"bad codebook shape: k=$k m=$m subDim=$subDim bits=$bits len=${flat.length}")
  override def equals(o: Any): Boolean = o match {
    case p: PqCodebook => p.k == k && p.m == m && p.subDim == subDim &&
      p.bits == bits && java.util.Arrays.equals(p.flat, flat)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(flat) * 31 +
    (k, m, subDim, bits).hashCode
}

object PqCodebook {
  def apply(cents: IndexedSeq[Array[Float]], m: Int, subDim: Int, bits: Int): PqCodebook = {
    val dim = m * subDim
    val flat = new Array[Float](cents.length * dim)
    cents.indices.foreach { c =>
      val src = cents(c)
      System.arraycopy(src, 0, flat, c * dim, math.min(src.length, dim))
    }
    PqCodebook(flat, cents.length, m, subDim, bits)
  }
}

/** Per-row PQ encode: for each of m subspaces, the argmin codebook
  * entry by squared L2 over the subspace slice (double accumulation,
  * ascending index — the exact [[graft.text.VecKernels.subL2FF]]
  * arithmetic, ties → smaller cid), packed at bits-per-code into one
  * BIGINT. Map-only: at scale the index build is one pass over the
  * corpus with zero shuffle, vs the join formulation's k-way row
  * multiplication + (vid, j) partial agg.
  */
case class PqEncodeWord(vemb: Expression, cb: PqCodebook) extends Expression {
  override def children: Seq[Expression] = Seq(vemb)
  override def dataType: DataType = LongType
  override def nullable: Boolean = vemb.nullable
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vemb.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT> vectors, got $t")
    }

  override def eval(input: InternalRow): Any = {
    val v = vemb.eval(input)
    if (v == null) null
    else PqEncodeWord.encode(v.asInstanceOf[ArrayData], cb.flat, cb.k, cb.m,
      cb.subDim, cb.bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = vemb.genCode(ctx)
    val cbRef = ctx.addReferenceObj("pqCodebook", cb.flat, "float[]")
    val anyNull = if (nullable) s"${v.isNull}" else "false"
    val code =
      code"""
        ${v.code}
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.operators.PqEncodeWord.encode(
            ${v.value}, $cbRef, ${cb.k}, ${cb.m}, ${cb.subDim}, ${cb.bits});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vemb = newChildren(0))
}

object PqEncodeWord {
  /** The argmin kernel. Slice clamping mirrors VecKernels.subL2FF (a
    * vector shorter than a slice contributes only its present dims), so
    * the packed word is bit-identical to the join formulation's
    * min(struct(dist, cid)) on any input.
    */
  def encode(v: ArrayData, flat: Array[Float], k: Int, m: Int, subDim: Int,
      bits: Int): Long = {
    val dim = m * subDim
    val vn = v.numElements()
    var word = 0L
    var j = 0
    while (j < m) {
      val off = j * subDim
      var bestC = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = c * dim + off
        val n = math.max(0, math.min(math.min(vn, dim) - off, subDim))
        var acc = 0.0
        var i = 0
        while (i < n) {
          val d = v.getFloat(off + i).toDouble - flat(base + i).toDouble
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; bestC = c }
        c += 1
      }
      word |= bestC.toLong << (bits * j)
      j += 1
    }
    word
  }
}

/** Per-row coarse residual: v − cents[argmin_c ||v − c||²], element-wise
  * (v_i − c_i) computed in double and rounded to FLOAT (exactly the
  * IEEE-defined value both engines produce, so the DuckDB oracle can
  * mirror it with CAST(... AS FLOAT)). The codebook must be the m=1
  * full-vector shape [[Pq.coarseAssign]] uses; argmin semantics are
  * IDENTICAL to it (same kernel).
  */
case class PqResidual(child: Expression, cb: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cb.m == 1, s"residual codebook must be the m=1 coarse shape, got m=${cb.m}")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_residual"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<FLOAT> vectors, got $t")
    }

  override protected def nullSafeEval(v: Any): Any =
    PqResidual.compute(v.asInstanceOf[ArrayData], cb.flat, cb.k, cb.subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("coarseCodebook", cb.flat, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.PqResidual.compute($c, $cbRef, ${cb.k}, ${cb.subDim})")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Residual against a GIVEN list's centroid (no argmin): element-wise
  * (v_i − cent_list_i) in double rounded to float — [[PqResidual]]'s
  * subtraction step alone, for callers that already carry the coarse
  * assignment as a column.
  */
case class PqResidualAt(left: Expression, right: Expression, cb: PqCodebook)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(cb.m == 1, s"residual codebook must be the m=1 coarse shape, got m=${cb.m}")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "graft_pq_residual_at"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (ARRAY<FLOAT>, INT/BIGINT list), got ($a, $b)")
    }

  override protected def nullSafeEval(v: Any, l: Any): Any = {
    val list = l match {
      case i: java.lang.Integer => i.intValue
      case j: java.lang.Long => j.intValue
    }
    PqResidualAt.compute(v.asInstanceOf[ArrayData], list, cb.flat, cb.subDim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("coarseCodebook", cb.flat, "float[]")
    defineCodeGen(ctx, ev, (v, l) =>
      s"graft.operators.PqResidualAt.compute($v, (int)($l), $cbRef, ${cb.subDim})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqResidualAt {
  def compute(v: ArrayData, list: Int, flat: Array[Float], dim: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val c = if (i < dim) flat(list * dim + i).toDouble else 0.0
      out(i) = (v.getFloat(i).toDouble - c).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object PqResidual {
  /** Argmin via the [[PqEncodeWord]] kernel (m=1, bits irrelevant at
    * j=0), then the element-wise double subtraction rounded to float.
    * Dimensions past the codebook width pass through unchanged
    * (mirrors the encode kernel's slice clamping).
    */
  def compute(v: ArrayData, flat: Array[Float], k: Int, dim: Int): ArrayData = {
    val best = PqEncodeWord.encode(v, flat, k, 1, dim, 0).toInt
    val n = v.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val c = if (i < dim) flat(best * dim + i).toDouble else 0.0
      out(i) = (v.getFloat(i).toDouble - c).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Σ_j table[j*k + code_j(codes)] — the ADC lookup over a packed PQ
  * code word, as a codegen'd expression (8 array reads per row inside
  * whole-stage codegen). `bits` is the per-subspace code width (4 →
  * nibble codes against a 128-double table, 8 → byte codes against a
  * 2048-double table).
  */
case class PqAdcScore(codes: Expression, table: Expression, bits: Int = 4)
    extends Expression {
  override def children: Seq[Expression] = Seq(codes, table)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = codes.nullable || table.nullable
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (codes.dataType, table.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (c, t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (BIGINT codes, ARRAY<DOUBLE> table), got ($c, $t)")
    }

  override def eval(input: InternalRow): Any = {
    val c = codes.eval(input)
    if (c == null) return null
    val t = table.eval(input)
    if (t == null) return null
    PqAdcScore.lookup(c.asInstanceOf[Long], t.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = codes.genCode(ctx)
    val t = table.genCode(ctx)
    val anyNull = if (nullable) s"${c.isNull} || ${t.isNull}" else "false"
    val code =
      code"""
        ${c.code}
        ${t.code}
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.operators.PqAdcScore.lookup(${c.value}, ${t.value}, $bits);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0), table = newChildren(1))
}

object PqAdcScore {
  /** The 8-lookup kernel (ascending j, like the join formulation). */
  def lookup(codes: Long, table: ArrayData, bits: Int): Double = {
    val k = 1 << bits
    val mask = (k - 1).toLong
    var acc = 0.0
    var j = 0
    while (j < Pq.M) {
      val c = ((codes >>> (bits * j)) & mask).toInt
      acc += table.getDouble(j * k + c)
      j += 1
    }
    acc
  }
}
