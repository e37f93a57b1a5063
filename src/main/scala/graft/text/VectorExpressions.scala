package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Static kernels for float-vector math. Operate on Spark's ArrayData
  * directly (primitive access, no per-element boxing) and accumulate in
  * double with the same left-to-right order as `functions.aggregate` —
  * results are bit-identical to the HOF formulation, just ~10x cheaper
  * per row (no lambda dispatch, no intermediate zipped array).
  */
object VecKernels {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Squared L2 distance between the [off, off+len) SLICES of two
    * ARRAY<FLOAT> vectors — the subspace-distance kernel of product
    * quantization (one call per PQ subspace). Double accumulation,
    * ascending index order (bit-identical to an explicit per-element
    * SQL expansion in the same order). Slices past either vector's end
    * contribute nothing.
    */
  def subL2FF(a: ArrayData, b: ArrayData, off: Int, len: Int): Double = {
    val n = math.min(math.min(a.numElements(), b.numElements()) - off, len)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(off + i).toDouble - b.getFloat(off + i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  /** Equi-join match count of two SORTED ARRAY<BIGINT> columns: the
    * exact number of row pairs `a JOIN b ON a.v = b.v` would emit
    * (duplicate runs multiply, ra*rb per value — bit-identical to the
    * join-count formulation, so swapping a join+aggregate for this
    * kernel can never change a result). Two-pointer merge, O(|a|+|b|).
    */
  def sortedJoinCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val va = a.getLong(i); val vb = b.getLong(j)
      if (va < vb) i += 1
      else if (va > vb) j += 1
      else {
        var ra = 0L; var rb = 0L
        while (i < na && a.getLong(i) == va) { ra += 1; i += 1 }
        while (j < nb && b.getLong(j) == va) { rb += 1; j += 1 }
        c += ra * rb
      }
    }
    c
  }
}

/** Join-match count over two sorted ARRAY<BIGINT> columns as a
  * codegen'd expression — the vectorized replacement for the
  * "explode both sides, equi-join, count per pair" shape whose
  * intermediate row count is |pairs| x |elements| (the candidate
  * verification hot spot at scale).
  */
case class SortedJoinCount(left: Expression, right: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_sorted_join_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires ARRAY<BIGINT> inputs")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    VecKernels.sortedJoinCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val anyNull =
      if (nullable) s"${l.isNull} || ${r.isNull}" else "false"
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${ev.value} = graft.text.VecKernels.sortedJoinCount(${l.value}, ${r.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** dot(a, b) over two ARRAY<FLOAT> columns as a codegen'd expression. */
case class FloatVecDot(left: Expression, right: Expression) extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_vec_dot"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT> inputs")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    VecKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val anyNull =
      if (nullable) s"${l.isNull} || ${r.isNull}" else "false"
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.text.VecKernels.dotFF(${l.value}, ${r.value});
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

/** Squared L2 distance over a SLICE of two ARRAY<FLOAT> columns as a
  * codegen'd expression — the per-subspace distance of product
  * quantization. `off`/`len` are plan-time constants (one expression
  * instance per subspace), so codegen emits a direct kernel call with
  * literal bounds.
  */
case class FloatVecSubL2(left: Expression, right: Expression, off: Int, len: Int)
    extends Expression {
  override def children: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_vec_sub_l2"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }) && off >= 0 && len >= 0
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName requires ARRAY<FLOAT> inputs and off/len >= 0")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    VecKernels.subL2FF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], off, len)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val anyNull =
      if (nullable) s"${l.isNull} || ${r.isNull}" else "false"
    val code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = $anyNull;
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.text.VecKernels.subL2FF(${l.value}, ${r.value}, $off, $len);
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}

object VectorExpressions {
  /** Codegen'd double-precision dot product of two ARRAY<FLOAT> columns. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen'd squared L2 distance over the [off, off+len) slice of two
    * ARRAY<FLOAT> columns (PQ subspace distance).
    */
  def vecSubL2(a: Column, b: Column, off: Int, len: Int): Column =
    Bridge.column(FloatVecSubL2(Bridge.expression(a), Bridge.expression(b), off, len))

  /** Codegen'd equi-join match count of two sorted ARRAY<BIGINT> columns. */
  def sortedJoinCount(a: Column, b: Column): Column =
    Bridge.column(SortedJoinCount(Bridge.expression(a), Bridge.expression(b)))
}
