package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer dot product over two `array<bigint>` columns as a
  * native Catalyst expression.
  *
  * Semantically identical to the composed form it replaces
  * (`aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)` —
  * [[graft.ext.Similarity]]), so the DuckDB oracle twins are
  * untouched. The composed plan allocates the zipped product array
  * per row and folds it through two interpreted lambda calls per
  * element (higher-order functions are CodegenFallback); this
  * expression is ONE primitive loop inside whole-stage codegen.
  *
  * Null parity with the composed form (asserted by FunctionsSpec):
  * null input → null; length mismatch → null (zip_with pads the
  * shorter side with null, null product poisons the fold); any null
  * element → null; two empty arrays → 0 (the fold's initial value).
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_dot requires two array<bigint> inputs, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_dot"

  override def eval(input: InternalRow): Any = {
    val lv = left.eval(input)
    if (lv == null) return null
    val rv = right.eval(input)
    if (rv == null) return null
    val la = lv.asInstanceOf[ArrayData]
    val ra = rv.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != ra.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc += la.getLong(i) * ra.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val n = ctx.freshName("n")
    val i = ctx.freshName("i")
    val acc = ctx.freshName("acc")
    val nullElem = ctx.freshName("nullElem")
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = 0L;
      if (!${leftGen.isNull} && !${rightGen.isNull}) {
        final int $n = ${leftGen.value}.numElements();
        if ($n == ${rightGen.value}.numElements()) {
          long $acc = 0L;
          boolean $nullElem = false;
          for (int $i = 0; $i < $n; $i++) {
            if (${leftGen.value}.isNullAt($i) || ${rightGen.value}.isNullAt($i)) {
              $nullElem = true; break;
            }
            $acc += ${leftGen.value}.getLong($i) * ${rightGen.value}.getLong($i);
          }
          if (!$nullElem) { ${ev.isNull} = false; ${ev.value} = $acc; }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Column-API entry point: `LongDot($"a", $"b")`. */
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Fused P-plane LSH sign-bucket as a native Catalyst expression: the
  * [[MinHashSig]] one-pass trick applied to hyperplane bucketing.
  *
  * Semantically identical to the composed form it replaces
  * (`Σ_p when(dot(w_p, qv) > 0, 1<<p).otherwise(0)` —
  * [[graft.ext.Similarity]] bucketWith), which evaluates P interpreted
  * zip_with+fold pairs per row, each allocating an intermediate
  * array. This expression makes ONE pass over the vector holding P
  * running sums in a primitive long[].
  *
  * Null parity with the composed form (asserted by FunctionsSpec):
  * a null vector, length mismatch, or any null element turns EVERY
  * plane's dot null, and `when(null > 0, …).otherwise(0)` picks 0 for
  * each — so the bucket is 0, never null. Hence never-null, encoded
  * directly in [[eval]]/[[doGenCode]].
  *
  * Planes are a Seq-of-Seq field so case-class equality is structural
  * (Catalyst CSE can match separately-built instances).
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Long]])
  extends UnaryExpression {

  private val p = planes.length
  private val dim = planes.head.length
  require(planes.forall(_.length == dim), "ragged plane matrix")
  require(p <= 62, "bucket bits exceed a long")
  // plane-major flat matrix: w[j*dim + i] = planes(j)(i)
  @transient private lazy val flat: Array[Long] =
    planes.flatten.toArray

  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires array<bigint> input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return 0L
    val arr = value.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return 0L
    val sums = new Array[Long](p)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return 0L
      val x = arr.getLong(i)
      var j = 0
      while (j < p) {
        sums(j) += flat(j * dim + i) * x
        j += 1
      }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < p) {
      if (sums(j) > 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val wRef = ctx.addReferenceObj("planes", flat, "long[]")
    val childGen = child.genCode(ctx)
    val sums = ctx.freshName("sums")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val x = ctx.freshName("x")
    val ok = ctx.freshName("ok")
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = 0L;
      if (!${childGen.isNull} && ${childGen.value}.numElements() == $dim) {
        final long[] $sums = new long[$p];
        boolean $ok = true;
        for (int $i = 0; $i < $dim && $ok; $i++) {
          if (${childGen.value}.isNullAt($i)) { $ok = false; break; }
          final long $x = ${childGen.value}.getLong($i);
          for (int $j = 0; $j < $p; $j++) {
            $sums[$j] += $wRef[$j * $dim + $i] * $x;
          }
        }
        if ($ok) {
          for (int $j = 0; $j < $p; $j++) {
            if ($sums[$j] > 0) ${ev.value} |= 1L << $j;
          }
        }
      }
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  /** Column-API entry point: `HyperplaneBucket($"qv", planes)`. */
  def apply(c: Column, planes: Seq[Seq[Long]]): Column =
    GraftColumnBridge.column(HyperplaneBucket(
      GraftColumnBridge.expression(c), planes))
}
