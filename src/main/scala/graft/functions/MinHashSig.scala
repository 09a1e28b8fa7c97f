package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused K-way MinHash signature as a native Catalyst expression.
  *
  * Semantically identical to the composed form it replaces
  * (`array(affine.map((a,b) => array_min(transform(hs, h => (a*h+b) %
  * MODP))))` — [[graft.ext.Dedup.signaturesOf]]), so the DuckDB
  * oracle twins are untouched. The composed plan materializes K
  * transformed copies of the hash array (K array allocations +
  * K·|hs| boxed writes per row) and then K array_min passes; this
  * expression makes ONE pass over the array holding K running minima
  * in a primitive long[] — no intermediate allocation, and the loop
  * lives inside whole-stage codegen via [[doGenCode]] (the "custom
  * Expression beats UDF" tier of the extension ladder: a Scala UDF
  * here would box every element and break the codegen span).
  *
  * Overflow contract (same as the composed form, asserted by
  * DedupSpec): inputs are 32-bit hash values (h < 2^32) and a ≤
  * 2^31-1, so a·h + b ≤ (2^31-2)(2^32-1) + MODP < 2^63 — exact in
  * Java long and in DuckDB BIGINT alike.
  *
  * Empty input yields K nulls — exactly what `array_min` of an empty
  * transform yields, so degenerate docs keep their oracle semantics.
  */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long], modp: Long)
  extends UnaryExpression {

  private val k = as.length
  require(bs.length == k, "coefficient arrays must have equal length")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) new GenericArrayData(new Array[Any](k))
    else {
      val mins = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % modp
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    val gad = classOf[GenericArrayData].getName
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$k]);
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $c.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${modp}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new $gad($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Column-API entry point: `minhashSig($"hs", affine, MODP)`. */
  def apply(c: Column, coeffs: Seq[(Long, Long)], modp: Long): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c),
      coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, modp))
}
