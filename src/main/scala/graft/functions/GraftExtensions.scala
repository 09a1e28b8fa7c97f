package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType}

/** SQL-surface registration for the graft native expressions — the
  * standard library packaging (`SparkSessionExtensions` +
  * `injectFunction`) so a pure-SQL user gets the fused kernels
  * without touching the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * ...
  * spark.sql("SELECT long_dot(a, b), hyperplane_bucket(v, array(array(1,-1), ...))")
  * }}}
  *
  * `minhash_sig(hs, as, bs, modp)` and `hyperplane_bucket(v, planes)`
  * take their coefficient matrices as array LITERALS (they are plan
  * constants in every pipeline use); the builders fold them at
  * registration so the underlying expressions keep their primitive
  * Seq fields — and their structural-equality/CSE behavior —
  * unchanged.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(longDotDesc)
    ext.injectFunction(scaledDistSqDesc)
    ext.injectFunction(hyperplaneBucketDesc)
    ext.injectFunction(minHashSigDesc)
    ext.injectFunction(windowMinimaDesc)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** A foldable `array<bigint>` argument (a SQL `array(…)` of
    * constants is a CreateArray, not yet a Literal, when the builder
    * runs) evaluated to a Scala Seq. */
  private def longSeq(e: Expression, fn: String): Seq[Long] = e match {
    case _ if e.resolved && e.foldable &&
        e.dataType.isInstanceOf[ArrayType] &&
        e.dataType.asInstanceOf[ArrayType].elementType == LongType =>
      val a = e.eval().asInstanceOf[ArrayData]
      if (a == null || (0 until a.numElements()).exists(a.isNullAt))
        throw new IllegalArgumentException(
          s"$fn expects a foldable array<bigint> literal without nulls, got ${e.sql}")
      a.toLongArray.toSeq
    case _ => throw new IllegalArgumentException(
      s"$fn expects a foldable array<bigint> literal, got ${e.sql}")
  }

  /** A foldable `array<array<bigint>>` argument evaluated to rows —
    * validated non-empty, null-free, and rectangular here so the
    * constructed expression never sees a matrix its eval/codegen paths
    * can't handle (a nullable literal is resolved+foldable and would
    * otherwise surface as an opaque NPE deep in ArrayData). */
  private def longMatrix(e: Expression, fn: String): Seq[Seq[Long]] = e.dataType match {
    case ArrayType(ArrayType(LongType, _), _) if e.resolved && e.foldable =>
      val a = e.eval().asInstanceOf[ArrayData]
      if (a == null || a.numElements() == 0 ||
          (0 until a.numElements()).exists(a.isNullAt))
        throw new IllegalArgumentException(
          s"$fn expects a non-empty foldable array<array<bigint>> literal without null rows, got ${e.sql}")
      val rows = (0 until a.numElements()).map { i =>
        val r = a.getArray(i)
        if ((0 until r.numElements()).exists(r.isNullAt))
          throw new IllegalArgumentException(
            s"$fn matrix rows must not contain nulls, got ${e.sql}")
        r.toLongArray.toSeq
      }
      if (rows.exists(_.length != rows.head.length) || rows.head.isEmpty)
        throw new IllegalArgumentException(
          s"$fn matrix rows must be non-empty and equal-length, got ${e.sql}")
      rows
    case _ => throw new IllegalArgumentException(
      s"$fn expects a foldable array<array<bigint>> literal, got ${e.sql}")
  }

  val longDotDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("long_dot"),
    info("long_dot", "long_dot(a, b) - exact integer dot product of two array<bigint>"),
    { args =>
      require(args.length == 2, "long_dot takes (a, b)")
      LongDot(args(0), args(1))
    })

  val scaledDistSqDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("scaled_dist_sq"),
    info("scaled_dist_sq",
      "scaled_dist_sq(x, s, k) - sum((x_i*k - s_i)^2) over two array<bigint> and a bigint"),
    { args =>
      require(args.length == 3, "scaled_dist_sq takes (x, s, k)")
      ScaledDistSq(args(0), args(1), args(2))
    })

  val hyperplaneBucketDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hyperplane_bucket"),
    info("hyperplane_bucket",
      "hyperplane_bucket(v, planes) - packed sign bits of the plane dots; planes is an array<array<bigint>> literal"),
    { args =>
      require(args.length == 2, "hyperplane_bucket takes (v, planes)")
      HyperplaneBucket(args(0), longMatrix(args(1), "hyperplane_bucket"))
    })

  val windowMinimaDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("window_minima"),
    info("window_minima",
      "window_minima(hs, w) - sorted distinct minima of every w-wide sliding window; w an integer literal"),
    { args =>
      require(args.length == 2, "window_minima takes (hs, w)")
      val w = args(1) match {
        case e if e.resolved && e.foldable &&
            (e.dataType == LongType || e.dataType == org.apache.spark.sql.types.IntegerType) =>
          e.eval() match {
            case l: Long => l.toInt
            case i: Integer => i.intValue
          }
        case e => throw new IllegalArgumentException(
          s"window_minima w must be an integer literal, got ${e.sql}")
      }
      WindowMinima(args(0), w)
    })

  val minHashSigDesc: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    info("minhash_sig",
      "minhash_sig(hs, as, bs, modp) - K-way MinHash signature; as/bs are array<bigint> literals, modp a bigint literal"),
    { args =>
      require(args.length == 4, "minhash_sig takes (hs, as, bs, modp)")
      val modp = args(3) match {
        case e if e.resolved && e.foldable && e.dataType == LongType =>
          e.eval().asInstanceOf[Long]
        case e => throw new IllegalArgumentException(
          s"minhash_sig modp must be a bigint literal, got ${e.sql}")
      }
      MinHashSig(args(0), longSeq(args(1), "minhash_sig"),
        longSeq(args(2), "minhash_sig"), modp)
    })
}
