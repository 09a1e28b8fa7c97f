package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Dedup
import graft.functions.MinHashSig

/** Native-expression guards: the fused [[MinHashSig]] must be
  * bit-identical to the composed transform+array_min form it
  * replaced (the oracle SQL still IS that composed form), stay
  * inside whole-stage codegen, and honor the empty/null edge
  * semantics of the original. */
class FunctionsSpec extends AnyFunSuite {
  import TestSpark._

  private def composed(c: org.apache.spark.sql.Column) =
    array(Dedup.affine.map { case (a, b) =>
      array_min(transform(c, h => (lit(a) * h + lit(b)) % Dedup.MODP))
    }: _*)

  test("MinHashSig equals the composed transform+array_min form on real data") {
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), array_distinct(transform(
        split(col("text"), "\\s+"),
        t => graft.util.Hashing.phash(t, "ng_") % 4294967296L)).as("hs"))
    val both = docs.select(col("doc_id"),
      MinHashSig(col("hs"), Dedup.affine, Dedup.MODP).as("fused"),
      composed(col("hs")).as("ref"))
    assert(both.filter(not(col("fused") <=> col("ref"))).count() == 0,
      "fused minhash diverges from the composed form")
  }

  test("MinHashSig yields K nulls on BOTH empty and null input (composed-form parity)") {
    // the composed form gives array(NULL×K) for null hs too:
    // transform(NULL)=NULL, array_min(NULL)=NULL, array(NULL..) is a
    // NON-null array — a null text row must not diverge from the
    // oracle (the sf1-replica class of red)
    val df = spark.range(1).select(
      MinHashSig(array().cast("array<long>"), Dedup.affine, Dedup.MODP).as("e"),
      MinHashSig(lit(null).cast("array<long>"), Dedup.affine, Dedup.MODP).as("n"),
      composed(lit(null).cast("array<long>")).as("ref"))
    val row = df.head()
    val e = row.getSeq[Any](0)
    assert(e.length == Dedup.affine.length && e.forall(_ == null),
      "empty input must give K null minima (array_min-of-empty semantics)")
    assert(!row.isNullAt(1), "null input must give the K-null array, not NULL")
    assert(row.getSeq[Any](1) == row.getSeq[Any](2),
      "null-input result diverged from the composed form")
  }

  test("MinHashSig interpreted eval matches codegen") {
    // nullSafeEval is the non-codegen fallback path (used by e.g.
    // constant folding); pin it against the codegen'd column result
    val hs = Array(17L, 4294967295L, 0L, 123456789L)
    val expr = MinHashSig(
      org.apache.spark.sql.catalyst.expressions.Literal.create(hs,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
      Dedup.affine.map(_._1), Dedup.affine.map(_._2), Dedup.MODP)
    val interp = expr.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    val viaPlan = spark.range(1)
      .select(MinHashSig(lit(hs).cast("array<long>"), Dedup.affine, Dedup.MODP))
      .head().getSeq[Long](0)
    assert(interp == viaPlan.toSeq)
    // and against the definition itself
    val want = Dedup.affine.map { case (a, b) => hs.map(h => (a * h + b) % Dedup.MODP).min }
    assert(interp == want)
  }

  test("MinHashSig supports whole-stage codegen (unlike the HOF form it replaced)") {
    // the composed transform+array_min form is CodegenFallback (all
    // higher-order functions are), so it could NEVER join a codegen
    // span. Over a codegen-supported child, the fused expression must
    // keep the projection inside WholeStageCodegen ('*(n)' markers).
    val df = spark.range(100)
      .select(array(col("id"), col("id") * 7 + 3).as("hs"))
      .select(MinHashSig(col("hs"), Dedup.affine, Dedup.MODP).as("sig"))
    assert(df.count() == 100)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("minhash_sig"), "fused expression absent from the plan")
    val projLine = p.linesIterator.find(_.contains("minhash_sig")).getOrElse("")
    assert(projLine.contains("*("),
      s"projection fell out of whole-stage codegen: $projLine")
  }
}
