package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftExtensions

/** SQL-surface registration tests: a session built
  * `.withExtensions(new GraftExtensions)` must expose every native
  * expression as a SQL function with the Column-API semantics. */
class ExtensionsSpec extends AnyFunSuite {

  // a genuinely separate session (same SparkContext) so withExtensions
  // actually applies — getOrCreate would return TestSpark's session
  private lazy val extSpark: SparkSession = {
    TestSpark.spark.sparkContext // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(TestSpark.spark)
    SparkSession.setActiveSession(TestSpark.spark)
    s
  }

  test("long_dot is SQL-callable with Column-API semantics") {
    val r = extSpark.sql(
      """SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
                long_dot(array(1L), array(1L, 2L)) AS mismatch""").head()
    assert(r.getLong(0) == 32L)
    assert(r.isNullAt(1))
  }

  test("scaled_dist_sq is SQL-callable") {
    val r = extSpark.sql(
      "SELECT scaled_dist_sq(array(4L), array(2L), 3L) AS d").head()
    assert(r.getLong(0) == 100L) // (4*3 - 2)^2
  }

  test("hyperplane_bucket folds its plane-matrix literal") {
    val r = extSpark.sql(
      """SELECT hyperplane_bucket(array(5L, -1L),
                  array(array(1L, -1L), array(-1L, 1L))) AS b""").head()
    assert(r.getLong(0) == 1L) // plane0: 6 > 0 -> bit0; plane1: -6 -> no bit
    val err = intercept[Exception] {
      extSpark.sql("SELECT hyperplane_bucket(array(1L), array(array(id))) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("literal"),
      s"non-literal planes must be rejected clearly, got: ${err.getMessage}")
  }

  test("window_minima is SQL-callable with a folded window literal") {
    val r = extSpark.sql(
      "SELECT window_minima(array(9L, 3L, 7L, 8L, 1L), 4) AS m").head()
    assert(r.getSeq[Long](0) == Seq(1L, 3L)) // windows [9,3,7,8]->3, [3,7,8,1]->1
  }

  test("minhash_sig is SQL-callable and matches the Column API") {
    val viaSql = extSpark.sql(
      """SELECT minhash_sig(array(17L, 99L), array(3L, 5L), array(7L, 11L),
                            2147483647L) AS sig""").head().getSeq[Long](0)
    val want = Seq(Seq(3L * 17 + 7, 3L * 99 + 7).min % 2147483647L,
                   Seq(5L * 17 + 11, 5L * 99 + 11).min % 2147483647L)
    assert(viaSql == want)
  }

  test("null elements and empty matrices in literals are rejected clearly") {
    val e1 = intercept[Exception] {
      extSpark.sql(
        """SELECT minhash_sig(array(1L), array(1L, CAST(NULL AS BIGINT)),
                              array(1L, 2L), 7L)""").collect()
    }
    assert(e1.getMessage.contains("without nulls"),
      s"null array element must be rejected clearly, got: ${e1.getMessage.take(200)}")
    val e2 = intercept[Exception] {
      extSpark.sql(
        "SELECT hyperplane_bucket(array(1L), array(array(1L, CAST(NULL AS BIGINT))))")
        .collect()
    }
    assert(e2.getMessage.contains("nulls"),
      s"null matrix element must be rejected clearly, got: ${e2.getMessage.take(200)}")
    val e3 = intercept[Exception] {
      extSpark.sql(
        "SELECT hyperplane_bucket(array(1L), CAST(array() AS ARRAY<ARRAY<BIGINT>>))")
        .collect()
    }
    assert(e3.getMessage.contains("non-empty"),
      s"empty planes matrix must be rejected clearly, got: ${e3.getMessage.take(200)}")
    val e4 = intercept[Exception] {
      extSpark.sql(
        "SELECT hyperplane_bucket(array(1L), array(array(1L), array(2L, 3L)))")
        .collect()
    }
    assert(e4.getMessage.contains("equal-length"),
      s"ragged matrix must be rejected clearly, got: ${e4.getMessage.take(200)}")
  }

  test("the base session is unaffected by the extension registration") {
    val err = intercept[Exception] {
      TestSpark.spark.sql("SELECT long_dot(array(1L), array(1L))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("unresolved") ||
      err.getMessage.toLowerCase.contains("cannot be resolved") ||
      err.getMessage.toLowerCase.contains("undefined"),
      s"unexpected error class: ${err.getMessage.take(200)}")
  }
}
