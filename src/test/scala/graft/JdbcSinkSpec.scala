package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.StarEtl

/** The reference's literal sink is MySQL over DBI
  * (`real_parse.pl:96-177`); the Spark equivalent is
  * `format("jdbc")`. Round-trips the access projection through an
  * embedded Derby database (the JDBC engine Spark ships) — batched
  * INSERTs instead of the reference's one-row-per-statement with
  * `LOCK TABLES`. */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("access table round-trips through a JDBC sink") {
    val db = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val access = StarEtl.wideParsed(spark, sf)
      .select(col("line_id"), col("client_ip_address"), col("datetime"),
        col("status_code"), col("bytes_sent"))

    access.write.format("jdbc")
      .option("url", url)
      .option("dbtable", "access")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("batchsize", "500")   // batched inserts, not row-at-a-time
      .mode("overwrite")
      .save()

    val back = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", "access")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
    assert(back.count() == 1000)
    assert(back.agg(sum("bytes_sent").cast("long")).head().getLong(0) ==
      access.agg(sum("bytes_sent").cast("long")).head().getLong(0))
    // and the incremental watermark read the reference does (S6):
    val wm = back.agg(max("datetime")).head().getTimestamp(0)
    assert(wm != null)
  }
}
