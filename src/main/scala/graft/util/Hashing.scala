package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic 60-bit hash, identical in Spark and DuckDB.
  *
  * Spark's xxhash64/hash and DuckDB's hash() are different algorithms,
  * so sketch operators (MinHash, SimHash, LSH) built on them could
  * never be oracle-checked. Instead: md5 (bit-identical everywhere) →
  * first 15 hex chars → integer. 60 bits, always nonnegative, safe in
  * BIGINT arithmetic on both engines.
  *
  * Salting gives the independent hash families MinHash/LSH need:
  * `phash(c, "3_")` is hash function #3.
  */
object Hashing {
  // the native Md5Word expression computes the identical value
  // (digest bytes shifted instead of hex render + NumberConverter
  // parse — ~2× less per-call CPU); the SQL twins below are the
  // definition both forms match
  def phash(c: Column, salt: String = ""): Column =
    graft.functions.Md5Word(c, salt, hi = false)

  def phashSql(x: String, salt: String = ""): String =
    s"CAST(('0x' || substr(md5('$salt' || $x), 1, 15)) AS BIGINT)"

  /** Second independent 60-bit value from the SAME md5 (hex chars
    * 17..31) — when an operator needs two hash words per input
    * (SimHash's 64 bit-votes), this halves the md5 count. */
  def phashHi(c: Column, salt: String = ""): Column =
    graft.functions.Md5Word(c, salt, hi = true)

  def phashHiSql(x: String, salt: String = ""): String =
    s"CAST(('0x' || substr(md5('$salt' || $x), 17, 15)) AS BIGINT)"
}
