package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine deterministic hashing shared by the LLM-data-pipeline
 * operators ([[graft.pipeline.DataOps]]) and their DuckDB oracles
 * ([[graft.oracle.OracleSqlData]]).
 *
 * The one primitive both engines compute bit-identically is MD5 over UTF-8
 * bytes. [[hash60]] takes the first 15 hex digits (60 bits, always
 * non-negative, fits BIGINT):
 *
 *   Spark :  CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
 *   DuckDB:  CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)
 *
 * MinHash permutations are affine maps over the Mersenne prime
 * P = 2^31 - 1: h_i(x) = (a_i · (x mod P) + b_i) mod P, with
 * a_i = ((2i+1) · 2654435761) mod P (Knuth's multiplicative constant) and
 * b_i = (i · 2246822519) mod P (xxHash prime). Operands stay < 2^62, so
 * the arithmetic is exact int64 in both engines — no float, no overflow.
 */
object HashFns {

  /** Mersenne prime 2^31 - 1: modulus of the MinHash permutations. */
  val P: Long = 2147483647L

  /** 60-bit MD5-prefix hash — deterministic and identical in DuckDB. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash60 reduced mod P (input to the MinHash permutations). */
  def hashP(c: Column): Column = pmod(hash60(c), lit(P))

  def aCoef(i: Int): Long = ((2L * i + 1L) * 2654435761L) % P
  def bCoef(i: Int): Long = (i.toLong * 2246822519L) % P

  /** i-th MinHash permutation of an already-mod-P hash column. */
  def permHash(i: Int, hp: Column): Column =
    (lit(aCoef(i)) * hp + lit(bCoef(i))) % P
}
