package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashes: identical values are computable in any
  * engine with an md5 function (the DuckDB oracle replicates them
  * exactly), unlike Spark's murmur3 `hash()` or DuckDB's internal
  * `hash()`. md5 is used as a mixing function, not for security.
  *
  * Codegen note: md5/conv/substring are all Catalyst expressions with
  * whole-stage codegen — no UDF boundary in the hot path.
  */
object Hashes {

  /** 32-bit hash: first 8 hex chars of md5 as a non-negative long.
    * Oracle equivalent: `('0x' || substr(md5(c),1,8))::BIGINT`. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit hash: first 15 hex chars of md5 — fits a signed 64-bit int
    * with headroom. Oracle: `('0x' || substr(md5(c),1,15))::BIGINT`. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash permutation j applied to a 32-bit hash: (a_j·h + b_j) mod p
    * with p prime > 2^32; products stay < 2^63. */
  def minhashPerm(h: Column, j: Int): Column =
    (h * lit(2L * j + 1L) + lit(j * 12345L)) % lit(4294967311L)

  /** 128-bit content fingerprint as hex (md5 of whitespace-normalized
    * lowercased text) — exact-dedup / citation key. */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))
}
