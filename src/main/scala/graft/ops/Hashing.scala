package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing.
  *
  * The correctness gate hash-compares Spark output against a DuckDB oracle, so
  * every hash the engine exposes must be computable bit-identically in both
  * engines. We derive a 60-bit non-negative integer from the first 15 hex chars
  * of md5 (UTF-8 bytes) — `conv` on the Spark side, a per-character fold on the
  * DuckDB side (DuckDB has no hex→int conversion; its `md5_number_*` halves are
  * little-endian and therefore awkward to reproduce portably).
  *
  * 60 bits keeps every intermediate (including small sums of hashes, used for
  * order-independent band signatures) comfortably inside a signed int64 even
  * with ANSI overflow checking enabled.
  */
object Hashing {

  /** 60-bit hash of a string column: first 15 hex chars of md5, base-16. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: rehash with a seed suffix (classic minhash family
    * h_j(s) = H(s ++ "#" ++ j) — avoids 64-bit modular multiplication, which
    * neither engine can express without overflow).
    */
  def hash60Seeded(c: Column, seed: Int): Column =
    hash60(concat(c.cast("string"), lit("#" + seed)))

  /** DuckDB SQL fragment computing the same 60-bit hash of expression `e`.
    * `e` must be a SQL expression of type VARCHAR. Evaluates md5 once per
    * character via the inner alias to stay a single expression.
    */
  def duckHash60(e: String): String =
    s"""list_reduce(list_transform(range(1,16), hxi -> CAST(CASE WHEN substring(md5($e), hxi, 1) BETWEEN '0' AND '9' THEN ascii(substring(md5($e), hxi, 1)) - 48 ELSE ascii(substring(md5($e), hxi, 1)) - 87 END AS BIGINT)), (hxa, hxb) -> hxa * 16 + hxb)"""

  /** DuckDB fragment for the seeded variant. */
  def duckHash60Seeded(e: String, seed: Int): String =
    duckHash60(s"($e || '#$seed')")

  /** DuckDB fragment folding an ALREADY-COMPUTED md5 hex column `m` (cheap
    * path for hot oracle queries: compute `md5(x) AS m` once in a CTE, then
    * fold its first 15 chars — avoids re-evaluating md5 per character).
    */
  def duckFoldHexCol(m: String): String =
    s"""list_reduce(list_transform(range(1,16), hxi -> CAST(CASE WHEN substring($m, hxi, 1) BETWEEN '0' AND '9' THEN ascii(substring($m, hxi, 1)) - 48 ELSE ascii(substring($m, hxi, 1)) - 87 END AS BIGINT)), (hxa, hxb) -> hxa * 16 + hxb)"""
}
