package graft.registry

/** SQL fragments shared across the registry oracle builders — the
  * cross-engine spellings of hash primitives DuckDB lacks as
  * built-ins. Kept in one place so the dedup, pipeline, and text
  * oracles hash identically by construction. */
object OracleSql {

  /** hex→int of the first 8 hex digits of md5-expression `h` as an
    * explicit 8-term polynomial (DuckDB has no conv(); md5 hex digits
    * are 0-9a-f, so ascii < 58 ⟺ decimal digit). Mirrors the Spark
    * side's `conv(substring(md5(x), 1, 8), 16, 10)`. */
  def hex8(h: String): String = (1 to 8).map { i =>
    val a = s"ascii(substring($h, $i, 1))"
    val pow = math.pow(16, 8 - i).toLong
    s"(($a - (CASE WHEN $a < 58 THEN 48 ELSE 87 END)) * CAST($pow AS BIGINT))"
  }.mkString("(", " + ", ")")

  /** The MinHash mixer `(a_j·base + b_j) mod P` with the library's
    * constants ([[graft.dedup.Dedup.P]] and the 2654435761/40503
    * multipliers) — `j` and `base` are SQL expressions. */
  def mix(j: String, base: String): String =
    s"((((2654435761 * (($j) + 1)) % 2147483647) * ($base)" +
      s" + ((40503 * (($j) + 7)) % 2147483647)) % 2147483647)"
}
