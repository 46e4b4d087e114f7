package graft

/** Static lint over the DuckDB oracle SQL in [[SparkEntry.oracleSql]].
  *
  * DuckDB evaluates SUM over integer inputs as HUGEINT; the driver's
  * compare materializes that as float64 while Spark writes int64, so the
  * row hash differs even when every value is identical. This exact bug
  * cost green gate rows in round 1 (q16) and round 2 (q22/q23), so it is
  * now rejected statically. A SUM/list_sum is accepted only when its
  * result type is pinned:
  *
  *   - `CAST(SUM(...) AS ...)` — result explicitly typed, or
  *   - `SUM(CAST(... AS DECIMAL/DOUBLE/FLOAT/REAL ...) ...)` — DuckDB
  *     keeps decimal/double sums decimal/double (never HUGEINT); the
  *     outer query is expected to cast the surfaced column.
  *
  * Anything else — in particular a bare `SUM(int_col)` — is a violation.
  * [[Verify]] fails fast on violations so a bad oracle never reaches the
  * driver's DuckDB gate.
  */
object OracleLint {

  private val aggHeads = Seq("sum", "list_sum")
  private val safeCastTypes = Seq("decimal", "double", "float", "real")

  /** Violations in one SQL string: the offending snippet around each
    * unsafely-typed aggregate. Empty = clean. */
  def violations(sql: String): Seq[String] = {
    // Locale.ROOT: the default locale's toLowerCase can break ASCII
    // matching (e.g. tr-TR dots "LIST_SUM" to "lıst_sum") and silently
    // disable the lint — the worst failure direction for a guard
    val lower = sql.toLowerCase(java.util.Locale.ROOT)
    aggHeads.flatMap { head =>
      headOffsets(lower, head).collect {
        case i if !castWrapped(lower, i) && !argStartsWithSafeCast(lower, i + head.length) =>
          snippet(sql, i)
      }
    }
  }

  /** Lint a whole name→SQL registry; returns (queryName, snippet) pairs. */
  def violations(oracles: Map[String, String]): Seq[(String, String)] =
    oracles.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      violations(sql).map(name -> _)
    }

  /** Throw with every offender named — called by [[Verify]] before any
    * result is dumped, so the driver never compares against a lint-dirty
    * oracle. */
  def check(oracles: Map[String, String]): Unit = {
    val bad = violations(oracles)
    require(bad.isEmpty,
      "oracle SQL lint: uncast SUM would surface as DuckDB HUGEINT (wrap in " +
        "CAST(... AS BIGINT) or sum a DECIMAL/DOUBLE): " +
        bad.map { case (n, s) => s"$n [$s]" }.mkString("; "))
  }

  /** Start offsets of `head` used as a call (identifier boundary before,
    * `(` after, modulo whitespace). */
  private def headOffsets(lower: String, head: String): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    var from = lower.indexOf(head)
    while (from >= 0) {
      val boundaryBefore = from == 0 || !isIdentChar(lower.charAt(from - 1))
      val j = skipWs(lower, from + head.length)
      if (boundaryBefore && j < lower.length && lower.charAt(j) == '(') out += from
      from = lower.indexOf(head, from + 1)
    }
    out.result()
  }

  /** Is the call at `i` immediately inside a CAST( ... ) wrapper? */
  private def castWrapped(lower: String, i: Int): Boolean = {
    var j = i - 1
    while (j >= 0 && lower.charAt(j).isWhitespace) j -= 1
    if (j < 0 || lower.charAt(j) != '(') return false
    j -= 1
    while (j >= 0 && lower.charAt(j).isWhitespace) j -= 1
    j >= 3 && lower.substring(j - 3, j + 1) == "cast" &&
      (j - 4 < 0 || !isIdentChar(lower.charAt(j - 4)))
  }

  /** Does the aggregate's argument begin with CAST(... AS <non-int type>)?
    * Only the leading cast is inspected; DuckDB keeps decimal/double
    * arithmetic decimal/double, so the leading operand's type pins the
    * sum away from HUGEINT. */
  private def argStartsWithSafeCast(lower: String, afterHead: Int): Boolean = {
    var j = skipWs(lower, afterHead)
    if (j >= lower.length || lower.charAt(j) != '(') return false
    j = skipWs(lower, j + 1)
    if (!lower.startsWith("cast", j)) return false
    j = skipWs(lower, j + 4)
    if (j >= lower.length || lower.charAt(j) != '(') return false
    val close = matchParen(lower, j)
    if (close < 0) return false
    val inner = lower.substring(j + 1, close)
    // only the cast's OWN `AS <type>` counts — that is the last `as` at
    // paren depth 0 inside its parens; a nested safe cast deeper in the
    // argument (e.g. CAST(CASE WHEN f THEN CAST(x AS DOUBLE) END AS
    // BIGINT)) must NOT pass the lint
    topLevelCastType(inner).exists(t => safeCastTypes.exists(t.startsWith))
  }

  /** The type name following the last depth-0 `AS` in a cast body. */
  private def topLevelCastType(inner: String): Option[String] = {
    var depth = 0
    var j = 0
    var last = -1
    while (j < inner.length - 1) {
      inner.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'a' if depth == 0 && inner.charAt(j + 1) == 's' &&
          (j == 0 || !isIdentChar(inner.charAt(j - 1))) &&
          (j + 2 >= inner.length || !isIdentChar(inner.charAt(j + 2))) =>
          last = j
        case _ =>
      }
      j += 1
    }
    if (last < 0) None
    else {
      val start = skipWs(inner, last + 2)
      var end = start
      while (end < inner.length && isIdentChar(inner.charAt(end))) end += 1
      if (end > start) Some(inner.substring(start, end)) else None
    }
  }

  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var j = open
    while (j < s.length) {
      s.charAt(j) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    -1
  }

  private def skipWs(s: String, from: Int): Int = {
    var j = from
    while (j < s.length && s.charAt(j).isWhitespace) j += 1
    j
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private def snippet(sql: String, i: Int): String = {
    val to = math.min(sql.length, i + 40)
    sql.substring(i, to).replaceAll("\\s+", " ")
  }
}
