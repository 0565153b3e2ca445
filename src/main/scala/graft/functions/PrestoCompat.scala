package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, StringInstr}
import org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus
import org.apache.spark.sql.graft.ColumnShim

/** Presto-dialect aliases for the reference's `condition` pass-through
  * (SURVEY.md §2 B7): the reference forwarded raw SQL fragments to
  * Athena/Presto, so conditions written against it may use Presto
  * function names. Spark covers most (`cardinality` is already a native
  * alias of size); the missing ones are registered here. `date_diff`
  * is a PARSER-level delta, not a registry one — see [[rewriteDialect]]. */
object PrestoCompat {

  /** Presto spells the 3-arg `date_diff` unit as a STRING (`'day'`);
    * Spark 4's grammar accepts the same 3-arg form with an UNQUOTED unit
    * identifier and identical semantics (TimestampDiff — elapsed complete
    * units, truncated toward zero). The delta is purely lexical, and a
    * registered function can never see it: the parser owns the 3-arg
    * `date_diff(` syntax and rejects a quoted unit before function
    * resolution runs. So the shim is a dialect REWRITE on the raw SQL
    * fragment: unquote alpha-only unit literals in the first argument
    * position. The native 2-arg form is untouchable by construction — a
    * quoted first argument there is a date string (`'2024-03-01'`), which
    * the digits/dashes keep from matching. `date_add`/`dateadd`/
    * `timestampadd` (B7 closure audit, r19) are the same parser delta
    * with the same fix: Presto's `date_add('day', 5, ts)` becomes
    * Spark's unquoted-unit 3-arg form (TimestampAdd — note it returns
    * TIMESTAMP even for DATE input, where Presto preserves DATE; cast
    * if the date type matters), and Spark's native 2-arg
    * `date_add('2024-01-01', n)` again can't match. */
  private val DateDiffUnit =
    "(?i)\\b(date_diff|timestampdiff|date_add|dateadd|timestampadd)\\s*\\(\\s*'([a-z]+)'\\s*,".r

  /** Presto allows a bare `CAST(x AS VARCHAR)` (unbounded); Spark's
    * grammar requires a length on VARCHAR — the equivalent unbounded
    * type is STRING. `VARCHAR(n)` parses fine in Spark and is left
    * alone; an alias literally named VARCHAR never matches (no
    * closing paren directly after). B7 closure audit, r19. */
  private val BareVarcharCast = "(?i)\\b(AS\\s+)VARCHAR\\s*\\)".r

  /** Rewrite Presto-spelled fragments to Spark grammar; apply to raw
    * `condition`/`fields` strings before Catalyst parses them (the
    * QueryBuilder pass-through does). Idempotent.
    *
    * Quote-aware: `date_diff('day',` occurring INSIDE a
    * single-quoted string literal is content, not syntax — rewriting it
    * would corrupt the literal before Catalyst ever parses it. A match is
    * applied only when it STARTS outside every literal span; the scan
    * treats `''` as the embedded-quote escape (two toggles, net
    * unchanged) and `\'` inside a literal as Spark's backslash escape
    * (both chars are content, no toggle — review round 8: mis-tracking
    * it would flip the parity and suppress rewriting a GENUINE
    * date_diff later in the fragment). */
  def rewriteDialect(sql: String): String = {
    // passes chain, so each recomputes the literal map over ITS input —
    // the earlier pass changes offsets (it strips quote chars)
    val unitFixed = replaceOutsideLiterals(sql, DateDiffUnit,
      m => s"${m.group(1)}(${m.group(2)},")
    replaceOutsideLiterals(unitFixed, BareVarcharCast,
      m => s"${m.group(1)}STRING)")
  }

  private def replaceOutsideLiterals(
      sql: String, re: scala.util.matching.Regex,
      rewrite: scala.util.matching.Regex.Match => String): String = {
    val inLit = new Array[Boolean](sql.length)
    var q = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q && c == '\\' && i + 1 < sql.length) {
        inLit(i) = true; inLit(i + 1) = true; i += 2
      } else {
        if (c == '\'') { inLit(i) = true; q = !q }
        else inLit(i) = q
        i += 1
      }
    }
    re.replaceAllIn(sql, m =>
      if (inLit(m.start)) scala.util.matching.Regex.quoteReplacement(m.matched)
      else scala.util.matching.Regex.quoteReplacement(rewrite(m)))
  }

  def register(spark: SparkSession): Unit = {
    // strpos(string, substring) -> 1-based position, 0 if absent
    ColumnShim.registerFunction(spark, "strpos",
      args => StringInstr(args(0), args(1)))
    // json_extract_scalar(json, path) -> string
    ColumnShim.registerFunction(spark, "json_extract_scalar",
      args => GetJsonObject(args(0), args(1)))
    // approx_distinct(x) -> HLL++ estimate
    ColumnShim.registerFunction(spark, "approx_distinct",
      args => HyperLogLogPlusPlus(args.head).toAggregateExpression())
    // element_at with Presto's out-of-bounds semantics (B7 closure
    // audit, r19): Presto returns NULL past the array end; Spark under
    // ANSI (the 4.x default, on in our sessions) THROWS there — the one
    // place ANSI is STRICTER than Presto rather than matching its
    // error-on-bad-input posture. Overriding the registry entry with
    // failOnError=false restores Presto's contract for SQL-parsed
    // fragments only (the reference pass-through surface); graft's own
    // DataFrame-API element_at calls resolve at Column level and keep
    // ANSI behavior. Missing MAP keys return NULL on both engines
    // either way.
    ColumnShim.registerFunction(spark, "element_at",
      args => org.apache.spark.sql.catalyst.expressions.ElementAt(
        args(0), args(1), failOnError = false))
    // date_parse(string, mysqlFormat) -> timestamp. Presto's format is
    // MySQL %-tokens; translate to a Java pattern at plan time (the
    // format is a literal in every reference-shaped call) and delegate
    // to Spark's to_timestamp.
    ColumnShim.registerFunction(spark, "date_parse", args => {
      require(args(1).foldable, "date_parse format must be a literal")
      val javaFmt = translateMySqlFormat(String.valueOf(args(1).eval(null)))
      new org.apache.spark.sql.catalyst.expressions.ParseToTimestamp(
        args(0), org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(javaFmt),
          org.apache.spark.sql.types.StringType))
    })
  }

  /** MySQL/Presto `date_parse` %-tokens -> Java time pattern. Covers the
    * tokens the reference's date surface reaches; unknown %-tokens throw
    * (silent pass-through would mis-parse). Non-token characters are
    * LITERALS in MySQL, but Java reserves every letter — an unquoted 'T'
    * in '%Y-%m-%dT%H:%i:%s' throws "Unknown pattern letter", and a
    * literal 'D'/'M' silently reinterprets as day-of-year/month. So
    * literal runs containing letters (or quotes) are emitted single-
    * quoted, with embedded quotes doubled per the java.time escape. */
  private[functions] def translateMySqlFormat(fmt: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLiteral(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(c => Character.isLetter(c) || c == '\''))
        out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s)
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => lit.append('%') // literal percent, stays in the run
          case tok =>
            flushLiteral()
            out.append(tok match {
              case 'Y' => "yyyy"
              case 'y' => "yy"
              case 'm' => "MM"
              case 'c' => "M"
              case 'd' => "dd"
              case 'e' => "d"
              case 'H' => "HH"
              case 'k' => "H"
              case 'i' => "mm"   // MySQL minutes (NOT %M, which is month name)
              case 's' | 'S' => "ss"
              case 'f' => "SSSSSS"
              case 'p' => "a"
              case 'j' => "DDD"
              case 'T' => "HH:mm:ss"
              case other => throw new IllegalArgumentException(
                s"unsupported date_parse token %$other in '$fmt'")
            })
        }
        i += 2
      } else { lit.append(c); i += 1 }
    }
    flushLiteral()
    out.toString
  }
}
