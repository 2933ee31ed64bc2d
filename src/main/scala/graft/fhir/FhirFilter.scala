package graft.fhir

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FHIR `_filter` expression language (public R4 spec, search_filter.html):
  * infix boolean expressions over search parameters —
  *
  *   `Patient?_filter=gender eq "male" and (birthdate ge 1960-01-01 or
  *    active eq "true")`
  *
  * The reference's store exposes `_filter` as part of its advanced search
  * surface (/root/reference/README.md:97-105); here it is a tiny
  * recursive-descent parser whose output compiles onto the SAME
  * ParamDef registry the plain search parameters use, so every `_filter`
  * predicate plans as an ordinary pushdown-able Catalyst filter — no new
  * physical operator, no interpretation at runtime.
  *
  * Supported grammar (the operational subset of the spec's filter BNF):
  *   filter   = or ;  or = and ("or" and)* ;  and = unary ("and" unary)*
  *   unary    = "not" "(" filter ")" | "(" filter ")" | paramExp
  *   paramExp = param SP op SP value      (value: bare token or "quoted")
  *   op       = eq ne co sw ew gt lt ge le pr
  * Op applicability follows the underlying parameter type exactly as in
  * plain search: ordering ops (gt/ge/lt/le) are meaningful on date /
  * quantity params (they compile through the same prefix forms), string
  * ops (co/sw/ew) on string params, eq on everything (string eq is the
  * `:exact` contract; token eq is `system|code` equality). `pr` maps to
  * the `:missing` machinery (`pr true` ≡ `:missing=false`).
  */
object FhirFilter {

  sealed trait Expr
  final case class Cmp(param: String, op: String, value: String) extends Expr
  final case class And(l: Expr, r: Expr) extends Expr
  final case class Or(l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr

  /** Tokens: parens, bare words, and double-quoted strings (returned with
    * a leading '"' marker so a quoted "and" is never mistaken for the
    * operator).
    */
  private def tokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '(' => out += "("; i += 1
        case ')' => out += ")"; i += 1
        case '"' =>
          // the _filter grammar allows \" and \\ inside string literals;
          // scanning for the bare closing quote would mis-tokenize them
          val sb = new StringBuilder("\"")
          var j = i + 1
          var closed = false
          while (j < s.length && !closed) {
            s(j) match {
              case '\\' =>
                require(j + 1 < s.length, s"dangling escape in _filter: $s")
                val c = s(j + 1)
                require(c == '"' || c == '\\', s"unsupported escape \\$c in _filter: $s")
                sb += c; j += 2
              case '"' => closed = true; j += 1
              case c => sb += c; j += 1
            }
          }
          require(closed, s"unterminated string literal in _filter: $s")
          out += sb.toString
          i = j
        case _ =>
          val stop = s.indexWhere(c => c.isWhitespace || c == '(' || c == ')', i)
          val end = if (stop < 0) s.length else stop
          out += s.substring(i, end)
          i = end
      }
    }
    out.toList
  }

  /** Parse with standard precedence: `and` binds tighter than `or`;
    * `not` applies to a parenthesized filter (the spec's form).
    */
  def parse(s: String): Expr = {
    var toks = tokenize(s)
    def peek: Option[String] = toks.headOption
    def next(): String = {
      require(toks.nonEmpty, s"unexpected end of _filter: $s")
      val h = toks.head; toks = toks.tail; h
    }
    def expect(t: String): Unit = {
      val got = next()
      require(got == t, s"expected '$t' but found '$got' in _filter: $s")
    }
    def orExpr(): Expr = {
      var l = andExpr()
      while (peek.contains("or")) { next(); l = Or(l, andExpr()) }
      l
    }
    def andExpr(): Expr = {
      var l = unary()
      while (peek.contains("and")) { next(); l = And(l, unary()) }
      l
    }
    def unary(): Expr = peek match {
      case Some("not") => next(); expect("("); val e = orExpr(); expect(")"); Not(e)
      case Some("(") => next(); val e = orExpr(); expect(")"); e
      case _ =>
        val param = next()
        val op = next().toLowerCase
        val raw = next()
        Cmp(param, op, if (raw.startsWith("\"")) raw.drop(1) else raw)
    }
    val e = orExpr()
    require(toks.isEmpty, s"trailing tokens in _filter: ${toks.mkString(" ")}")
    e
  }

  /** Compile to a Column over `resType`'s frame via the shared search
    * registry. NOT/NE coalesce NULL→false (three-valued logic would
    * silently drop rows whose tested element is null — the row should
    * simply not match / match the negation).
    */
  def compile(resType: String, df: DataFrame, e: Expr): Column = e match {
    case And(l, r) => compile(resType, df, l) && compile(resType, df, r)
    case Or(l, r) => compile(resType, df, l) || compile(resType, df, r)
    case Not(x) => !coalesce(compile(resType, df, x), lit(false))
    case Cmp(param, op, v) =>
      val defn = FhirSearch.paramDef(resType, param)
      op match {
        case "pr" =>
          if (v == "true") !defn.missingTest(df) else defn.missingTest(df)
        case "eq" => defn.predicate(v, Some("exact"))
        case "ne" => !coalesce(defn.predicate(v, Some("exact")), lit(false))
        case "co" => defn.predicate(v, Some("contains"))
        case "sw" => defn.predicate(v, None)
        case "ew" => defn.predicate(v, Some("ew"))
        case o @ ("gt" | "ge" | "lt" | "le") => defn.predicate(o + v, None)
        case other => sys.error(s"unsupported _filter op: $other")
      }
  }
}
