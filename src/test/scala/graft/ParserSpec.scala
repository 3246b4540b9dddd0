package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.cypher.CypherParser
import graft.cypher.ast._

/** Parser-level edge cases: precedence, literals, escapes, pattern
  * syntax — shapes that don't need a SparkSession to pin down.
  */
class ParserSpec extends AnyFunSuite {

  private def parseExpr(e: String): Expr =
    CypherParser.parse(s"RETURN $e AS x").clauses.head
      .asInstanceOf[Return].items.head.expr

  test("arithmetic precedence: mul binds tighter than add; parens override") {
    assert(parseExpr("1 + 2 * 3") ==
      Arith("+", Lit(1L), Arith("*", Lit(2L), Lit(3L))))
    assert(parseExpr("(1 + 2) * 3") ==
      Arith("*", Arith("+", Lit(1L), Lit(2L)), Lit(3L)))
  }

  test("boolean precedence: NOT > AND > OR") {
    assert(parseExpr("NOT true AND false OR true") ==
      Or(And(Not(Lit(true)), Lit(false)), Lit(true)))
  }

  test("string literals: quotes and escapes") {
    assert(parseExpr("'it\\'s'") == Lit("it's"))
    assert(parseExpr("\"two\\nlines\"") == Lit("two\nlines"))
  }

  test("number literals: negative ints and doubles") {
    assert(parseExpr("-42") == Lit(-42L))
    assert(parseExpr("-3.25") == Lit(-3.25))
  }

  test("comparison chains with IN / STARTS WITH / IS NULL") {
    assert(parseExpr("x IN [1, 2]") == In(Variable("x"), Seq(Lit(1L), Lit(2L))))
    assert(parseExpr("n.a STARTS WITH 'p'") ==
      StringPred("starts", Prop("n", "a"), Lit("p")))
    assert(parseExpr("n.a IS NOT NULL") == IsNull(Prop("n", "a"), negated = true))
  }

  test("var-length relationship bounds") {
    def rel(q: String): RelPat =
      CypherParser.parse(q).clauses.head.asInstanceOf[Match]
        .patterns.head.hops.head._1
    assert(rel("MATCH (a)-[:T*1..3]->(b) RETURN a").varLength.contains((1, 3)))
    assert(rel("MATCH (a)-[:T*2]->(b) RETURN a").varLength.contains((2, 2)))
    assert(rel("MATCH (a)-[:T*]->(b) RETURN a").varLength
      .contains((1, CypherParser.Unbounded)))
    assert(rel("MATCH (a)-[:T*2..]->(b) RETURN a").varLength
      .contains((2, CypherParser.Unbounded)))
    assert(rel("MATCH (a)-[:T|U]->(b) RETURN a").types == Seq("T", "U"))
  }

  test("pattern directions") {
    def dir(q: String): Int =
      CypherParser.parse(q).clauses.head.asInstanceOf[Match]
        .patterns.head.hops.head._1.dir
    assert(dir("MATCH (a)-[:T]->(b) RETURN a") == 1)
    assert(dir("MATCH (a)<-[:T]-(b) RETURN a") == -1)
    assert(dir("MATCH (a)-[:T]-(b) RETURN a") == 0)
  }

  test("parenthesized arithmetic is not a pattern predicate") {
    assert(parseExpr("(1 + 2) - 3") ==
      Arith("-", Arith("+", Lit(1L), Lit(2L)), Lit(3L)))
    // but a real pattern in WHERE parses as PatternPred
    val w = CypherParser.parse("MATCH (a) WHERE (a)-[:T]->() RETURN a")
      .clauses.head.asInstanceOf[Match].where.get
    assert(w.isInstanceOf[PatternPred])
  }

  test("keywords are case-insensitive; line comments skipped") {
    val q = CypherParser.parse(
      "match (a:dog) // a comment\nreturn a.name as name order by name limit 3")
    assert(q.clauses.size == 2)
    val r = q.clauses(1).asInstanceOf[Return]
    assert(r.limit.contains(Lit(3L))) // skip/limit are Exprs since r19 ($param support)
    assert(r.orderBy.size == 1)
  }

  test("parse errors carry position info") {
    val e = intercept[IllegalArgumentException] {
      CypherParser.parse("MATCH (a RETURN a")
    }
    assert(e.getMessage.contains("Cypher parse error"))
  }

  test("EXISTS { } and COUNT { } subqueries parse with inner WHERE") {
    val w = CypherParser.parse(
      "MATCH (a) WHERE EXISTS { (a)-[:T]->(b:L) WHERE b.x > 1 } RETURN a")
      .clauses.head.asInstanceOf[Match].where.get
    val ex = w.asInstanceOf[ExistsSub]
    assert(ex.patterns.size == 1 && ex.where.isDefined)

    val c = CypherParser.parse(
      "MATCH (a) WHERE COUNT { MATCH (a)-[:T]->() } >= 2 RETURN a")
      .clauses.head.asInstanceOf[Match].where.get
    val Cmp(">=", cs: CountSub, Lit(2L)) = c: @unchecked
    assert(cs.patterns.size == 1 && cs.where.isEmpty)

    // exists( the scalar function still parses as a call
    assert(parseExpr("exists(a.x)") == FnCall("exists", Seq(Prop("a", "x"))))
  }

  test("MATCH p = shortestPath((a)-[:T*..4]->(b)) parses") {
    val q = CypherParser.parse(
      "MATCH p = shortestPath((a:L)-[:T*..4]->(b)) WHERE a.k <= 5 RETURN length(p) AS d")
    val ms = q.clauses.head.asInstanceOf[MatchShortest]
    assert(ms.pathVar == "p")
    assert(ms.pat.hops.head._1.varLength.contains((1, 4)))
    assert(ms.where.isDefined)
  }

  test("fuzz: arbitrary garbage fails fast with a parse error, never hangs") {
    // deterministic pseudo-random byte soup + structured-ish fragments:
    // the combinator grammar must reject (or accept) every input in
    // bounded time — catastrophic regex backtracking or infinite
    // recursion in a rule would hang here
    val rng = new scala.util.Random(42)
    val fragments = Seq("MATCH", "(", ")", "[", "]", "{", "}", "RETURN",
      "WHERE", "'", "\"", "-", ">", "<", ":", "|", "*", "..", ",", "=",
      "a", "1", "$", "^", "%", ".", "AND", "NOT", "NULL", "//", ";")
    val deadline = System.nanoTime() + 30L * 1000000000L
    (1 to 300).foreach { i =>
      val garbage =
        if (i % 3 == 0) (1 to rng.nextInt(40) + 1).map(_ =>
          fragments(rng.nextInt(fragments.length))).mkString(" ")
        else rng.nextString(rng.nextInt(80))
      try { CypherParser.parse(garbage); () }
      catch {
        case _: IllegalArgumentException => ()
        case _: UnsupportedOperationException => ()
      }
      assert(System.nanoTime() < deadline,
        s"parser spent >30s cumulative by input #$i: ${garbage.take(60)}")
    }
  }
}
