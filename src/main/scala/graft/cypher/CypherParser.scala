package graft.cypher

import scala.util.parsing.combinator.RegexParsers
import ast._

/** Recursive-descent parser for the supported Cypher subset.
  *
  * Grammar follows the published openCypher spec (opencypher.org).
  * Case-insensitive keywords; identifiers and string/number/bool
  * literals; patterns with labels, inline property maps, typed and
  * var-length relationships in either direction.
  */
object CypherParser extends RegexParsers {

  override val skipWhitespace = true
  override val whiteSpace = """(\s|//.*)+""".r

  private def kw(s: String): Parser[String] =
    ("""(?i)\b""" + s + """\b""").r ^^ (_ => s.toUpperCase)

  /** Plain identifier, or a BACKTICK-QUOTED one (Neo4j's escape for
    * names that aren't plain identifiers: `MATCH (n:`007`)`,
    * `RETURN n.`my prop``). The quoted form admits anything but a
    * backtick; downstream layers already tolerate non-identifier
    * names (label-partition routing falls back to the full scan for
    * them, Spark columns may contain spaces). */
  private val ident: Parser[String] =
    """[A-Za-z_][A-Za-z0-9_]*""".r |
    """`[^`]+`""".r ^^ (s => s.substring(1, s.length - 1))
  private val qualIdent: Parser[String] = """[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*""".r

  // ---- literals ----
  private val stringLit: Parser[Lit] =
    ("'" + """([^'\\]|\\.)*""" + "'").r ^^ { s =>
      Lit(unescape(s.substring(1, s.length - 1)))
    } |
    ("\"" + """([^"\\]|\\.)*""" + "\"").r ^^ { s =>
      Lit(unescape(s.substring(1, s.length - 1)))
    }
  private def unescape(s: String): String =
    s.replace("\\'", "'").replace("\\\"", "\"").replace("\\n", "\n")
      .replace("\\t", "\t").replace("\\\\", "\\")

  private val numberLit: Parser[Lit] =
    """-?\d+\.\d+""".r ^^ (s => Lit(s.toDouble)) |
    """-?\d+""".r ^^ (s => Lit(s.toLong))
  private val boolLit: Parser[Lit] =
    kw("true") ^^ (_ => Lit(true)) | kw("false") ^^ (_ => Lit(false))
  private val nullLit: Parser[Lit] = kw("null") ^^ (_ => Lit(null))
  private val literal: Parser[Lit] = stringLit | numberLit | boolLit | nullLit

  // ---- expressions (precedence: OR < AND < NOT < cmp < add < mul < unary) ----
  def expr: Parser[Expr] = orExpr

  private def orExpr: Parser[Expr] =
    andExpr ~ rep(kw("or") ~> andExpr) ^^ { case h ~ t => t.foldLeft(h)(Or.apply) }
  private def andExpr: Parser[Expr] =
    notExpr ~ rep(kw("and") ~> notExpr) ^^ { case h ~ t => t.foldLeft(h)(And.apply) }
  private def notExpr: Parser[Expr] =
    kw("not") ~> notExpr ^^ Not.apply | cmpExpr
  private def cmpExpr: Parser[Expr] =
    addExpr ~ opt(cmpTail) ^^ { case l ~ t => t.map(_(l)).getOrElse(l) }
  /** Chained comparisons (`1 < x < 10`) desugar to a conjunction of
    * adjacent pairs, each operand evaluated once syntactically
    * (openCypher comparison chaining). */
  private def cmpChain: Parser[Expr => Expr] =
    rep1(("<=" | ">=" | "<>" | "=" | "<" | ">") ~ addExpr) ^^ { pairs => (l: Expr) =>
      val (conj, _) = pairs.foldLeft((Option.empty[Expr], l)) {
        case ((acc, prev), op ~ r) =>
          val c = Cmp(op, prev, r)
          (Some(acc.map(And(_, c)).getOrElse(c)), r)
      }
      conj.get
    }
  private def cmpTail: Parser[Expr => Expr] =
    "=~" ~> addExpr ^^ { r => (l: Expr) => StringPred("regex", l, r) } |
    cmpChain |
    kw("in") ~> "[" ~> repsep(expr, ",") <~ "]" ^^ { list => (l: Expr) => In(l, list) } |
    kw("in") ~> param ^^ { p => (l: Expr) => In(l, Seq(p)) } |
    kw("starts") ~> kw("with") ~> addExpr ^^ { r => (l: Expr) => StringPred("starts", l, r) } |
    kw("ends") ~> kw("with") ~> addExpr ^^ { r => (l: Expr) => StringPred("ends", l, r) } |
    kw("contains") ~> addExpr ^^ { r => (l: Expr) => StringPred("contains", l, r) } |
    kw("is") ~> kw("not") ~> kw("null") ^^ { _ => (l: Expr) => IsNull(l, negated = true) } |
    kw("is") ~> kw("null") ^^ { _ => (l: Expr) => IsNull(l, negated = false) } |
    // Neo4j 5.9 type predicate `x IS :: TYPE` / `x IS NOT :: TYPE`
    kw("is") ~> kw("not") ~> "::" ~> typeName ^^ { t => (l: Expr) => TypePred(l, t, negated = true) } |
    kw("is") ~> "::" ~> typeName ^^ { t => (l: Expr) => TypePred(l, t, negated = false) } |
    // label predicate as an expression: `n:Person`, `n:A|B`, `n:!A&%`.
    // A `|`-continuation is taken ONLY when what follows the
    // alternative is a predicate boundary (AND/OR/RETURN/…/','/')'/
    // end of input): the bar is AMBIGUOUS with a comprehension's
    // projection bar (`[x IN l WHERE x:A | x]` — Neo4j's own grammar
    // note), and mis-eating the projection breaks valid queries. The
    // un-whitelisted cases read as the projection; parenthesize
    // (`x:(A|B)`) to force the label reading there.
    ":" ~> labelAndExpr ~ rep("|" ~> labelAndExpr <~ guard(labelAltBoundary)) ^^ {
      case h ~ t => (l: Expr) => HasLabel(l, t.foldLeft(h)(LabelExpr.LOr))
    }
  private def labelAltBoundary: Parser[Any] =
    kw("and") | kw("or") | kw("xor") | kw("not") | kw("return") | kw("with") |
    kw("where") | kw("then") | kw("else") | kw("end") | kw("as") | kw("order") |
    kw("limit") | kw("skip") | kw("union") | kw("asc") | kw("desc") |
    kw("match") | kw("set") | kw("remove") | kw("delete") | kw("detach") |
    kw("merge") | kw("unwind") | kw("create") | kw("optional") | kw("call") |
    // `]` stays OFF the whitelist: inside a comprehension the bar
    // before `]` is the projection bar (`[x IN l WHERE x:A | x]`),
    // exactly the ambiguity this guard exists to resolve
    kw("foreach") | kw("show") | kw("yield") | kw("on") | kw("when") |
    "," | ")" | "}" |
    Parser { in =>
      val r = handleWhiteSpace(in.source, in.offset)
      if (r >= in.source.length) Success((), in)
      else Failure("end of input expected", in)
    }
  private def typeName: Parser[String] =
    """(?i)[A-Za-z]+(\s*<\s*[A-Za-z ]+\s*>)?""".r ^^ (_.toUpperCase.replaceAll("\\s", ""))
  private def addExpr: Parser[Expr] =
    mulExpr ~ rep(("||" | "+" | "-") ~ mulExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) } }
  private def mulExpr: Parser[Expr] =
    powExpr ~ rep(("*" | "/" | "%") ~ powExpr) ^^ { case h ~ t =>
      t.foldLeft(h) { case (l, op ~ r) => Arith(op, l, r) } }
  // `^` binds tighter than * and is right-associative (2^3^2 = 512)
  private def powExpr: Parser[Expr] =
    rep(unaryExpr <~ "^") ~ unaryExpr ^^ { case hs ~ last =>
      hs.foldRight(last)((l, r) => Arith("^", l, r)) }
  private val param: Parser[Param] = "$" ~> ident ^^ Param.apply

  private def unaryExpr: Parser[Expr] =
    atomExpr ~ rep(subscript) ^^ { case h ~ t => t.foldLeft(h)((e, f) => f(e)) }

  /** Postfix `[i]` / `[lo..hi]` (slice tried first: a bare index has
    * no `..`) and `.key` — property/component access on any primary
    * (`date('…').year`, `duration('P3D').days`, `{a: 1}.a`). A
    * variable base keeps the classic binding-table Prop node. */
  private def subscript: Parser[Expr => Expr] =
    ("[" ~> opt(expr) <~ "..") ~ (opt(expr) <~ "]") ^^ {
      case lo ~ hi => (e: Expr) => ListSlice(e, lo, hi)
    } |
    "[" ~> expr <~ "]" ^^ { i => (e: Expr) => Subscript(e, i) } |
    "." ~> ident ^^ { k => (e: Expr) =>
      e match {
        case Variable(v) => Prop(v, k)
        case other       => PropOf(other, k)
      }
    }

  private def atomExpr: Parser[Expr] =
    literal |
    param |
    caseExpr |
    existsSub |
    countSub |
    collectSub |
    listPred |
    reduceExpr |
    fnCall |
    patternPred |
    mapProj |
    propOrVar |
    listLit |
    mapLitExpr |
    "(" ~> expr <~ ")"

  /** Map literal in expression position: `{k: expr, …}` with FULL
    * expression values (`point({x: c.c_acctbal, y: 0.0})`), unlike the
    * restricted pattern-map form. No other atom starts with `{`. */
  private def mapLitExpr: Parser[Expr] =
    "{" ~> repsep(ident ~ (":" ~> expr), ",") <~ "}" ^^ { items =>
      MapLit(items.map { case k ~ v => k -> v })
    }

  /** `EXISTS { [MATCH] pattern, … [WHERE expr] }` — tried before
    * fnCall; `exists(` (the scalar function) fails the `{` and
    * backtracks. */
  private def existsSub: Parser[Expr] =
    kw("exists") ~> "{" ~> opt(kw("match")) ~> patternList ~ opt(whereClause) <~ "}" ^^ {
      case ps ~ w => ExistsSub(ps, w)
    }

  /** `COUNT { [MATCH] pattern, … [WHERE expr] }`. */
  private def countSub: Parser[Expr] =
    kw("count") ~> "{" ~> opt(kw("match")) ~> patternList ~ opt(whereClause) <~ "}" ^^ {
      case ps ~ w => CountSub(ps, w)
    }

  /** `COLLECT { [MATCH] pattern, … [WHERE expr] RETURN expr }` (Neo4j
    * 5.6) — tried before fnCall; `collect(` fails the `{` and
    * backtracks to the aggregate function. */
  private def collectSub: Parser[Expr] =
    kw("collect") ~> "{" ~> opt(kw("match")) ~> patternList ~ opt(whereClause) ~
      (kw("return") ~> expr) ~ opt(kw("order") ~> kw("by") ~> orderItem) ~
      opt(kw("limit") ~> """\d+""".r) <~ "}" ^^ {
      case ps ~ w ~ p ~ ob ~ li => CollectSub(ps, w, p, ob, li.map(_.toInt))
    }

  /** `any/all/none/single(x IN list WHERE pred)` — tried before
    * fnCall; a call of one of these names without `ident IN` fails
    * the `IN` and backtracks to fnCall. */
  private def listPred: Parser[Expr] =
    (kw("any") | kw("all") | kw("none") | kw("single")) ~
      ("(" ~> ident <~ kw("in")) ~ expr ~ (kw("where") ~> expr) <~ ")" ^^ {
      case fn ~ v ~ l ~ p => ListPred(fn.toLowerCase, v, l, p)
    }

  /** `reduce(acc = init, x IN list | expr)`. */
  private def reduceExpr: Parser[Expr] =
    kw("reduce") ~> "(" ~> (ident <~ "=") ~ expr ~ ("," ~> ident <~ kw("in")) ~
      expr ~ ("|" ~> expr) <~ ")" ^^ {
      case acc ~ init ~ v ~ l ~ e => ReduceExpr(acc, init, v, l, e)
    }

  /** `(a)-[:T]->(b)` inside WHERE: tried before propOrVar/parens; a
    * parenthesized expression fails the mandatory-hop requirement and
    * backtracks. */
  private def patternPred: Parser[Expr] =
    nodePat ~ rep1(hop) ^^ { case n ~ hs => PatternPred(PathPat(n, hs)) }

  private def caseExpr: Parser[Expr] =
    kw("case") ~> rep1(kw("when") ~> expr ~ (kw("then") ~> expr)) ~
      opt(kw("else") ~> expr) <~ kw("end") ^^ {
      case whens ~ other => CaseExpr(whens.map { case c ~ v => (c, v) }, other)
    } |
    // simple form: `CASE subj WHEN v THEN r … END` desugars to the
    // generic form with `subj = v` tests (tried second: the generic
    // form fails fast when an expression follows CASE)
    kw("case") ~> expr ~ rep1(kw("when") ~> expr ~ (kw("then") ~> expr)) ~
      opt(kw("else") ~> expr) <~ kw("end") ^^ {
      case subj ~ whens ~ other =>
        CaseExpr(whens.map { case c ~ v => (Cmp("=", subj, c), v) }, other)
    }

  private def listLit: Parser[Expr] =
    listComp |
    patternComp |
    "[" ~> repsep(expr, ",") <~ "]" ^^ ListLit.apply

  /** `[(a)-[:T]->(b) [WHERE pred] | proj]` — tried after listComp
    * (which needs `ident IN`); a plain list starting with a
    * parenthesized expression fails the mandatory hop and backtracks. */
  private def patternComp: Parser[Expr] =
    ("[" ~> nodePat) ~ rep1(hop) ~ opt(whereClause) ~ ("|" ~> expr) <~ "]" ^^ {
      case n ~ hs ~ w ~ p => PatternComp(PathPat(n, hs), w, p)
    }

  /** `[x IN list WHERE pred | proj]` — WHERE and projection optional. */
  private def listComp: Parser[Expr] =
    ("[" ~> ident <~ kw("in")) ~ expr ~ opt(kw("where") ~> expr) ~
      opt("|" ~> expr) <~ "]" ^^ {
      case v ~ l ~ w ~ p => ListComp(v, l, w, p)
    }

  private def fnCall: Parser[Expr] =
    (qualIdent <~ "(") ~ opt(kw("distinct")) ~ (repsep(expr, ",") <~ ")") ^^ {
      case name ~ d ~ args => FnCall(name, args, d.isDefined)
    } |
    (qualIdent <~ "(") ~ ("*" ~> ")") ^^ { case name ~ _ => FnCall(name, Nil) }

  /** Map projection `v {.prop, .*, key: expr, var}` — tried before
    * propOrVar (a bare `v` not followed by `{` backtracks). */
  private def mapProjItem: Parser[MapProjItem] =
    "." ~ "*" ^^ { _ => ProjAll } |
    "." ~> ident ^^ ProjProp.apply |
    ident ~ (":" ~> expr) ^^ { case k ~ e => ProjExpr(k, e) } |
    ident ^^ (n => ProjExpr(n, Variable(n)))

  private def mapProj: Parser[Expr] =
    ident ~ ("{" ~> repsep(mapProjItem, ",") <~ "}") ^^ {
      case v ~ items => MapProj(v, items)
    }

  private def propOrVar: Parser[Expr] =
    ident ~ opt("." ~> ident) ^^ {
      case v ~ Some(k) => Prop(v, k)
      case v ~ None    => Variable(v)
    }

  // ---- patterns ----
  /** Literal LIST in a pattern property map (`{tags: ['x','y']}`,
    * `{embedding: [0.1, 0.2]}` — Neo4j stores homogeneous list
    * properties; the canonical case here is a literal node
    * embedding). Elements are literals or nested lists — the
    * restricted pattern-map discipline, not full expressions. */
  private def literalList: Parser[Lit] =
    "[" ~> repsep(literal | literalList, ",") <~ "]" ^^ (items => Lit(items.map(_.v)))

  private def mapValue: Parser[Lit] =
    literal |
    literalList |
    "$" ~> ident ^^ (n => Lit(ParamRefValue(n))) |
    ident ~ opt("." ~> ident) ~ ("[" ~> """-?\d+""".r <~ "]") ^^ {
      case v ~ k ~ i => Lit(SubscriptRefValue(v, k, i.toLong))
    } |
    ident ~ ("." ~> ident) ^^ { case v ~ k => Lit(PropRefValue(v, k)) } |
    ident ^^ (n => Lit(VarRefValue(n)))

  private def mapLit: Parser[Map[String, Lit]] =
    "{" ~> repsep(ident ~ (":" ~> mapValue), ",") <~ "}" ^^ {
      _.map { case k ~ v => k -> v }.toMap
    }

  // ---- label expressions (Neo4j 5: `:A|B`, `:A&B`, `:!A`, `:%`) ----
  // Precedence ! > & > |, parenthesizable. A pure conjunction of plain
  // names (incl. the legacy `:A:B` form) collapses back into
  // NodePat.labels so the write paths keep their concrete label list.
  private def labelLeaf: Parser[LabelExpr] =
    "!" ~> labelLeaf ^^ (e => LabelExpr.LNot(e)) |
    "(" ~> labelOrExpr <~ ")" |
    "%" ^^^ (LabelExpr.Wildcard: LabelExpr) |
    ident ^^ (n => LabelExpr.Leaf(n): LabelExpr)
  private def labelAndExpr: Parser[LabelExpr] =
    rep1sep(labelLeaf, "&") ^^ (_.reduceLeft(LabelExpr.LAnd))
  private def labelOrExpr: Parser[LabelExpr] =
    rep1sep(labelAndExpr, "|") ^^ (_.reduceLeft(LabelExpr.LOr))

  private def plainConj(e: LabelExpr): Option[Seq[String]] = e match {
    case LabelExpr.Leaf(n)    => Some(Seq(n))
    case LabelExpr.LAnd(l, r) => for (a <- plainConj(l); b <- plainConj(r)) yield a ++ b
    case _                    => None
  }

  /** Whole-map parameter in a node pattern (`(n:L $props)` — the
    * drivers' dynamic-create idiom). Encoded as a marker entry the
    * substitution pass expands to the bound map's literal entries;
    * reaching the compiler unexpanded means the parameter was unbound. */
  private def nodeMap: Parser[Map[String, Lit]] =
    mapLit |
    "$" ~> ident ^^ (n => Map(Params.WholeMapKey -> Lit(ParamRefValue(n))))

  private def nodePat: Parser[NodePat] =
    "(" ~> opt(not(kw("where")) ~> ident) ~ rep(":" ~> labelOrExpr) ~ opt(nodeMap) ~
      opt(kw("where") ~> expr) <~ ")" ^^ {
      case v ~ ls ~ m ~ w =>
        val props = m.getOrElse(Map.empty)
        ls.reduceOption(LabelExpr.LAnd) match {
          case None => NodePat(v, Nil, props, None, w)
          case Some(e) => plainConj(e) match {
            case Some(names) => NodePat(v, names, props, None, w)
            case None        => NodePat(v, Nil, props, Some(e), w)
          }
        }
    }

  private def relDetail: Parser[(Option[String], Seq[String], Map[String, Lit], Option[(Int, Int)], Option[Expr])] =
    "[" ~> opt(not(kw("where")) ~> ident) ~ opt(":" ~> rep1sep(ident, "|")) ~ opt(varLen) ~
      opt(mapLit) ~ opt(kw("where") ~> expr) <~ "]" ^^ {
      case v ~ ts ~ vl ~ m ~ w => (v, ts.getOrElse(Nil), m.getOrElse(Map.empty), vl, w)
    }

  /** Unbounded upper bound sentinel (`*`, `*..`, `*n..`, `{m,}`, `+`):
    * the σ-count expand runs a TRUE visited-set fixpoint for it (no
    * silent hop cap — r13's 15-hop truncation was a silent wrong
    * answer on any deeper chain); path ENUMERATION keeps its explicit
    * refusal (CypherCompiler.VarPathMaxHops). */
  val Unbounded: Int = Int.MaxValue

  private def varLen: Parser[(Int, Int)] =
    "*" ~> opt("""\d+""".r) ~ opt(".." ~> opt("""\d+""".r)) ^^ {
      case lo ~ hi =>
        val min = lo.map(_.toInt).getOrElse(1)
        val max = hi match {
          case Some(Some(h)) => h.toInt
          case Some(None)    => Unbounded // `*n..`
          case None          => lo.map(_.toInt).getOrElse(Unbounded) // `*n` | `*`
        }
        (min, max)
    }

  /** GQL / Neo4j 5 postfix quantifier on a relationship: `{m,n}`,
    * `{n}`, `{m,}`, `+`. Desugars onto the var-length machinery (the
    * engine's var-length expand already implements the trail
    * semantics GQL quantifiers specify). `*` (zero-or-more) has
    * zero-length-path semantics var-length expand does not model —
    * refused by omission here (it fails to parse as a quantifier). */
  private def quant: Parser[(Int, Int)] =
    "{" ~> """\d+""".r ~ opt("," ~> opt("""\d+""".r)) <~ "}" ^^ {
      case lo ~ None            => (lo.toInt, lo.toInt)
      case lo ~ Some(hi)        => (lo.toInt, hi.map(_.toInt).getOrElse(Unbounded))
    } |
    "+" ^^^ ((1, Unbounded))

  private def quantified(r: RelPat, q: Option[(Int, Int)]): RelPat = q match {
    case None => r
    case Some(b) =>
      if (r.varLength.nonEmpty) throw new IllegalArgumentException(
        "a relationship pattern cannot combine `*` var-length and a `{m,n}` quantifier")
      r.copy(varLength = Some(b))
  }

  private def hop: Parser[(RelPat, NodePat)] =
    ("<-" ~> opt(relDetail) <~ "-") ~ opt(quant) ~ nodePat ^^ {
      case r ~ q ~ n => (quantified(mkRel(r, -1), q), n)
    } |
    ("-" ~> opt(relDetail) <~ "->") ~ opt(quant) ~ nodePat ^^ {
      case r ~ q ~ n => (quantified(mkRel(r, 1), q), n)
    } |
    ("-" ~> opt(relDetail) <~ "-") ~ opt(quant) ~ nodePat ^^ {
      case r ~ q ~ n => (quantified(mkRel(r, 0), q), n)
    }

  private def mkRel(r: Option[(Option[String], Seq[String], Map[String, Lit], Option[(Int, Int)], Option[Expr])], dir: Int): RelPat =
    r match {
      case Some((v, ts, m, vl, w)) => RelPat(v, ts, m, dir, vl, w)
      case None                    => RelPat(None, Nil, Map.empty, dir, None)
    }

  /** Neo4j 5 Quantified Path Pattern, single-hop form: `(a)
    * ((x)-[:R]->(y)){m,n} (b)` desugars onto the var-length machinery
    * (the engine's σ-counted expand already implements the trail
    * semantics GQL quantifiers specify — same target as the postfix
    * rel quantifier above). The inner node patterns must be BARE:
    * per-step node labels/properties/WHERE have no hook in var-length
    * expansion, so anything else refuses loudly rather than silently
    * weakening the per-step filter to the endpoints. Multi-hop groups
    * refuse for the same reason. */
  private def qppHop: Parser[(RelPat, NodePat)] =
    ("(" ~> nodePat ~ hop <~ ")") ~ quant ~ nodePat ^^ {
      case inner ~ hp ~ q ~ next =>
        val (rel, innerEnd) = hp
        def bare(n: NodePat) = n.labels.isEmpty && n.props.isEmpty &&
          n.labelExpr.isEmpty && n.where.isEmpty
        if (!bare(inner) || !bare(innerEnd)) throw new IllegalArgumentException(
          "quantified path pattern: inner node labels/properties/WHERE " +
            "are not supported — put the predicate on the outer nodes or " +
            "use -[:R*m..n]->")
        if (rel.varLength.nonEmpty) throw new IllegalArgumentException(
          "quantified path pattern cannot contain a var-length relationship")
        (rel.copy(varLength = Some(q)), next)
    }

  private def pathPat: Parser[PathPat] =
    nodePat ~ rep(qppHop | hop) ^^ { case n ~ hs => PathPat(n, hs) }

  private def patternList: Parser[Seq[PathPat]] = rep1sep(pathPat, ",")

  // ---- clauses ----
  private def whereClause: Parser[Expr] = kw("where") ~> expr

  /** Planner hints (`USING INDEX [SEEK] v:L(p, …)`, `USING SCAN v:L`,
    * `USING JOIN ON v, …`): accepted and VALIDATED — each hinted
    * variable must appear in the clause's patterns (node OR
    * relationship variables; Neo4j 5 index hints take both) — but not
    * plan-binding. Catalyst owns physical planning, and
    * RANGE-projection routing is automatic where a backing exists.
    * INDEX hints additionally carry their (label, props) identity up
    * the AST so the session can raise Neo4j's missing-index error. */
  private def usingHint: Parser[(Seq[String], Option[IndexHint])] =
    kw("using") ~> (
      (kw("index") ~> opt(kw("seek")) ~> ident ~ (":" ~> ident) ~
        ("(" ~> rep1sep(ident, ",") <~ ")") ^^ {
          case v ~ l ~ props => (Seq(v), Some(IndexHint(v, l, props)))
        }) |
      (kw("scan") ~> ident <~ (":" ~ ident) ^^ (v => (Seq(v), None))) |
      (kw("join") ~> kw("on") ~> rep1sep(ident, ",") ^^ (vs => (vs, None))))

  private def validateHints(hints: Seq[Seq[String]], ps: Seq[PathPat]): Unit = {
    val vars = ps.flatMap(p => (p.start.variable ++ p.hops.flatMap { case (r, n) =>
      r.variable ++ n.variable }).toSeq).toSet
    hints.flatten.find(!vars.contains(_)).foreach { v =>
      throw new IllegalArgumentException(
        s"USING hint names `$v`, which is not a variable of the MATCH pattern")
    }
  }

  private def matchClause: Parser[Match] =
    opt(kw("optional")) ~ (kw("match") ~> patternList) ~ rep(usingHint) ~
      opt(whereClause) ^^ {
        case o ~ ps ~ hints ~ w =>
          validateHints(hints.map(_._1), ps)
          Match(ps, o.isDefined, w, hints.flatMap(_._2))
      }

  /** `MATCH p = shortestPath((a)-[:T*..k]->(b)) [WHERE …]` — tried
    * before matchClause; a plain MATCH starts with `(` and fails the
    * `ident =`. */
  private def shortestMatch: Parser[MatchShortest] =
    (kw("match") ~> ident <~ "=") ~ (kw("allShortestPaths") | kw("shortestPath")) ~
      ("(" ~> pathPat <~ ")") ~ opt(whereClause) ^^ {
        case v ~ fn ~ p ~ w =>
          MatchShortest(v, p, w, all = fn.equalsIgnoreCase("allShortestPaths"))
      }

  /** `MATCH p = (a)-[:T]->(b)…` — plain path assignment; tried after
    * shortestMatch (whose RHS starts with the shortestPath keyword,
    * not `(`). */
  private def plainPathMatch: Parser[MatchPath] =
    opt(kw("optional")) ~ (kw("match") ~> ident <~ "=") ~ pathPat ~ opt(whereClause) ^^ {
      case o ~ v ~ p ~ w => MatchPath(v, p, w, optional = o.isDefined)
    }

  private def createClause: Parser[Create] =
    kw("create") ~> patternList ^^ Create.apply

  private def labelItem: Parser[(String, Seq[String])] =
    ident ~ rep1(":" ~> ident) ^^ { case v ~ ls => (v, ls) }

  /** Pattern-map value re-encoded as a SET expression (`SET n += {a:
    * $p, b: m.k, c: 1}` reuses mapLit, whose references are wrapped). */
  private def mapValueExpr(l: Lit): Expr = l.v match {
    case ParamRefValue(n)   => Param(n)
    case PropRefValue(v, k) => Prop(v, k)
    case VarRefValue(n)     => Variable(n)
    case SubscriptRefValue(v, k, i) =>
      Subscript(k.map(Prop(v, _)).getOrElse(Variable(v)), Lit(i))
    case _                  => l
  }

  private def setClause: Parser[Clause] =
    kw("set") ~> (
      rep1sep((ident <~ "+=") ~ mapLit, ",") ^^ { items =>
        SetProps(items.flatMap { case v ~ m =>
          m.toSeq.sortBy(_._1).map { case (k, l) => (Prop(v, k), mapValueExpr(l)) }
        })
      }
      // whole-map PARAMETER forms (`SET n += $props`, `SET n = $props`
      // — the drivers' dynamic-update idiom): expanded by Params once
      // the map is bound
      | (ident <~ "+=") ~ ("$" ~> ident) ^^ { case v ~ p =>
        SetPropsParam(v, p, replace = false)
      }
      // `SET n = {map}` — FULL replace (`+=` already failed to parse,
      // so a bare `=` here is unambiguous; `n.k = expr` has a dot)
      | (ident <~ "=") ~ mapLit ^^ { case v ~ m =>
        SetPropsReplace(v,
          m.toSeq.sortBy(_._1).map { case (k, l) => (k, mapValueExpr(l)) })
      }
      | (ident <~ "=") ~ ("$" ~> ident) ^^ { case v ~ p =>
        SetPropsParam(v, p, replace = true)
      }
      | rep1sep((ident ~ ("." ~> ident) ~ ("=" ~> expr)), ",") ^^ { items =>
        SetProps(items.map { case v ~ k ~ e => (Prop(v, k), e) })
      }
      | rep1sep(labelItem, ",") ^^ (items => SetLabels(items, remove = false)))

  private def removeClause: Parser[Clause] =
    kw("remove") ~> (
      rep1sep(ident ~ ("." ~> ident), ",") ^^ { items =>
        RemoveProps(items.map { case v ~ k => Prop(v, k) })
      }
      | rep1sep(labelItem, ",") ^^ (items => SetLabels(items, remove = true)))

  private def deleteClause: Parser[Delete] =
    opt(kw("detach")) ~ (kw("delete") ~> rep1sep(ident, ",")) ^^ {
      case d ~ vs => Delete(vs, d.isDefined)
    }

  private def propAssign: Parser[(Prop, Expr)] =
    ident ~ ("." ~> ident) ~ ("=" ~> expr) ^^ { case v ~ k ~ e => (Prop(v, k), e) }

  private def mergeClause: Parser[Merge] =
    kw("merge") ~> pathPat ~
      rep((kw("on") ~> (kw("create") | kw("match"))) ~ (kw("set") ~> rep1sep(propAssign, ","))) ^^ {
      case p ~ handlers =>
        val creates = handlers.collect { case b ~ items if b.equalsIgnoreCase("create") => items }
        val matches0 = handlers.collect { case b ~ items if b.equalsIgnoreCase("match") => items }
        Merge(p, creates.flatten, matches0.flatten)
    }

  private def returnItem: Parser[ReturnItem] =
    expr ~ opt(kw("as") ~> ident) ^^ { case e ~ a => ReturnItem(e, a) }

  private def orderItem: Parser[(Expr, Boolean)] =
    expr ~ opt(kw("desc") | kw("asc")) ^^ { case e ~ d => (e, !d.contains("DESC")) }

  /** SKIP/LIMIT argument: an integer literal or a `$param` (resolved
    * to an integer literal by Params.substitute before compile). */
  private def skipLimitArg: Parser[Expr] =
    """\d+""".r ^^ (s => Lit(s.toLong): Expr) |
    "$" ~> ident ^^ (n => Param(n): Expr)

  private def tail: Parser[(Seq[(Expr, Boolean)], Option[Expr], Option[Expr])] =
    opt(kw("order") ~> kw("by") ~> rep1sep(orderItem, ",")) ~
    opt(kw("skip") ~> skipLimitArg) ~ opt(kw("limit") ~> skipLimitArg) ^^ {
      case ob ~ sk ~ li => (ob.getOrElse(Nil), sk, li)
    }

  /** `*` (all bound variables) optionally followed by more items:
    * `RETURN *`, `WITH *, x AS y`. Expanded against the bound columns
    * at compile time. */
  private def itemList: Parser[Seq[ReturnItem]] =
    "*" ~> opt("," ~> rep1sep(returnItem, ",")) ^^ {
      extra => ReturnItem(Variable("*"), None) +: extra.getOrElse(Nil)
    } |
    rep1sep(returnItem, ",")

  private def returnClause: Parser[Return] =
    kw("return") ~> opt(kw("distinct")) ~ itemList ~ tail ^^ {
      case d ~ items ~ ((ob, sk, li)) => Return(items, d.isDefined, ob, sk, li)
    }

  private def withClause: Parser[With] =
    kw("with") ~> opt(kw("distinct")) ~ itemList ~ tail ~ opt(whereClause) ^^ {
      case d ~ items ~ ((ob, sk, li)) ~ w => With(items, d.isDefined, w, ob, sk, li)
    }

  private def callClause: Parser[CallProc] =
    (kw("call") ~> qualIdent) ~ opt("(" ~> repsep(expr, ",") <~ ")") ~
      opt(kw("yield") ~> rep1sep(yieldItem, ",")) ~ opt(whereClause) ^^ {
      case n ~ args ~ ys ~ w => CallProc(n, args.getOrElse(Nil), ys.getOrElse(Nil), w)
    }

  private def yieldItem: Parser[(String, String)] =
    ident ~ opt(kw("as") ~> ident) ^^ { case n ~ a => (n, a.getOrElse(n)) }

  private def unwindClause: Parser[Unwind] =
    (kw("unwind") ~> expr) ~ (kw("as") ~> ident) ^^ { case e ~ a => Unwind(e, a) }

  /** `CALL { [WITH imports] … }` and the Neo4j 5.23 scope form
    * `CALL (x, y) { … }` / `CALL () { … }` — tried before callClause;
    * a plain procedure CALL fails the `{` and backtracks. The
    * parenthesized scope desugars to the legacy WITH-import list
    * (`()` = no imports = uncorrelated, same as bare `CALL { … }`).
    * `CALL (*) { … }` would need the full outer variable list at
    * parse time — refused loudly rather than silently uncorrelated. */
  private def callSubClause: Parser[CallSub] = {
    val scopeImports: Parser[Seq[String]] =
      "(" ~> "*" <~ ")" ^^ (_ => throw new UnsupportedOperationException(
        "CALL (*) { … } is not supported — list the imported variables explicitly")) |
      "(" ~> repsep(ident, ",") <~ ")"
    ((kw("call") ~> opt(scopeImports)) ~ ("{" ~> opt(kw("with") ~> rep1sep(ident, ",")) ~
      (rep1(clause) ~ rep((kw("union") ~> opt(kw("all"))) ~ rep1(clause))) <~ "}") ~
      opt(kw("in") ~>
        // `IN [k] CONCURRENT TRANSACTIONS` (Neo4j 5.21+): the
        // concurrency k is an execution hint — batches run through
        // the same chunked-commit machinery (Spark parallelizes
        // inside each batch; sequential batch commits are a valid
        // serialization of concurrent ones), so the hint parses and
        // drops
        (opt(opt(numberLit) <~ kw("concurrent")) ~> kw("transactions")) ~>
        (opt(kw("of") ~> numberLit <~ kw("rows")) ~
          // Neo4j 5.23 batch-failure policy
          opt(kw("on") ~> kw("error") ~>
            (kw("continue") | kw("break") | kw("fail")))))) ^^ {
      case scope ~ (imp ~ (cls ~ us)) ~ itx =>
        if (scope.nonEmpty && imp.nonEmpty) throw new IllegalArgumentException(
          "CALL (scope) { … } cannot also declare a WITH import list")
        CallSub(scope.getOrElse(imp.getOrElse(Nil)), cls, itx.isDefined,
          itx.flatMap(_._1).map {
            case Lit(n: Long) => n
            case Lit(other) => throw new IllegalArgumentException(
              s"IN TRANSACTIONS OF n ROWS needs an integer, got $other")
          },
          itx.flatMap(_._2),
          unions = us.map { case all ~ q => (all.isDefined, q) })
    }
  }

  private def foreachClause: Parser[Foreach] =
    (kw("foreach") ~> "(" ~> ident <~ kw("in")) ~ expr ~ ("|" ~> rep1(clause)) <~ ")" ^^ {
      case v ~ l ~ body => Foreach(v, l, body)
    }

  private def clause: Parser[Clause] =
    shortestMatch | plainPathMatch | matchClause | createClause | mergeClause | setClause | removeClause |
      deleteClause | withClause | returnClause | callSubClause | callClause |
      unwindClause | foreachClause

  private def singleQuery: Parser[Query] = rep1(clause) ^^ (cs => Query(cs))

  private def query: Parser[Query] =
    singleQuery ~ rep((kw("union") ~> opt(kw("all"))) ~ singleQuery) ^^ {
      case h ~ t => h.copy(unions = t.map { case all ~ q => (all.isDefined, q) })
    }

  /** Parse one standalone expression (SHOW/YIELD WHERE tails reuse
    * the full Cypher expression grammar rather than growing a second
    * mini-parser). */
  def parseExpr(s: String): Expr = parseAll(expr, s) match {
    case Success(res, _) => res
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"Cypher expression parse error at ${next.pos.column}: $msg")
    case other => throw new IllegalArgumentException(s"Cypher expression parse error: $other")
  }

  def parse(q: String): Query = parseAll(query, q) match {
    case Success(res, _) => res
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"Cypher parse error at ${next.pos.line}:${next.pos.column}: $msg\n${next.pos.longString}")
    case other => throw new IllegalArgumentException(s"Cypher parse error: $other")
  }
}
