package graft.cypher

import ast._

/** Query-parameter substitution: replaces every `$name` (`Param` in
  * expression position, `ParamRefValue` in pattern property maps)
  * with the literal value from the caller's parameter map BEFORE
  * compilation, so the whole compiler keeps working on plain `Lit`s.
  *
  * Mirrors the reference driver API, where every `session.run` call
  * carries a parameter map (ref
  * src/test/java/com/neo4j/docker/utils/DatabaseIO.java:121-132);
  * a `$name` with no binding raises "Expected parameter(s): name",
  * the observable reference error.
  */
object Params {

  /** Marker property key the parser uses to encode a WHOLE-MAP
    * parameter in a pattern (`(n:L $props)`); expanded by [[props]].
    * Not a legal Cypher identifier, so it can never collide. */
  val WholeMapKey = "$wholeMap"

  def substitute(q: Query, params: Map[String, Any]): Query =
    Query(q.clauses.map(clause(_, params)),
      q.unions.map { case (all, sub) => (all, substitute(sub, params)) })

  private def clause(c: Clause, ps: Map[String, Any]): Clause = c match {
    case Match(pats, opt, where, hints) =>
      Match(pats.map(path(_, ps)), opt, where.map(expr(_, ps)), hints)
    case MatchShortest(v, pat, where, all) =>
      MatchShortest(v, path(pat, ps), where.map(expr(_, ps)), all)
    case Create(pats)            => Create(pats.map(path(_, ps)))
    case SetProps(items)         => SetProps(items.map { case (p, e) => (p, expr(e, ps)) })
    case SetPropsReplace(v, items) =>
      SetPropsReplace(v, items.map { case (k, e) => (k, expr(e, ps)) })
    case SetPropsParam(v, name, replace) =>
      val bound = ps.getOrElse(name, throw new IllegalArgumentException(
        s"Expected parameter(s): $name"))
      val items = bound match {
        case m: scala.collection.Map[_, _] =>
          m.asInstanceOf[scala.collection.Map[String, Any]].toSeq.sortBy(_._1)
            .map { case (k, value) => (k, Lit(value): Expr) }
        case other => throw new IllegalArgumentException(
          s"SET $v ${if (replace) "=" else "+="} $$$name needs a map parameter, got $other")
      }
      if (replace) SetPropsReplace(v, items)
      else SetProps(items.map { case (k, l) => (Prop(v, k), l) })
    case Merge(pat, oc, om) =>
      Merge(path(pat, ps),
        oc.map { case (p, e) => (p, expr(e, ps)) },
        om.map { case (p, e) => (p, expr(e, ps)) })
    case With(items, d, w, ob, sk, li) =>
      With(items.map(item(_, ps)), d, w.map(expr(_, ps)),
        ob.map { case (e, asc) => (expr(e, ps), asc) },
        sk.map(expr(_, ps)), li.map(expr(_, ps)))
    case Return(items, d, ob, sk, li) =>
      Return(items.map(item(_, ps)), d,
        ob.map { case (e, asc) => (expr(e, ps), asc) },
        sk.map(expr(_, ps)), li.map(expr(_, ps)))
    case CallProc(n, args, ys, w) =>
      CallProc(n, args.map(expr(_, ps)), ys, w.map(expr(_, ps)))
    case Unwind(e, a) => Unwind(expr(e, ps), a)
    case CallSub(imp, cls, itx, n, oe, us) =>
      CallSub(imp, cls.map(clause(_, ps)), itx, n, oe,
        us.map { case (all, q) => (all, q.map(clause(_, ps))) })
    case Foreach(v, l, body) => Foreach(v, expr(l, ps), body.map(clause(_, ps)))
    case other        => other // RemoveProps / SetLabels / Delete carry no exprs
  }

  private def item(i: ReturnItem, ps: Map[String, Any]): ReturnItem = {
    // keep the pre-substitution default name: `RETURN $p` names its
    // column after the parameter, not the value
    val name = i.alias.getOrElse(ast.defaultName(i.expr))
    ReturnItem(expr(i.expr, ps), Some(name))
  }

  private def path(p: PathPat, ps: Map[String, Any]): PathPat =
    PathPat(node(p.start, ps), p.hops.map { case (r, n) =>
      (r.copy(props = props(r.props, ps)), node(n, ps))
    })

  private def node(n: NodePat, ps: Map[String, Any]): NodePat =
    n.copy(props = props(n.props, ps))

  private def props(m: Map[String, Lit], ps: Map[String, Any]): Map[String, Lit] =
    m.flatMap {
      // whole-map parameter (`(n:L $props)`): the marker expands to
      // the bound map's literal entries; explicit entries alongside
      // cannot occur (the parser allows one map form per pattern)
      case (WholeMapKey, Lit(ParamRefValue(name))) =>
        ps.getOrElse(name, throw new IllegalArgumentException(
          s"Expected parameter(s): $name")) match {
          case mm: scala.collection.Map[_, _] =>
            mm.asInstanceOf[scala.collection.Map[String, Any]].toSeq.sortBy(_._1)
              .map { case (k, v) => k -> Lit(v) }
          case other => throw new IllegalArgumentException(
            s"pattern map parameter $$$name must be a map, got $other")
        }
      case (k, Lit(ParamRefValue(name))) => Seq(k -> Lit(scalar(name, ps)))
      case kv                            => Seq(kv)
    }

  private def expr(e: Expr, ps: Map[String, Any]): Expr = e match {
    case Param(name) => resolve(name, ps)
    case Cmp(op, l, r)      => Cmp(op, expr(l, ps), expr(r, ps))
    case And(l, r)          => And(expr(l, ps), expr(r, ps))
    case Or(l, r)           => Or(expr(l, ps), expr(r, ps))
    case Not(x)             => Not(expr(x, ps))
    case In(x, list)        =>
      // `x IN $list` expands the bound list into the literal IN-list
      list match {
        case Seq(Param(name)) => resolve(name, ps) match {
          case ListLit(items) => In(expr(x, ps), items)
          case one            => In(expr(x, ps), Seq(one))
        }
        case _ => In(expr(x, ps), list.map(expr(_, ps)))
      }
    case StringPred(op, l, r) => StringPred(op, expr(l, ps), expr(r, ps))
    case IsNull(x, n)       => IsNull(expr(x, ps), n)
    case Arith(op, l, r)    => Arith(op, expr(l, ps), expr(r, ps))
    case ListLit(items)     => ListLit(items.map(expr(_, ps)))
    case FnCall(n, args, d) => FnCall(n, args.map(expr(_, ps)), d)
    case CaseExpr(ws, o) =>
      CaseExpr(ws.map { case (c, v) => (expr(c, ps), expr(v, ps)) }, o.map(expr(_, ps)))
    case ListComp(v, l, w, pr) =>
      ListComp(v, expr(l, ps), w.map(expr(_, ps)), pr.map(expr(_, ps)))
    case ListPred(fn, v, l, p) => ListPred(fn, v, expr(l, ps), expr(p, ps))
    case ReduceExpr(acc, init, v, l, e) =>
      ReduceExpr(acc, expr(init, ps), v, expr(l, ps), expr(e, ps))
    case Subscript(e0, i) => Subscript(expr(e0, ps), expr(i, ps))
    case ListSlice(e0, lo, hi) =>
      ListSlice(expr(e0, ps), lo.map(expr(_, ps)), hi.map(expr(_, ps)))
    case MapProj(v, items) => MapProj(v, items.map {
      case ProjExpr(k, e0) => ProjExpr(k, expr(e0, ps))
      case other           => other
    })
    case PatternPred(pat)   => PatternPred(path(pat, ps))
    case PatternComp(pat, w, pr) =>
      PatternComp(path(pat, ps), w.map(expr(_, ps)), expr(pr, ps))
    case ExistsSub(pats, w) => ExistsSub(pats.map(path(_, ps)), w.map(expr(_, ps)))
    case CountSub(pats, w)  => CountSub(pats.map(path(_, ps)), w.map(expr(_, ps)))
    case other              => other // Lit / Variable / Prop / LambdaVar
  }

  private def resolve(name: String, ps: Map[String, Any]): Expr =
    ps.get(name) match {
      case None => throw new IllegalArgumentException(s"Expected parameter(s): $name")
      case Some(v) => toExpr(v)
    }

  private def toExpr(v: Any): Expr = v match {
    case s: Seq[_]   => ListLit(s.map(toExpr))
    case a: Array[_] => ListLit(a.toSeq.map(toExpr))
    case other       => Lit(norm(other))
  }

  private def scalar(name: String, ps: Map[String, Any]): Any =
    ps.get(name) match {
      case None => throw new IllegalArgumentException(s"Expected parameter(s): $name")
      case Some(v) => norm(v)
    }

  /** Normalize to the types the parser itself produces, so a
    * parameterized query compiles identically to its inlined twin. */
  private def norm(v: Any): Any = v match {
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case b: Byte  => b.toLong
    case f: Float => f.toDouble
    case other    => other
  }
}
