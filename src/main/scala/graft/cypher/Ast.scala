package graft.cypher

import graft.graph.PatternParser.PathPat

/** Cypher query AST (clauses + expressions).
  *
  * Reference analog: the clause/expression AST in
  * /root/reference/src/parser.ts:7-180 (interfaces `CypherQuery`,
  * `MatchClause`, `Expression`, ...). Re-expressed as Scala case classes;
  * graph patterns reuse [[graft.graph.PatternParser]]'s AST so the string
  * front-end and the fluent API compile through one pattern pipeline.
  */
object Ast {

  sealed trait Expr

  /** `*` inside count(*). */
  case object Star extends Expr
  final case class Lit(v: Any) extends Expr
  /** `$name` — resolved from the params map at compile time. */
  final case class Param(name: String) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(items: Seq[(String, Expr)]) extends Expr
  final case class Var(name: String) extends Expr
  final case class Prop(base: Expr, key: String) extends Expr
  final case class Func(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  /** op ∈ + - * / % ^ = <> < <= > >= AND OR XOR IN STARTS ENDS CONTAINS =~ */
  final case class Bin(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr
  final case class CaseExpr(subject: Option[Expr], whens: Seq[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  final case class Index(base: Expr, idx: Expr) extends Expr
  final case class Slice(base: Expr, from: Option[Expr], to: Option[Expr]) extends Expr
  /** `[x IN list WHERE p | e]` */
  final case class Comprehension(v: String, list: Expr, where: Option[Expr],
      proj: Option[Expr]) extends Expr
  /** all / any / none / single `(x IN list WHERE p)` */
  final case class Quantifier(kind: String, v: String, list: Expr, where: Expr) extends Expr
  /** `reduce(acc = init, x IN list | e)` */
  final case class ReduceExpr(acc: String, init: Expr, v: String, list: Expr,
      proj: Expr) extends Expr
  /** `exists((a)-[:T]->(b))` / bare pattern predicate in WHERE → semi/anti join. */
  final case class PatternPred(paths: Vector[PathPat], negated: Boolean) extends Expr
  /** `[(u)-[:T]->(i) WHERE p | e]` — correlated collect over a pattern
    * (reference: parser.ts:3163-3266). Compiles to groupBy + collect_list
    * joined back on the bound variables. */
  final case class PatternComp(path: PathPat, where: Option[Expr], proj: Expr) extends Expr
  /** `u{.name, .*, total: expr}` map projection (reference: parser.ts:3231). */
  final case class MapProj(v: String, props: Seq[String],
      entries: Seq[(String, Expr)], star: Boolean) extends Expr
  /** label predicate `n:Label` in WHERE. */
  final case class LabelPred(v: String, label: String) extends Expr

  final case class Item(expr: Expr, alias: Option[String], text: String) {
    def name: String = alias.getOrElse(text)
  }
  final case class SortItem(expr: Expr, asc: Boolean, text: String)
  final case class Projection(items: Seq[Item], distinct: Boolean,
      orderBy: Seq[SortItem], skip: Option[Expr], limit: Option[Expr],
      where: Option[Expr])

  sealed trait Clause
  final case class MatchClause(paths: Vector[PathPat], optional: Boolean,
      where: Option[Expr],
      /** path variable -> index into `paths` (`MATCH p = (a)-->(b)`). */
      pathVars: Map[String, Int] = Map.empty) extends Clause
  final case class WithClause(p: Projection) extends Clause
  final case class UnwindClause(list: Expr, alias: String) extends Clause
  /** CALL db.labels() YIELD label — catalog procedures only. */
  final case class CallClause(procedure: String, yields: Seq[String],
      where: Option[Expr] = None) extends Clause
  final case class ReturnClause(p: Projection) extends Clause

  // ---- write clauses (compiled by CypherWriter) ----
  final case class CreateClause(paths: Vector[PathPat]) extends Clause
  /** items are (Prop(Var(v), key) -> value). */
  final case class MergeClause(path: PathPat, onCreate: Seq[(Expr, Expr)],
      onMatch: Seq[(Expr, Expr)]) extends Clause
  final case class SetClause(items: Seq[(Expr, Expr)]) extends Clause
  final case class DeleteClause(vars: Seq[String], detach: Boolean) extends Clause
  /** items are Prop(Var(v), key). */
  final case class RemoveClause(items: Seq[Expr]) extends Clause

  final case class SingleQuery(clauses: Seq[Clause])
  /** parts.size == unionAll.size + 1; unionAll(i) is true for UNION ALL. */
  final case class Query(parts: Seq[SingleQuery], unionAll: Seq[Boolean])
}
