package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Odoo-style domain predicates compiled to Catalyst [[Column]] expressions.
  *
  * The reference stores filters as polish-notation lists
  * (`['&', ('date','>=',d), '|', ...]`) and compiles them to SQL WHERE via
  * `_where_calc().get_sql()` (account_reports/models/account_report.py:
  * 1487-1501, :2770-2778; operator set :606-620). Here the same spec
  * compiles to a `Column`, so Catalyst pushes it into the parquet scan —
  * predicate pushdown is free (SURVEY §4.1).
  *
  * Scale: a compiled domain is pure expression code — no driver data, no
  * UDFs; it stays inside whole-stage codegen.
  */
object Domain {

  sealed trait Node
  final case class Cond(field: String, op: String, value: Any) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(n: Node) extends Node
  case object TrueLeaf extends Node

  /** Parse the reference's prefix-operator list form. Elements are either
    * the strings "&" "|" "!" or a `(field, op, value)` tuple. Like the
    * reference, consecutive leaves are implicitly AND-ed. */
  def parse(items: Seq[Any]): Node = {
    def one(rest: List[Any]): (Node, List[Any]) = rest match {
      case "&" :: t => val (l, t1) = one(t); val (r, t2) = one(t1); (And(l, r), t2)
      case "|" :: t => val (l, t1) = one(t); val (r, t2) = one(t1); (Or(l, r), t2)
      case "!" :: t => val (n, t1) = one(t); (Not(n), t1)
      case (f: String, op: String, v: Any) :: t => (Cond(f, op, v), t)
      case ((f: String, op: String)) :: t => (Cond(f, op, null), t)
      case Nil => (TrueLeaf, Nil)
      case x :: _ => throw new IllegalArgumentException(s"bad domain element: $x")
    }
    @annotation.tailrec
    def all(rest: List[Any], acc: Node): Node =
      if (rest.isEmpty) acc
      else { val (n, t) = one(rest); all(t, if (acc == TrueLeaf) n else And(acc, n)) }
    all(items.toList, TrueLeaf)
  }

  private def toLit(v: Any): Column = v match {
    case c: Column => c
    case other => lit(other)
  }

  /** Compile to a Column. `resolve` maps a (possibly dotted) field path to a
    * Column — dotted paths are the caller's pre-joined dimension columns
    * (SURVEY §2.2 P1). */
  def compile(n: Node, resolve: String => Column = defaultResolve): Column = n match {
    case TrueLeaf => lit(true)
    case And(l, r) => compile(l, resolve) && compile(r, resolve)
    case Or(l, r) => compile(l, resolve) || compile(r, resolve)
    case Not(x) => !compile(x, resolve)
    case Cond(f, op, v) =>
      val c = resolve(f)
      op match {
        case "=" => if (v == null) c.isNull else c === toLit(v)
        case "!=" => if (v == null) c.isNotNull else c =!= toLit(v)
        case "<" => c < toLit(v)
        case "<=" => c <= toLit(v)
        case ">" => c > toLit(v)
        case ">=" => c >= toLit(v)
        case "in" => c.isin(seqOf(v): _*)
        case "not in" => !c.isin(seqOf(v): _*)
        // Odoo: 'like' wraps with % on both sides, '=like' is a raw pattern,
        // 'ilike' is case-insensitive contains.
        case "like" => c.contains(toLit(v))
        case "ilike" => lower(c).contains(lower(toLit(v)))
        case "not like" => !c.contains(toLit(v))
        case "not ilike" => !lower(c).contains(lower(toLit(v)))
        case "=like" => c.like(v.toString)
        case "=ilike" => lower(c).like(v.toString.toLowerCase)
        case "child_of" => throw new IllegalArgumentException(
          "child_of needs a hierarchy: use compile(n, resolve, descendants)")
        case other => throw new IllegalArgumentException(s"unsupported op: $other")
      }
  }

  /** Compile with hierarchy support: `child_of` (Odoo: the record and all
    * its descendants via parent_id) becomes a set-membership predicate over
    * the precomputed descendant closure — the dimension tree is driver-side
    * small (account groups, locations), the closure ships as an isin/IN
    * list (or a broadcast-join DF for big hierarchies). */
  def compile(n: Node, resolve: String => Column,
              descendants: Any => Seq[Any]): Column =
    compile(n, resolve, descendants, _ => Nil)

  /** Full hierarchy support: `child_of` via the descendant closure,
    * `parent_of` (Odoo: the record and all its ancestors via parent_id)
    * via the ancestor closure. */
  def compile(n: Node, resolve: String => Column,
              descendants: Any => Seq[Any],
              ancestors: Any => Seq[Any]): Column = n match {
    case Cond(f, "child_of", v) =>
      val members = (seqOf(v).flatMap(p => descendants(p)) ++ seqOf(v)).distinct
      resolve(f).isin(members: _*)
    case Cond(f, "parent_of", v) =>
      val members = (seqOf(v).flatMap(p => ancestors(p)) ++ seqOf(v)).distinct
      resolve(f).isin(members: _*)
    case And(l, r) =>
      compile(l, resolve, descendants, ancestors) &&
        compile(r, resolve, descendants, ancestors)
    case Or(l, r) =>
      compile(l, resolve, descendants, ancestors) ||
        compile(r, resolve, descendants, ancestors)
    case Not(x) => !compile(x, resolve, descendants, ancestors)
    case other => compile(other, resolve)
  }

  /** Transitive-descendant closure from (child, parent) edges — the
    * reference's parent_id trees (account.group, stock.location). */
  def descendantsOf(edges: Seq[(Any, Any)]): Any => Seq[Any] = {
    val children = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1) }
    (root: Any) => {
      val out = scala.collection.mutable.ListBuffer[Any]()
      var frontier = children.getOrElse(root, Nil)
      while (frontier.nonEmpty) {
        out ++= frontier
        frontier = frontier.flatMap(c => children.getOrElse(c, Nil))
      }
      out.toSeq
    }
  }

  /** Transitive-ancestor closure from (child, parent) edges — the
    * upward walk `parent_of` needs. */
  def ancestorsOf(edges: Seq[(Any, Any)]): Any => Seq[Any] = {
    val parent = edges.toMap
    (leaf: Any) => {
      val out = scala.collection.mutable.ListBuffer[Any]()
      var cur = parent.get(leaf)
      while (cur.isDefined && !out.contains(cur.get)) {
        out += cur.get
        cur = parent.get(cur.get)
      }
      out.toSeq
    }
  }

  private def seqOf(v: Any): Seq[Any] = v match {
    case s: Seq[_] => s
    case other => Seq(other)
  }

  /** Default field resolver: dots become the caller's flattened join-column
    * convention (`account_id.code` → `account_id_code`). */
  def defaultResolve(f: String): Column = col(f.replace('.', '_'))

  def compile(items: Seq[Any]): Column = compile(parse(items))
}
