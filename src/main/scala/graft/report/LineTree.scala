package graft.report

/** The report line tree (SURVEY §2.7 O2, §2.4 A16, §3.1 post-processing):
  * the reference renders hierarchical report lines and post-processes them
  * driver-side — hierarchy rollup from account-group parents
  * (account_report.py:845-994), sibling sort with totals pinned last
  * (:3436-3542), hide-if-zero pruning (:1824-1852).
  *
  * These run on the *collected, already-aggregated* line set (thousands of
  * rows at most, regardless of fact size) — pure Scala by design, exactly
  * where the reference also leaves SQL.
  */
object LineTree {

  final case class Line(id: String, parentId: Option[String], name: String,
                        values: Seq[Double], isTotal: Boolean = false)

  final case class Node(line: Line, children: Seq[Node]) {
    /** Rolled-up values: leaf values plus all descendants'. */
    lazy val rollup: Seq[Double] =
      children.foldLeft(line.values)((acc, c) =>
        acc.zipAll(c.rollup, 0.0, 0.0).map { case (a, b) => a + b })
  }

  /** Build the forest from a flat line list (stable order preserved). */
  def build(lines: Seq[Line]): Seq[Node] = {
    val byParent = lines.groupBy(_.parentId)
    def mk(l: Line): Node = Node(l, byParent.getOrElse(Some(l.id), Nil).map(mk))
    byParent.getOrElse(None, Nil).map(mk)
  }

  /** Tree-aware sort (reference :3436-3542, documented example :3449-3476):
    * siblings ordered by their OWN value in column `colIdx` (descending if
    * `desc`), recursively; total lines pinned to the bottom of their
    * sibling group; name as deterministic tiebreaker. */
  def sortTree(roots: Seq[Node], colIdx: Int, desc: Boolean): Seq[Node] = {
    def key(n: Node): Double = n.line.values.lift(colIdx).getOrElse(0.0)
    def rec(ns: Seq[Node]): Seq[Node] = {
      val (totals, rest) = ns.partition(_.line.isTotal)
      val sorted = rest.sortBy(n => (key(n), n.line.name))(
        Ordering.Tuple2(if (desc) Ordering[Double].reverse else Ordering[Double],
          Ordering[String]))
      (sorted ++ totals).map(n => n.copy(children = rec(n.children)))
    }
    rec(roots)
  }

  /** Hide-if-zero pruning (reference :1824-1852): drop any leaf subtree
    * whose rolled-up values are all (within eps of) zero; total lines are
    * presentation rows and survive. */
  def hideZero(roots: Seq[Node], eps: Double = 1e-9): Seq[Node] =
    roots.flatMap { n =>
      val kept = n.copy(children = hideZero(n.children, eps))
      if (!kept.line.isTotal && kept.children.isEmpty &&
          kept.rollup.forall(v => math.abs(v) < eps)) None
      else Some(kept)
    }

  /** Flatten back to display order with depth. */
  def flatten(roots: Seq[Node], depth: Int = 0): Seq[(Int, Line)] =
    roots.flatMap(n => (depth, n.line) +: flatten(n.children, depth + 1))
}
