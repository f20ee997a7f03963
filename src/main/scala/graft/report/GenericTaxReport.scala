package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The generic tax report's "default part" — the NET | TAX matrix per
  * type section, under its three groupings (flat by tax, account → tax,
  * tax → account) and any number of comparison column groups
  * (reference account_generic_tax_report.py:115-272
  * `_read_generic_tax_report_amounts_no_tax_details` + :380-508 line
  * population; matrices pinned by
  * account_reports/tests/test_tax_report_default_part.py).
  *
  * Base-amount attribution, per (aml, tax-on-it) pair (:197-230):
  *  - a TAX aml affecting the base of a child of its OWN non-expanded
  *    group is ignored (the group's base must stay the original base);
  *  - a tax aml affecting a 'none' tax that belongs to a group books the
  *    extra base on the GROUP, once per (group, column group);
  *  - otherwise the base books on the tax itself, under the src group's
  *    (or src tax's) type section;
  *  - a base aml's group tax expands to one base row per child when any
  *    child has a real type, else books on the group row itself.
  * Tax amounts (:232-271): a tax aml books on its group when the group
  * is non-expanded, else on the tax, always under the group's type.
  * Sale sections display with sign −1, purchase +1; zero cells blank.
  *
  * Scale: both inputs pre-aggregate per (period, account, tax triple)
  * in ONE groupBy each — bounded by the tax-dim × account-dim product —
  * before the dimension-sized attribution and layout run driver-side.
  */
object GenericTaxReport {

  /** The tax dim. `use` ∈ sale/purchase/none; group taxes carry their
    * ordered children. */
  final case class Tax(id: Long, name: String, use: String,
                       isGroup: Boolean = false, children: Seq[Long] = Nil,
                       sequence: Int = 0)

  sealed trait Grouping
  case object Flat extends Grouping
  case object AccountTax extends Grouping
  case object TaxAccount extends Grouping

  /** One report row: `cells` interleaves (net, tax) per column group,
    * None = blank (no data, or zero under blank-if-zero). */
  final case class Line(name: String, level: Int, cells: Seq[Option[Double]])

  private def isZero(v: Double): Boolean = math.abs(v) < 0.005

  /** `baseRows`: (period, account, tax_id, src_tax_id nullable,
    * src_group_tax_id nullable, balance) — one row per (aml, tax in its
    * tax_ids); tax amls carry their own tax in src_tax_id.
    * `taxRows`: (period, account, tax_id, group_tax_id nullable,
    * balance) — one row per tax aml.
    * `periods`: column-group keys in display order. */
  def compute(baseRows: DataFrame, taxRows: DataFrame, taxes: Seq[Tax],
              periods: Seq[String], grouping: Grouping,
              accountNames: Map[String, String] = Map.empty): Seq[Line] = {
    val byId = taxes.map(t => t.id -> t).toMap
    val childToGroup: Map[Long, Tax] =
      taxes.filter(_.isGroup).flatMap(g => g.children.map(_ -> g)).toMap
    def toExpand(g: Tax): Boolean =
      g.children.exists(c => byId.get(c).exists(_.use != "none"))
    // rows referencing a tax id absent from the dim (an archived tax a
    // journal line still carries) sort by raw id and are SKIPPED by the
    // attribution below — an orphan row must never abort the report.
    // A MISSING id sorts LAST (Postgres ORDER BY defaults to NULLS LAST,
    // and the reference's flat query relies on it: when a grouped and an
    // ungrouped src both hit the same group's 'none' child in one period,
    // the grouped combo must win the once-per-group extra-base slot);
    // (Int.MaxValue, Long.MaxValue) also sorts it AFTER orphan ids, which
    // carry (Int.MaxValue, id < Long.MaxValue).
    def sortKey(id: Option[Long]): (Int, Long) =
      id.map(i => (byId.get(i).map(_.sequence).getOrElse(Int.MaxValue), i))
        .getOrElse((Int.MaxValue, Long.MaxValue))

    // ---- the two bounded aggregations (fact-scale work ends here) -----
    val baseAgg = baseRows
      .groupBy(col("period"), col("account"), col("tax_id"),
        col("src_tax_id"), col("src_group_tax_id"))
      .agg(sum(col("balance")).as("amt"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getDouble(5)))
    val taxAgg = taxRows
      .groupBy(col("period"), col("account"), col("tax_id"), col("group_tax_id"))
      .agg(sum(col("balance")).as("amt"))
      .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getDouble(4)))

    // ---- attribution (driver-side, dimension-sized) -------------------
    // key: (type, tax, account, period) → (base, tax) sums; presence of a
    // key means the row exists even when its sums are zero
    val base = scala.collection.mutable.Map[(String, Long, String, String), Double]()
      .withDefaultValue(0.0)
    val taxAmt = scala.collection.mutable.Map[(String, Long, String, String), Double]()
      .withDefaultValue(0.0)
    val present = scala.collection.mutable.LinkedHashSet[(String, Long, String, String)]()
    def addBase(k: (String, Long, String, String), v: Double): Unit = {
      base(k) = base(k) + v; present += k
    }
    def addTax(k: (String, Long, String, String), v: Double): Unit = {
      taxAmt(k) = taxAmt(k) + v; present += k
    }

    // once-per-group extra-base guard: the reference books the FIRST row
    // per group in its ORDER BY src_group, src_tax, tax (:190-218) — but
    // its flat query does NOT key on account, so that single row carries
    // the CROSS-ACCOUNT sum. Our aggregation keys on account; the guard
    // therefore remembers the winning (tax, src) COMBO per (period,
    // group) and books every account row of that combo — same totals as
    // the reference, with a per-account distribution for the grouped
    // layouts — while later combos (a second affecting tax, or the same
    // src affecting another child) stay skipped like the reference's.
    val extraBaseCombo = scala.collection.mutable
      .Map[(String, Long), (Long, Option[Long], Option[Long])]()
    for ((period, account, taxId, srcTax, srcGroup, amt) <- baseAgg
           .sortBy { case (p, a, t, st, sg, _) =>
             (p, sortKey(sg), sortKey(st), sortKey(Some(t)), a)
           }) {
      byId.get(taxId) match {
        case None => ()  // orphan tax id — skip, never abort
        case Some(tax) if srcTax.isDefined =>
          val ownGroupChild = srcGroup.exists(g =>
            byId.get(g).exists(gt => !toExpand(gt) && gt.children.contains(taxId)))
          if (ownGroupChild) ()  // base of its own non-expanded group (:199-206)
          else if (tax.use == "none" && childToGroup.contains(taxId)) {
            val g = childToGroup(taxId)  // extra base on the group, once (:207-218)
            val combo = (taxId, srcTax, srcGroup)
            if (extraBaseCombo.getOrElseUpdate((period, g.id), combo) == combo)
              addBase((g.use, g.id, account, period), amt)
          } else
            srcGroup.flatMap(byId.get).map(_.use)
              .orElse(srcTax.flatMap(byId.get).map(_.use))
              .foreach(use => addBase((use, taxId, account, period), amt))
        case Some(tax) if tax.isGroup && toExpand(tax) =>
          tax.children.filter(byId.contains)
            .foreach(c => addBase((tax.use, c, account, period), amt))
        case Some(tax) => addBase((tax.use, taxId, account, period), amt)
      }
    }

    for ((period, account, taxId, group, amt) <- taxAgg) {
      val use = group.flatMap(byId.get).map(_.use)
        .orElse(byId.get(taxId).map(_.use))
      val target = group.filter(g => byId.get(g).exists(!toExpand(_))).getOrElse(taxId)
      if (byId.contains(target))
        use.foreach(u => addTax((u, target, account, period), amt))
    }

    // ---- layout -------------------------------------------------------
    def sign(use: String): Double = if (use == "sale") -1.0 else 1.0
    def cell(v: Double): Option[Double] =
      if (isZero(v)) None else Some(math.floor(v * 1000 + 0.5) / 1000)
    def netTax(use: String, keys: Seq[(String, Long, String, String)]): Seq[Option[Double]] =
      periods.flatMap { p =>
        val ks = keys.filter(_._4 == p)
        Seq(cell(sign(use) * ks.map(base(_)).sum),
          cell(sign(use) * ks.map(taxAmt(_)).sum))
      }
    def taxOnly(use: String, keys: Seq[(String, Long, String, String)]): Seq[Option[Double]] =
      periods.flatMap { p =>
        Seq(None, cell(sign(use) * keys.filter(_._4 == p).map(taxAmt(_)).sum))
      }

    val out = scala.collection.mutable.ArrayBuffer[Line]()
    for (use <- Seq("sale", "purchase")) {
      val sectionKeys = present.toSeq.filter(_._1 == use)
      if (sectionKeys.nonEmpty) {
        val sectionName = if (use == "sale") "Sales" else "Purchases"
        out += Line(sectionName, 0, taxOnly(use, sectionKeys))
        val taxesHere = sectionKeys.map(_._2).distinct
          .sortBy(id => (byId(id).sequence, id))
        def acctName(a: String) = accountNames.getOrElse(a, a)
        grouping match {
          case Flat =>
            for (t <- taxesHere)
              out += Line(byId(t).name, 1,
                netTax(use, sectionKeys.filter(_._2 == t)))
          case AccountTax =>
            for (a <- sectionKeys.map(_._3).distinct.sorted) {
              val accountKeys = sectionKeys.filter(_._3 == a)
              out += Line(acctName(a), 1, taxOnly(use, accountKeys))
              for (t <- accountKeys.map(_._2).distinct
                     .sortBy(id => (byId(id).sequence, id)))
                out += Line(byId(t).name, 2,
                  netTax(use, accountKeys.filter(_._2 == t)))
              out += Line(s"Total ${acctName(a)}", 1, taxOnly(use, accountKeys))
            }
          case TaxAccount =>
            for (t <- taxesHere) {
              val taxKeys = sectionKeys.filter(_._2 == t)
              out += Line(byId(t).name, 1, taxOnly(use, taxKeys))
              for (a <- taxKeys.map(_._3).distinct.sorted)
                out += Line(acctName(a), 2,
                  netTax(use, taxKeys.filter(_._3 == a)))
              out += Line(s"Total ${byId(t).name}", 1, taxOnly(use, taxKeys))
            }
        }
        out += Line(s"Total $sectionName", 0, taxOnly(use, sectionKeys))
      }
    }
    out.toSeq
  }
}
