package graft.engine

import org.apache.spark.sql.Column

/** The journal-filter options state machine
  * (reference account_report.py:128-319 `_init_options_journals`):
  * resolves the journal/journal-group selector across companies —
  * previous selections, group check/uncheck actions, the first-load
  * group default, the per-company divider layout, and the widget
  * display name with its five-name abbreviation.
  *
  * Pure driver-side options logic (the same layer as [[DateFilter]]);
  * the resolved selected-journal set becomes a pushed-down scan filter
  * in the report queries.
  */
object JournalFilter {

  /** Journals order by (company, name) (:129-132); `code` feeds the
    * display name. */
  final case class Journal(id: Long, name: String, code: String, company: String)

  /** Groups order by sequence (:135-137); a group stands for "all the
    * company's journals EXCEPT the excluded ones". */
  final case class Group(id: Long, name: String, company: String,
                         excluded: Set[Long], sequence: Int = 0)

  /** One row of the selector: a divider, a group, or a journal. */
  sealed trait Row
  final case class Divider(model: String, name: String) extends Row
  final case class GroupRow(id: Long, name: String, selected: Boolean) extends Row
  final case class JournalRow(id: Long, name: String, selected: Boolean) extends Row

  /** The user's js-side group toggle (:192-220). */
  final case class GroupAction(action: String, id: Long)

  final case class Options(rows: Seq[Row], displayName: String,
                           selected: Map[String, Set[Long]])

  /** Resolve the filter.
    * `companies` gives the company iteration order; `previousSelected`
    * is the set of journal ids selected in the previous options (None =
    * first load, which auto-selects each company's first group,
    * :224-238); `groupAction` the pending group toggle. */
  def initOptions(journals: Seq[Journal], groups: Seq[Group],
                  companies: Seq[String],
                  previousSelected: Option[Set[Long]],
                  groupAction: Option[GroupAction] = None): Options = {
    val byCompany: Map[String, Seq[Journal]] =
      companies.map(c => c -> journals.filter(_.company == c)
        .sortBy(_.name)).toMap
    val groupsByCompany: Map[String, Seq[Group]] =
      companies.map(c => c -> groups.filter(_.company == c)
        .sortBy(_.sequence)).toMap
    val availIds: Map[String, Set[Long]] =
      byCompany.map { case (c, js) => c -> js.map(_.id).toSet }

    // previous selection, restricted to the available set (:184-190)
    val selected = scala.collection.mutable.Map[String, Set[Long]]()
    for (c <- companies)
      selected(c) = previousSelected match {
        case Some(prev) => prev & availIds(c)
        case None => Set.empty
      }

    (previousSelected, groupAction) match {
      // a stale toggle naming a group that no longer exists is ignored,
      // like stale journal ids in the previous selection
      case (Some(_), Some(GroupAction(action, gid)))
          if groups.exists(_.id == gid) =>
        val g = groups.find(_.id == gid).get
        if (action == "add")
          // check: the company's journals minus the exclusions (:198-200)
          selected(g.company) = availIds(g.company) -- g.excluded
        else {
          // uncheck: keep "everything" if another company still has a
          // selection, else clear (:201-215)
          val othersSelected = companies.exists(c =>
            c != g.company && selected(c).nonEmpty)
          selected(g.company) =
            if (othersSelected) availIds(g.company) else Set.empty
          // all-companies-full collapses to no selection (:216-220)
          if (companies.forall(c => selected(c) == availIds(c)))
            companies.foreach(c => selected(c) = Set.empty)
        }
      case (None, _) =>
        // first load: each company defaults to its first group; other
        // companies then select everything (:224-238)
        var anyGroup = false
        for (c <- companies if selected(c).isEmpty
             if groupsByCompany(c).nonEmpty) {
          selected(c) = availIds(c) -- groupsByCompany(c).head.excluded
          anyGroup = true
        }
        if (anyGroup)
          for (c <- companies if selected(c).isEmpty)
            selected(c) = availIds(c)
      case _ => ()
    }

    // a group displays selected when the UNSELECTED remainder is exactly
    // its available exclusions (:245-258)
    val selectedGroups: Map[String, Seq[Group]] =
      companies.map { c =>
        val remaining = availIds(c) -- selected(c)
        c -> groupsByCompany(c).filter(g =>
          remaining == (g.excluded & availIds(c)))
      }.toMap

    // display name (:286-319): group names across companies first, then
    // the journal codes of group-less companies — unless everything is
    // selected nowhere-grouped (collapses to "All Journals")
    val groupNames = companies.flatMap(c => selectedGroups(c).map(_.name))
    val allSelectedEverywhere =
      companies.forall(c => selected(c) == availIds(c))
    var names = groupNames
    for (c <- companies if selectedGroups(c).isEmpty
         if !allSelectedEverywhere || groupNames.nonEmpty)
      names = names ++ byCompany(c).filter(j => selected(c).contains(j.id))
        .map(_.code)
    val collapse = names.isEmpty
    if (collapse) companies.foreach(c => selected(c) = Set.empty)
    val displayName =
      if (collapse) "All Journals"
      else {
        val max = 5
        val remaining = names.length - max
        if (remaining == 1) names.take(max).mkString(", ") + " and one other"
        else if (remaining > 1) names.take(max).mkString(", ") + s" and $remaining others"
        else names.mkString(", ")
      }

    // row layout (:260-284): group divider + groups, then per company a
    // divider (when multi-company or groups exist) + its journals
    val groupRows: Seq[Row] = companies.flatMap(c =>
      groupsByCompany(c).map(g =>
        GroupRow(g.id, g.name, selectedGroups(c).contains(g))))
    val rows = scala.collection.mutable.ArrayBuffer[Row]()
    if (groupRows.nonEmpty) {
      rows += Divider("account.journal.group", "Journal Groups")
      rows ++= groupRows
    }
    for (c <- companies if byCompany(c).nonEmpty) {
      if (companies.count(byCompany(_).nonEmpty) > 1 || groupRows.nonEmpty)
        rows += Divider("res.company", c)
      rows ++= byCompany(c).map(j =>
        JournalRow(j.id, j.name, selected(c).contains(j.id)))
    }
    Options(rows.toSeq, displayName, selected.toMap)
  }

  /** The journal ids a report query must scope to (reference
    * `_get_options_journals`, account_report.py:322-334): the SELECTED
    * journal rows of the resolved options — and when none is selected,
    * every journal row (a report may have pre-filtered the available
    * journals by type, so "no selection" means "all of THESE", not "no
    * filter"). */
  def selectedJournalIds(opts: Options): Seq[Long] = {
    val journalRows = opts.rows.collect { case r: JournalRow => r }
    val picked = journalRows.filter(_.selected)
    (if (picked.nonEmpty) picked else journalRows).map(_.id)
  }

  /** The resolved selection as a fact-scan predicate (reference
    * `_get_options_journals_domain`, account_report.py:339-341:
    * `[('journal_id', 'in', ids)]`, or the empty domain when the
    * selector has no journals at all). The IN stays on the RAW journal
    * column so Catalyst pushes it into the parquet scan —
    * [[graft.PlanAuditSpec]] pins `PushedFilters: In(...)` on the q175
    * composition gate. */
  def scanPredicate(opts: Options, journalCol: Column): Option[Column] = {
    val ids = selectedJournalIds(opts)
    if (ids.isEmpty) None else Some(journalCol.isin(ids: _*))
  }
}
