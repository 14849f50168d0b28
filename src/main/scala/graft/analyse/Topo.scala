package graft.analyse

/** Metadata model + FK-dependency topological sort.
  *
  * Mirrors the reference's semantics exactly
  * (/root/reference/internal/schema/schema.go:62-166): dependencies are FK
  * edges where both endpoints are in the table set; self-references are
  * skipped; Kahn's algorithm with a FIFO queue seeded in input order;
  * cycles are tolerated — leftover tables are appended at the end in input
  * order. Runs driver-side (metadata scale, O(#tables)).
  */
final case class ColumnInfo(
    name: String,
    dataType: String,
    isNullable: Boolean,
    default: Option[String] = None)

final case class ForeignKey(
    table: String,
    column: String,
    referencedTable: String,
    referencedColumn: String)

final case class TableMeta(
    name: String,
    createStmt: String,
    columns: Seq[ColumnInfo],
    // call-by-need: the count is a per-table Spark job, and most
    // consumers (the dump writer, the topo sort) never read it — only
    // the dry-run surfaces (o21, the CLI) pay for it, when they render
    rowCount: () => Long)

object Topo {

  /** Sort table names so that referenced tables precede referencing ones. */
  def sortTablesByDependency(tables: Seq[String], fks: Seq[ForeignKey]): Seq[String] = {
    val tableSet = tables.toSet

    // table -> tables it depends on (in-set, non-self, duplicates kept —
    // matches schema.go:80-89 which counts duplicate edges twice)
    val dependencies: Map[String, Seq[String]] =
      fks.filter(fk =>
          tableSet(fk.table) && tableSet(fk.referencedTable) && fk.table != fk.referencedTable)
        .groupBy(_.table).view.mapValues(_.map(_.referencedTable)).toMap

    val inDegree = scala.collection.mutable.Map.from(tables.map(_ -> 0))
    val dependents = scala.collection.mutable.Map.empty[String, Vector[String]]
    for ((table, deps) <- dependencies.toSeq.sortBy(t => tables.indexOf(t._1)); dep <- deps) {
      dependents.updateWith(dep)(v => Some(v.getOrElse(Vector.empty) :+ table))
      inDegree(table) += 1
    }

    val queue = scala.collection.mutable.Queue.from(tables.filter(inDegree(_) == 0))
    val sorted = Vector.newBuilder[String]
    val emitted = scala.collection.mutable.Set.empty[String]
    while (queue.nonEmpty) {
      val current = queue.dequeue()
      sorted += current
      emitted += current
      for (dependent <- dependents.getOrElse(current, Vector.empty)) {
        inDegree(dependent) -= 1
        if (inDegree(dependent) == 0) queue.enqueue(dependent)
      }
    }
    // Cycle tolerance: append leftovers in input order (schema.go:149-163).
    for (t <- tables if !emitted(t)) sorted += t
    sorted.result()
  }

  def sortTableMeta(tables: Seq[TableMeta], fks: Seq[ForeignKey]): Seq[TableMeta] = {
    val byName = tables.map(t => t.name -> t).toMap
    sortTablesByDependency(tables.map(_.name), fks).map(byName)
  }
}
