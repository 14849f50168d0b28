package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.analyse.{ForeignKey, Topo}

/** Topological-sort semantics ported from the reference's fixtures
  * (/root/reference/internal/schema/schema_test.go:223-420): linear chain,
  * diamond, self-reference, 2-cycle tolerance, FK to a missing table.
  */
class TopoSpec extends AnyFunSuite {

  private def fk(t: String, rt: String) = ForeignKey(t, "c", rt, "id")

  test("linear chain: referenced table first (orders→users)") {
    val out = Topo.sortTablesByDependency(Seq("orders", "users"), Seq(fk("orders", "users")))
    assert(out == Seq("users", "orders"))
  }

  test("diamond: order_items→{orders,products}, orders→users") {
    val out = Topo.sortTablesByDependency(
      Seq("order_items", "orders", "products", "users"),
      Seq(fk("order_items", "orders"), fk("order_items", "products"), fk("orders", "users")))
    def pos(t: String) = out.indexOf(t)
    assert(out.toSet == Set("order_items", "orders", "products", "users"))
    assert(pos("users") < pos("orders"))
    assert(pos("orders") < pos("order_items"))
    assert(pos("products") < pos("order_items"))
  }

  test("self-reference is skipped (employees.manager_id→employees.id)") {
    val out = Topo.sortTablesByDependency(Seq("employees"), Seq(fk("employees", "employees")))
    assert(out == Seq("employees"))
  }

  test("2-cycle tolerated: leftover tables appended in input order") {
    val out = Topo.sortTablesByDependency(Seq("b", "a"), Seq(fk("a", "b"), fk("b", "a")))
    assert(out == Seq("b", "a")) // cycle → fallback to input order
  }

  test("FK to a table outside the set is ignored") {
    val out = Topo.sortTablesByDependency(Seq("orders"), Seq(fk("orders", "users")))
    assert(out == Seq("orders"))
  }

  test("fixture star schema order is deterministic") {
    val tables = Seq("customer", "documents", "embeddings", "events", "lineitem",
      "nation", "orders", "part", "region", "supplier")
    val out = Topo.sortTablesByDependency(tables, graft.sources.ParquetSource.fixtureForeignKeys)
    assert(out == Seq("documents", "embeddings", "part", "region", "nation",
      "customer", "supplier", "events", "orders", "lineitem"))
  }

  test("every FK edge respected in fixture order (referenced before referencing)") {
    val tables = Seq("customer", "documents", "embeddings", "events", "lineitem",
      "nation", "orders", "part", "region", "supplier")
    val out = Topo.sortTablesByDependency(tables, graft.sources.ParquetSource.fixtureForeignKeys)
    for (e <- graft.sources.ParquetSource.fixtureForeignKeys)
      assert(out.indexOf(e.referencedTable) < out.indexOf(e.table), e.toString)
  }
}
