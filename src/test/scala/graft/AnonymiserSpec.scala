package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.anonymise.Anonymiser
import graft.config._

/** Anonymisation semantics ported from the reference's tests
  * (/root/reference/internal/anonymiser/anonymiser_test.go:25-270):
  * null/static/faker rules, missing-column skip, consistency mapping, and
  * the equivalence of the two distributed consistency strategies.
  */
class AnonymiserSpec extends AnyFunSuite with SparkSuite {

  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("null rule sets NULL, keeps type (anonymiser_test.go: null rule)") {
    val out = Anonymiser(customer, TableConfig(columns = Map("c_acctbal" -> NullRule)))
    assert(out.schema("c_acctbal").dataType == org.apache.spark.sql.types.DoubleType)
    assert(out.filter(col("c_acctbal").isNotNull).count() == 0)
  }

  test("static rule replaces every value") {
    val out = Anonymiser(customer,
      TableConfig(columns = Map("c_mktsegment" -> StaticRule("REDACTED"))))
    assert(out.filter(col("c_mktsegment") =!= "REDACTED").count() == 0)
  }

  test("configured-but-absent column is skipped (anonymiser_test.go missing col)") {
    val out = Anonymiser(customer,
      TableConfig(columns = Map("no_such_column" -> StaticRule("x"))))
    assert(out.columns.toSeq == customer.columns.toSeq)
  }

  test("faker rule: values replaced, consistent per input, format holds") {
    val out = Anonymiser(customer, TableConfig(columns = Map("c_name" -> FakerRule("name"))))
      .select(col("c_name")).collect().map(_.getString(0))
    assert(out.forall(_.matches("^[A-Za-z]+ [A-Za-z]+$")))
    // same input → same output: re-run yields identical values
    val out2 = Anonymiser(customer, TableConfig(columns = Map("c_name" -> FakerRule("name"))))
      .select(col("c_name")).collect().map(_.getString(0))
    assert(out.sameElements(out2))
  }

  test("consistency across tables: same column name + value → same fake (README.md:305-307)") {
    val a = Anonymiser(
      customer.select(col("c_name")),
      TableConfig(columns = Map("c_name" -> FakerRule("email"))))
    val b = Anonymiser(
      customer.select(col("c_name")).limit(50),
      TableConfig(columns = Map("c_name" -> FakerRule("email"))))
    // b's fakes must be a subset of a's (same seeds)
    assert(b.except(a).count() == 0)
  }

  test("BroadcastMap strategy ≡ SeededDeterministic strategy") {
    val tc = TableConfig(columns = Map("c_name" -> FakerRule("name")))
    val viaSeed = Anonymiser(customer, tc, Anonymiser.SeededDeterministic)
      .select("c_custkey", "c_name")
    val viaMap = Anonymiser(customer, tc, Anonymiser.BroadcastMap)
      .select("c_custkey", "c_name")
    assert(viaSeed.except(viaMap).count() == 0)
    assert(viaMap.except(viaSeed).count() == 0)
    // schema-identical too: the dump writer renders positionally
    assert(Anonymiser(customer, tc, Anonymiser.BroadcastMap).columns.toSeq ==
      customer.columns.toSeq)
  }

  test("unknown faker function → empty string (faker.go:45-52)") {
    val out = Anonymiser(customer, TableConfig(columns = Map("c_name" -> FakerRule("bogus"))))
    assert(out.filter(col("c_name") =!= "").count() == 0)
  }
}
