package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.anonymise.Faker

/** Output-format contracts ported from the reference's faker tests
  * (/root/reference/internal/anonymiser/faker_test.go:64-205), plus the
  * determinism properties our seeded design adds.
  */
class FakerSpec extends AnyFunSuite {

  private val seeds: Seq[Long] = (1L to 500L) ++ Seq(0L, -1L, Long.MaxValue, Long.MinValue)

  private def checkAll(fn: String, pattern: String): Unit =
    for (s <- seeds) {
      val v = Faker.generate(fn, s)
      assert(v.matches(pattern), s"$fn($s) = '$v' !~ $pattern")
    }

  test("email matches ^[^@]+@[^@]+\\.[^@]+$ (faker_test.go:88)") {
    checkAll("email", "^[^@]+@[^@]+\\.[^@]+$")
  }

  test("uuid matches RFC-4122 v4 layout (faker_test.go:120)") {
    checkAll("uuid", "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$")
  }

  test("ipv4 dotted quad with in-range octets (faker_test.go:137)") {
    checkAll("ipv4", "^\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}$")
    for (s <- seeds; oct <- Faker.ipv4(s).split("\\.").map(_.toInt))
      assert(oct >= 0 && oct <= 255)
  }

  test("date matches yyyy-MM-dd and parses (faker_test.go:144)") {
    checkAll("date", "^\\d{4}-\\d{2}-\\d{2}$")
    for (s <- seeds) java.time.LocalDate.parse(Faker.date(s))
  }

  test("number is exactly 8 digits (faker_test.go:156)") {
    checkAll("number", "^\\d{8}$")
  }

  test("password is 32 chars with all four character classes (faker.go:23)") {
    for (s <- seeds) {
      val p = Faker.password(s)
      assert(p.length == 32)
      assert(p.exists(_.isLower) && p.exists(_.isUpper) && p.exists(_.isDigit))
      assert(p.exists(c => !c.isLetterOrDigit))
    }
  }

  test("name/firstName/lastName/city/country/company/username/text shapes") {
    checkAll("name", "^[A-Za-z]+ [A-Za-z]+$")
    checkAll("firstName", "^[A-Za-z]+$")
    checkAll("lastName", "^[A-Za-z]+$")
    checkAll("city", "^[A-Za-z]+$")
    checkAll("country", "^[A-Za-z ]+$")
    checkAll("company", "^[A-Za-z]+ [A-Za-z]+$")
    checkAll("username", "^[a-z]+[0-9]+$")
    checkAll("phone", "^\\d{10}$")
    checkAll("address", "^\\d+ [A-Za-z]+ [A-Za-z]+$")
    checkAll("text", "^[A-Z][a-z]*( [a-z]+){9}\\.$")
  }

  test("unknown function returns empty string (faker.go:45-52)") {
    assert(Faker.generate("nonexistent", 42L) == "")
    assert(!Faker.isKnown("nonexistent"))
  }

  test("all 16 reference generator names are registered (faker.go:11-28)") {
    val expected = Set("name", "firstName", "lastName", "email", "phone", "address",
      "city", "country", "company", "uuid", "username", "password", "ipv4",
      "date", "text", "number")
    assert(Faker.functions.keySet == expected)
  }

  test("deterministic: same seed → same value; seeds vary output") {
    for (fn <- Faker.functions.keys) {
      assert(Faker.generate(fn, 7L) == Faker.generate(fn, 7L), fn)
      val distinct = seeds.map(Faker.generate(fn, _)).distinct.size
      assert(distinct > 1, s"$fn produced a constant")
    }
  }

  test("consistency-by-construction: hash64 keys are stable") {
    assert(Faker.hash64("email:alice@example.com") == Faker.hash64("email:alice@example.com"))
    assert(Faker.hash64("email:a") != Faker.hash64("email:b"))
  }
}
