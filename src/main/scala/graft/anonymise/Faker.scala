package graft.anonymise

/** Deterministic faker generators.
  *
  * The reference exposes 16 named generators backed by gofakeit
  * (/root/reference/internal/anonymiser/faker.go:11-28) whose outputs are
  * random per call. For a distributed engine we instead make every
  * generator a pure function of a 64-bit seed: `fake = gen(seed)`. Seeding
  * by `hash64(column ":" originalValue)` makes the reference's consistency
  * map (anonymiser.go:19-22, 73-91) hold *by construction* — the same
  * original value yields the same fake everywhere, across tables,
  * executors, and runs — with zero shared state, which is what lets the
  * design scale to 100 TB (no driver-side map, no shuffle).
  *
  * Output formats satisfy the reference's contract regexes
  * (faker_test.go:64-177): email `[^@]+@[^@]+\.[^@]+`, uuid v4 hex
  * layout, ipv4 dotted-quad, date `yyyy-MM-dd`, number `\d{8}`,
  * password length 32 with upper/lower/digit/special.
  */
object Faker extends Serializable {

  // -- seed expansion -------------------------------------------------------

  /** splitmix64: expand one seed into a stream of independent 64-bit values.
    * Public algorithm (Steele et al., "Fast Splittable Pseudorandom Number
    * Generators", OOPSLA 2014) — also what java.util.SplittableRandom uses.
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over UTF-8 bytes — a stable cross-platform string hash
    * used to derive seeds from (column, value) keys.
    */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private class Stream(seed: Long) {
    private var state: Long = seed
    def nextLong(): Long = { state = mix64(state); state }
    def nextInt(bound: Int): Int = {
      val r = nextLong() >>> 1
      (r % bound).toInt
    }
    def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  }

  // -- wordlists (small, embedded; formats are regex-shaped, not corpus-shaped) --

  private val firstNames: IndexedSeq[String] = Vector(
    "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael",
    "Linda", "David", "Elizabeth", "William", "Barbara", "Richard", "Susan",
    "Joseph", "Jessica", "Thomas", "Sarah", "Charles", "Karen", "Daniel",
    "Lisa", "Matthew", "Nancy", "Anthony", "Betty", "Mark", "Margaret",
    "Donald", "Sandra", "Steven", "Ashley", "Paul", "Kimberly", "Andrew",
    "Emily", "Joshua", "Donna", "Kenneth", "Michelle", "Kevin", "Carol",
    "Brian", "Amanda", "George", "Dorothy", "Edward", "Melissa", "Ronald",
    "Deborah", "Timothy", "Stephanie", "Jason", "Rebecca", "Jeffrey",
    "Sharon", "Ryan", "Laura", "Jacob", "Cynthia", "Gary", "Kathleen",
    "Nicholas", "Amy")

  private val lastNames: IndexedSeq[String] = Vector(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Thomas", "Taylor", "Moore", "Jackson", "Martin",
    "Lee", "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark",
    "Ramirez", "Lewis", "Robinson", "Walker", "Young", "Allen", "King",
    "Wright", "Scott", "Torres", "Nguyen", "Hill", "Flores", "Green",
    "Adams", "Nelson", "Baker", "Hall", "Rivera", "Campbell", "Mitchell",
    "Carter", "Roberts", "Gomez", "Phillips", "Evans", "Turner", "Diaz",
    "Parker", "Cruz", "Edwards", "Collins", "Reyes", "Stewart", "Morris",
    "Morales", "Murphy")

  private val cities: IndexedSeq[String] = Vector(
    "Springfield", "Riverton", "Fairview", "Kingston", "Ashland", "Milton",
    "Clinton", "Georgetown", "Salem", "Madison", "Greenville", "Bristol",
    "Oakland", "Dayton", "Lexington", "Milford", "Auburn", "Winchester",
    "Clayton", "Hudson", "Dover", "Hamilton", "Newport", "Arlington",
    "Burlington", "Manchester", "Centerville", "Oxford", "Franklin",
    "Chester", "Marion", "Jackson")

  private val countries: IndexedSeq[String] = Vector(
    "United States", "Canada", "Mexico", "Brazil", "Argentina",
    "United Kingdom", "France", "Germany", "Spain", "Italy", "Portugal",
    "Netherlands", "Belgium", "Sweden", "Norway", "Denmark", "Finland",
    "Poland", "Austria", "Switzerland", "Ireland", "Greece", "Japan",
    "China", "India", "Australia", "New Zealand", "South Africa", "Egypt",
    "Kenya", "Nigeria", "Chile")

  private val companyWords: IndexedSeq[String] = Vector(
    "Acme", "Global", "Pioneer", "Summit", "Vertex", "Nova", "Atlas",
    "Orion", "Cascade", "Horizon", "Quantum", "Sterling", "Beacon",
    "Crestwood", "Evergreen", "Ironwood", "Keystone", "Lakeshore",
    "Meridian", "Northstar", "Redwood", "Silverline", "Stonebridge",
    "Titan", "Vanguard", "Westfield", "Zenith", "Bluepeak", "Clearwater",
    "Drift", "Ember", "Falcon")

  private val companySuffixes: IndexedSeq[String] = Vector(
    "Inc", "LLC", "Group", "Holdings", "Labs", "Systems", "Industries",
    "Partners", "Solutions", "Technologies", "Corp", "Co")

  private val streetSuffixes: IndexedSeq[String] = Vector(
    "St", "Ave", "Blvd", "Dr", "Ln", "Rd", "Way", "Ct", "Pl", "Ter")

  private val streetNames: IndexedSeq[String] = Vector(
    "Maple", "Oak", "Cedar", "Pine", "Elm", "Washington", "Lake", "Hill",
    "Park", "Main", "Church", "High", "Mill", "Walnut", "Spring", "North",
    "Ridge", "Chestnut", "Birch", "Sunset", "River", "Meadow", "Forest",
    "Highland", "Jefferson", "Lincoln", "Adams", "Jackson", "Franklin",
    "Valley", "Garden", "Orchard")

  private val emailDomains: IndexedSeq[String] = Vector(
    "example.com", "example.org", "example.net", "mail.test", "inbox.test",
    "post.example", "mailbox.example", "corp.example")

  private val loremWords: IndexedSeq[String] = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "do", "eiusmod", "tempor", "incididunt", "ut", "labore",
    "et", "dolore", "magna", "aliqua", "enim", "ad", "minim", "veniam",
    "quis", "nostrud", "exercitation", "ullamco", "laboris", "nisi",
    "aliquip", "ex", "ea", "commodo", "consequat", "duis", "aute", "irure",
    "in", "reprehenderit", "voluptate", "velit", "esse", "cillum", "fugiat",
    "nulla", "pariatur", "excepteur", "sint", "occaecat", "cupidatat",
    "non", "proident", "sunt", "culpa", "qui", "officia", "deserunt",
    "mollit", "anim", "id", "est", "laborum")

  private val lowerChars = "abcdefghijklmnopqrstuvwxyz"
  private val upperChars = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val digitChars = "0123456789"
  private val specialChars = "!@#$%&*-_=+?"

  // -- generators -----------------------------------------------------------

  def firstName(seed: Long): String = new Stream(seed).pick(firstNames)
  def lastName(seed: Long): String  = new Stream(mix64(seed) ^ 0x5bL).pick(lastNames)

  def name(seed: Long): String = firstName(seed) + " " + lastName(seed)

  def email(seed: Long): String = {
    val s = new Stream(seed)
    val user = s.pick(firstNames).toLowerCase + "." +
      s.pick(lastNames).toLowerCase + (100 + s.nextInt(900)).toString
    user + "@" + s.pick(emailDomains)
  }

  /** Plain 10-digit phone like gofakeit's default `Phone()` layout. */
  def phone(seed: Long): String = {
    val s = new Stream(seed)
    val area = 200 + s.nextInt(800)
    val mid  = 200 + s.nextInt(800)
    val last = s.nextInt(10000)
    f"$area%03d$mid%03d$last%04d"
  }

  def address(seed: Long): String = {
    val s = new Stream(seed)
    val num = 1 + s.nextInt(9999)
    s"$num ${s.pick(streetNames)} ${s.pick(streetSuffixes)}"
  }

  def city(seed: Long): String    = new Stream(seed).pick(cities)
  def country(seed: Long): String = new Stream(seed).pick(countries)

  def company(seed: Long): String = {
    val s = new Stream(seed)
    s.pick(companyWords) + " " + s.pick(companySuffixes)
  }

  /** RFC-4122 version-4 / variant-1 UUID derived from the seed. */
  def uuid(seed: Long): String = {
    val hi0 = mix64(seed)
    val lo0 = mix64(hi0 ^ 0x9e3779b97f4a7c15L)
    val hi = (hi0 & 0xffffffffffff0fffL) | 0x0000000000004000L
    val lo = (lo0 & 0x3fffffffffffffffL) | 0x8000000000000000L
    f"${(hi >>> 32) & 0xffffffffL}%08x-${(hi >>> 16) & 0xffffL}%04x-${hi & 0xffffL}%04x-${(lo >>> 48) & 0xffffL}%04x-${lo & 0xffffffffffffL}%012x"
  }

  def username(seed: Long): String = {
    val s = new Stream(seed)
    s.pick(firstNames).toLowerCase + s.pick(lastNames).toLowerCase + s.nextInt(100).toString
  }

  /** 32 chars with at least one lower/upper/digit/special — mirrors
    * gofakeit.Password(true,true,true,true,false,32) (faker.go:23).
    */
  def password(seed: Long): String = {
    val s = new Stream(seed)
    val all = lowerChars + upperChars + digitChars + specialChars
    val sb = new StringBuilder(32)
    sb.append(lowerChars.charAt(s.nextInt(lowerChars.length)))
    sb.append(upperChars.charAt(s.nextInt(upperChars.length)))
    sb.append(digitChars.charAt(s.nextInt(digitChars.length)))
    sb.append(specialChars.charAt(s.nextInt(specialChars.length)))
    while (sb.length < 32) sb.append(all.charAt(s.nextInt(all.length)))
    sb.toString
  }

  def ipv4(seed: Long): String = {
    val s = new Stream(seed)
    s"${1 + s.nextInt(254)}.${s.nextInt(256)}.${s.nextInt(256)}.${1 + s.nextInt(254)}"
  }

  /** Date in `yyyy-MM-dd`, year range 1970..2024 (format contract only). */
  def date(seed: Long): String = {
    val s = new Stream(seed)
    val year = 1970 + s.nextInt(55)
    val month = 1 + s.nextInt(12)
    val maxDay = month match {
      case 2              => if ((year % 4 == 0 && year % 100 != 0) || year % 400 == 0) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _              => 31
    }
    val day = 1 + s.nextInt(maxDay)
    f"$year%04d-$month%02d-$day%02d"
  }

  /** Ten lorem words, capitalised, trailing period (gofakeit.Sentence(10)). */
  def text(seed: Long): String = {
    val s = new Stream(seed)
    val words = (0 until 10).map(_ => s.pick(loremWords))
    words.head.capitalize + " " + words.tail.mkString(" ") + "."
  }

  /** Exactly 8 digits (leading zeros allowed), like gofakeit.DigitN(8). */
  def number(seed: Long): String = {
    val s = new Stream(seed)
    (0 until 8).map(_ => digitChars.charAt(s.nextInt(10))).mkString
  }

  /** Registry, keyed exactly like the reference (faker.go:11-28). */
  val functions: Map[String, Long => String] = Map(
    "name"      -> name _,
    "firstName" -> firstName _,
    "lastName"  -> lastName _,
    "email"     -> email _,
    "phone"     -> phone _,
    "address"   -> address _,
    "city"      -> city _,
    "country"   -> country _,
    "company"   -> company _,
    "uuid"      -> uuid _,
    "username"  -> username _,
    "password"  -> password _,
    "ipv4"      -> ipv4 _,
    "date"      -> date _,
    "text"      -> text _,
    "number"    -> number _,
  )

  def isKnown(name: String): Boolean = functions.contains(name)

  /** Unknown name → empty string, like GenerateFakeValue (faker.go:45-52). */
  def generate(name: String, seed: Long): String =
    functions.get(name).map(_(seed)).getOrElse("")
}
