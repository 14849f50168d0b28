package graft.scratch

/** ~sf1 scratch fixture: 10 content-distinct re-keyed copies of the
  * read-only sf0.1 fixture — recipe and rationale in [[ScaleGen]].
  */
object Sf1Gen {
  def main(args: Array[String]): Unit =
    ScaleGen.run(args.headOption.getOrElse("/root/repo/target/sf1"),
      copies = 10, outPartitions = 32)
}
