package graft.scratch

/** ~sf10 scratch fixture (~1.8 GB): 100 content-distinct re-keyed
  * copies of the read-only sf0.1 fixture, the second decade of the
  * scaling rehearsal — recipe and rationale in [[ScaleGen]].
  */
object Sf10Gen {
  def main(args: Array[String]): Unit =
    ScaleGen.run(args.headOption.getOrElse("/root/repo/target/sf10"),
      copies = 100, outPartitions = 64)
}
