package graft.scratch

/** ~sf30 scratch fixture (~5.4 GB): 300 content-distinct re-keyed
  * copies of the read-only sf0.1 fixture — the third anchor of the
  * scaling rehearsal (a 3× step past sf10 for the linear-class core
  * ops); recipe and rationale in [[ScaleGen]].
  */
object Sf30Gen {
  def main(args: Array[String]): Unit =
    ScaleGen.run(args.headOption.getOrElse("/root/repo/target/sf30"),
      copies = 300, outPartitions = 96)
}
