package graft.scratch

/** ~sf100 scratch fixture (~18 GB): 1000 content-distinct re-keyed
  * copies of the read-only sf0.1 fixture — the FOURTH anchor of the
  * scaling rehearsal (a 3.3× step past sf30 for the linear-class core
  * ops). Uses 3-letter copy tags (uniform length per run — the
  * suffix-aliasing note on [[ScaleGen.copyTag]]); recipe and rationale
  * in [[ScaleGen]].
  */
object Sf100Gen {
  def main(args: Array[String]): Unit =
    ScaleGen.run(args.headOption.getOrElse("/root/repo/target/sf100"),
      copies = 1000, outPartitions = 320, tagLen = 3)
}
