package graft.io

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.io.Compaction.{FileInfo, planGroups}

/** Property check for compaction planning: exactly-once membership, the
  * multi-file byte bound, oversized isolation, the FFD convergence
  * guarantee (no two groups still merge), and input-order determinism —
  * over arbitrary size distributions, not just the spec's fixtures.
  */
object CompactionCheck extends Properties("graft.io.Compaction.planGroups") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val genFiles: Gen[List[FileInfo]] = for {
    n <- Gen.choose(0, 80)
    files <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 100000)
      bytes <- Gen.frequency(
        6 -> Gen.choose(1L, 500L),
        2 -> Gen.choose(400L, 1200L), // around and above typical targets
        1 -> Gen.choose(5000L, 20000L)) // far oversized
    } yield FileInfo(s"f$id", bytes))
  } yield files.distinctBy(_.path)

  property("exactly-once + bounds + convergence + determinism") =
    forAll(genFiles, Gen.oneOf(600L, 1000L, 2048L)) { (files, target) =>
      val groups = planGroups(files, target)
      val exactlyOnce =
        groups.flatMap(_.files.map(_.path)).sorted == files.map(_.path).sorted
      val bounded = groups.filter(_.files.size > 1).forall(_.bytes <= target)
      val oversizedIsolated = files.filter(_.bytes > target).forall(f =>
        groups.exists(g => g.files == Seq(f)))
      // FFD guarantee: no two groups could still merge — one pass converges
      val converged = groups.indices.forall(i => groups.indices.forall(j =>
        i >= j || groups(i).bytes + groups(j).bytes > target))
      val deterministic =
        planGroups(scala.util.Random.shuffle(files), target)
          .map(_.files.map(_.path)) == groups.map(_.files.map(_.path))
      exactlyOnce && bounded && oversizedIsolated && converged && deterministic
    }
}
