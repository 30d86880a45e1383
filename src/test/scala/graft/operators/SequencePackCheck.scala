package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for sequence packing: exactly-once membership, the
  * budget bound (except single-doc oversize bins), correct bin totals,
  * and run-to-run determinism.
  */
object SequencePackCheck extends Properties("graft.operators.SequencePack") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  private val genDocs: Gen[List[(Long, Int)]] = Gen.listOfN(60, for {
    id <- Gen.choose(1L, 500L)
    tokens <- Gen.frequency(8 -> Gen.choose(1, 300), 1 -> Gen.choose(900, 1500))
  } yield (id, tokens)).map(_.distinctBy(_._1))

  property("exactly-once, budget-bounded, correct totals, deterministic") =
    forAll(genDocs, Gen.oneOf(256, 512, 1024)) { (docs, budget) =>
      import spark.implicits._
      val df = docs.toDF("doc_id", "n_tokens")
      def run() = SequencePack.pack(df, "doc_id", "n_tokens", budget, numGroups = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toList

      val got = run()
      val byBin = got.groupBy(_._3)
      val exactlyOnce = got.map(_._1).sorted == docs.map(_._1).sorted
      val totalsRight = byBin.values.forall(ms => ms.forall(_._4 == ms.map(_._2).sum))
      val bounded = byBin.values.forall { ms =>
        ms.map(_._2).sum <= budget || ms.size == 1 // oversize doc: own bin
      }
      val tokensRight = got.forall { case (id, t, _, _) => docs.toMap.apply(id) == t }
      val deterministic = run().sorted == got.sorted
      exactlyOnce && totalsRight && bounded && tokensRight && deterministic
    }
}
