package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the bloom-filter bit mechanics over arbitrary key
  * sets: the no-false-negative guarantee (the one b1's correctness proof
  * rests on), merge = union (order/associativity-free), and probe
  * determinism — pure BloomBits, no Spark session needed.
  */
object BloomFilterCheck extends Properties("graft.functions.BloomBits") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(300)

  private val genKeys: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))

  private def fresh(k: Int = 5, bytes: Int = 512): Array[Byte] = {
    val f = new Array[Byte](1 + bytes); f(0) = k.toByte; f
  }

  property("no false negatives, any keys (incl. negative/min/max)") =
    forAll(genKeys) { keys =>
      val f = fresh()
      keys.foreach(BloomBits.set(f, _))
      keys.forall(BloomBits.mightContain(f, _))
    }

  property("merging two filters equals building one from the union") =
    forAll(genKeys, genKeys) { (a, b) =>
      val fa = fresh(); a.foreach(BloomBits.set(fa, _))
      val fb = fresh(); b.foreach(BloomBits.set(fb, _))
      val union = fresh(); (a ++ b).foreach(BloomBits.set(union, _))
      val merged = fa.clone()
      var i = 1
      while (i < merged.length) { merged(i) = (merged(i) | fb(i)).toByte; i += 1 }
      merged.sameElements(union)
    }

  property("probe is a pure function of (filter, key)") =
    forAll(genKeys, Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (keys, probe) =>
      val f = fresh()
      keys.foreach(BloomBits.set(f, _))
      BloomBits.mightContain(f, probe) == BloomBits.mightContain(f.clone(), probe)
    }
}
