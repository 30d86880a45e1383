package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col

/** Property check for the dedup hot-bucket guard: boundedDocLists equals the
  * naive collect-then-filter for every key whose document frequency is in
  * [2, cap], emits NO bucket above the cap (the 100 TB OOM guard), and every
  * emitted list arrives sorted.
  */
object DedupBucketsCheck extends Properties("graft.operators.Dedup") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  // (key, doc) pairs over few keys / many docs so caps actually trigger;
  // deduped because boundedDocLists' contract is one row per (key, doc)
  private val genPairs: Gen[List[(Long, Long)]] = Gen.listOfN(80, for {
    k <- Gen.choose(0L, 5L)
    d <- Gen.choose(0L, 30L)
  } yield (k, d)).map(_.distinct)

  property("equals naive collect-then-filter, all buckets within [2, cap]") =
    forAll(genPairs, Gen.oneOf(2, 4, 8, 64)) { (pairs, cap) =>
      import spark.implicits._
      val df = pairs.toDF("k", "doc_id")
      val got = Dedup.boundedDocLists(df, Seq("k"), col("doc_id"), cap)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      val expected = pairs.groupBy(_._1)
        .view.mapValues(_.map(_._2).sorted).toMap
        .filter { case (_, docs) => docs.size >= 2 && docs.size <= cap }
      got == expected && got.valuesIterator.forall(l => l.size <= cap && l == l.sorted)
    }
}
