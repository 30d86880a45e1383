package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check for the BPE trainer against an INDEPENDENT in-memory
  * reference implementation of the same contract (two-pass non-overlapping
  * merge rewrite, (count DESC, left, right) argmax): random small corpora,
  * full merge-sequence equality. Also checks the mass-conservation
  * invariant of tokenization — applying the learned merges never changes
  * the space-stripped character content of any rendering.
  */
object BpeLearnCheck extends Properties("graft.operators.BpeLearn") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  // small alphabet → dense pair collisions → eviction of every easy path
  private val genCorpus: Gen[List[(String, Long)]] = Gen.listOfN(12, for {
    len <- Gen.choose(1, 6)
    w <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    n <- Gen.choose(1L, 9L)
  } yield (w, n)).map(_.distinctBy(_._1))

  /** Reference trainer: plain Scala, no Spark, no shared code with the
    * implementation under test. */
  private def refLearn(corpus: List[(String, Long)], k: Int): List[(String, String, Long)] = {
    def twoPass(w: String, a: String, b: String): String = {
      val pat = s" $a $b "; val rep = s" $a$b "
      (" " + w + " ").replace(pat, rep).replace(pat, rep).trim
    }
    var words = corpus.map { case (w, n) => (w.map(_.toString).mkString(" ") + " </w>", n) }
    val out = List.newBuilder[(String, String, Long)]
    var rank = 0
    var stop = false
    while (rank < k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, n) <- words; Array(a, b) <- w.split(" ").sliding(2))
        counts((a, b)) = counts.getOrElse((a, b), 0L) + n
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toList.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        words = words.map { case (w, n) => (twoPass(w, a, b), n) }
        rank += 1
      }
    }
    out.result()
  }

  property("matches an independent reference trainer on random corpora") =
    forAll(genCorpus, Gen.choose(1, 6)) { (corpus, k) =>
      import spark.implicits._
      val wc = corpus.toDF("word", "cnt")
      val got = BpeLearn.learn(wc, k).map(m => (m.left_sym, m.right_sym, m.pair_count))
      got == refLearn(corpus, k)
    }

  property("tokenization conserves characters and weights") =
    forAll(genCorpus, Gen.choose(1, 6)) { (corpus, k) =>
      import spark.implicits._
      val wc = corpus.toDF("word", "cnt")
      val merges = BpeLearn.learn(wc, k)
      val rendered = BpeLearn.applyMerges(BpeLearn.initialSymbols(wc), merges)
        .collect().map(r => (r.getString(0), r.getLong(1))).toList
      val gotContent = rendered.map { case (w, n) => (w.replace(" ", ""), n) }.sorted
      val wantContent = corpus.map { case (w, n) => (w + "</w>", n) }.sorted
      gotContent == wantContent
    }
}
