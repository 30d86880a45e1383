package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Goldens for the BPE trainer: the classic Sennrich corpus (hand-computed
  * merge sequence), the documented two-pass-replace deviation from canonical
  * greedy merging, and the runs-out-of-pairs early stop. */
class BpeLearnSpec extends SparkSpec {

  private def wc(pairs: (String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    pairs.toSeq.toDF("word", "cnt")
  }

  test("classic Sennrich corpus learns the known merge sequence") {
    // low×5 lower×2 newest×6 widest×3; hand-derived with the (count DESC,
    // left, right) tiebreak: es/9, est/9, est</w>/9, lo/7, low/7, ew/6
    val m = BpeLearn.learn(wc("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
      .map(x => (x.left_sym, x.right_sym, x.pair_count))
    assert(m == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L),
      ("l", "o", 7L), ("lo", "w", 7L), ("e", "w", 6L)))
    assert(BpeLearn.learn(wc("low" -> 5L), 6).map(_.merge_rank) == Seq(1, 2, 3))
  }

  test("merge application is the documented two-pass non-overlapping replace") {
    // canonical greedy BPE would give `aa aa a </w>`; the two-pass contract
    // yields `aa a aa </w>` — asserted here so the deviation stays visible
    val rendered = BpeLearn.initialSymbols(wc("aaaaa" -> 1L))
      .select(BpeLearn.applyMerge(col("w"), "a", "a"))
      .head.getString(0)
    assert(rendered == "aa a aa </w>")
    // even run merges cleanly in two passes
    val even = BpeLearn.initialSymbols(wc("aaaa" -> 1L))
      .select(BpeLearn.applyMerge(col("w"), "a", "a"))
      .head.getString(0)
    assert(even == "aa aa </w>")
    val first = BpeLearn.learn(wc("aaaaa" -> 1L), 1).head
    assert((first.left_sym, first.right_sym, first.pair_count) == ("a", "a", 4L))
  }

  test("stops early when no repeated pair remains") {
    // `a b </w>` → merge (a,b) → `ab </w>` → merge (ab,</w>) → single symbol
    val m = BpeLearn.learn(wc("ab" -> 1L), 5)
    assert(m.map(x => (x.left_sym, x.right_sym)) == Seq(("a", "b"), ("ab", "</w>")))
  }
}
