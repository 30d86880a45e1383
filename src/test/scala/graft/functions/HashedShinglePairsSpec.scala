package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two native d3 hot-path expressions against their composable
  * formulations: HashedWordShingles must agree with
  * `WordShingles + xxhash64-per-element` on COUNTS and on set identity
  * (not hash values — the hash is a private grouping key), and
  * PairCandidates must emit exactly the pairs the transform/filter/struct
  * composition emitted. */
class HashedShinglePairsSpec extends SparkSpec {
  import spark.implicits._

  test("hashed shingle count equals the distinct string-shingle count") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a",                       // heavy repetition -> 1 distinct
      "one two",                         // below n -> empty
      "",                                // empty text -> 1 token -> empty
      "x  y z w",                        // double space -> empty token
      "ALPHA Beta GAMMA alpha beta gamma alpha beta gamma"  // case folding + dup
    ).toDF("text")
    val got = docs.select(
      size(HashedWordShingles($"text", 3)).as("h"),
      size(WordShingles($"text", 3)).as("s")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"hashed=${r.getInt(0)} string=${r.getInt(1)}"))
  }

  test("equal shingle sets produce equal hash sets; disjoint sets disjoint hashes") {
    // same trigrams in different sentence positions must collide (that IS
    // the jaccard overlap signal); different trigrams must not
    val df = Seq(
      ("d1", "alpha beta gamma delta"),
      ("d2", "zz alpha beta gamma"),   // shares "alpha beta gamma" with d1
      ("d3", "wholly different words here")
    ).toDF("id", "text")
    val sets = df.select($"id", HashedWordShingles($"text", 3).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((sets("d1") intersect sets("d2")).size == 1)
    assert((sets("d1") intersect sets("d3")).isEmpty)
  }

  test("hashes are deterministic across evaluations") {
    val df = Seq("some stable text for hashing determinism check").toDF("text")
    val a = df.select(HashedWordShingles($"text", 3)).head.getSeq[Long](0)
    val b = df.select(HashedWordShingles($"text", 3)).head.getSeq[Long](0)
    assert(a == b && a == a.sorted)
  }

  test("PairCandidates equals the composed transform/filter formulation") {
    // packed members doc_id<<24 | n, sorted; include pairs the 0.5-jaccard
    // size prune must drop (n1+n2 > 3*min)
    def pack(doc: Long, n: Long): Long = (doc << 24) | n
    val docs = Seq(Seq(
      pack(1, 10), pack(2, 12), pack(3, 40), pack(4, 5))).toDF("docs")

    val native = docs.select(explode(PairCandidates($"docs")).as("p"))
      .select($"p.pk", $"p.s")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    val composed = docs.select(explode(flatten(
      transform($"docs", (x, i) =>
        filter(
          transform(slice($"docs", i + 2, size($"docs")),
            y => struct(
              (shiftleft(shiftright(x, 24), 32) + shiftright(y, 24)).as("pk"),
              x.bitwiseAND(lit(0xffffffL)).as("n1"),
              y.bitwiseAND(lit(0xffffffL)).as("n2"))),
          p => p("n1") + p("n2") <= lit(3) * least(p("n1"), p("n2")))))).as("p"))
      .select($"p.pk", ($"p.n1" + $"p.n2").cast("int").as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

    assert(native == composed)
    // sanity: (1,2) survives (10+12 <= 3*10), (3,*) mismatches die,
    // (1,4)/(2,4) die (5+10 <= 15 survives! check): min(10,5)*3=15 >= 15 ✓
    assert(native.contains(((1L << 32) | 2L, 22)))
    assert(native.contains(((1L << 32) | 4L, 15)))
    assert(!native.exists { case (pk, _) => (pk >> 32) == 3L || (pk & 0xffffffffL) == 3L })
  }

  test("PairCandidates with pruning disabled emits every pair") {
    def pack(doc: Long, n: Long): Long = (doc << 24) | n
    val docs = Seq(Seq(pack(1, 1), pack(2, 100), pack(3, 1000))).toDF("docs")
    val all = docs.select(explode(PairCandidates($"docs", 0, 1)).as("p"))
      .select($"p.pk").collect().map(_.getLong(0)).toSet
    assert(all == Set((1L << 32) | 2L, (1L << 32) | 3L, (2L << 32) | 3L))
  }
}
