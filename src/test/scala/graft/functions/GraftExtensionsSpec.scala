package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  private def register(): Unit =
    Seq(GraftExtensions.floatVectorDot, GraftExtensions.longVectorSqDist,
        GraftExtensions.wordShingles,
        GraftExtensions.minhashSignature, GraftExtensions.simhashSignature,
        GraftExtensions.hashedWordShingles, GraftExtensions.pairCandidates)
      .foreach { case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
      }

  test("registered SQL functions evaluate through spark.sql") {
    register()
    val dot = spark.sql(
      "SELECT float_vector_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").head.getDouble(0)
    assert(dot == 11.0)

    val sq = spark.sql(
      "SELECT long_vector_sqdist(array(CAST(1 AS BIGINT), CAST(5 AS BIGINT)), " +
        "array(CAST(4 AS BIGINT), CAST(3 AS BIGINT))) AS d").head.getLong(0)
    assert(sq == 13L) // 3² + 2²

    val sh = spark.sql("SELECT word_shingles('a b c d') AS s").head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))

    val sh2 = spark.sql("SELECT word_shingles('a b c d', 2) AS s").head.getSeq[String](0)
    assert(sh2 == Seq("a b", "b c", "c d"))

    val mh = spark.sql("SELECT minhash_signature(word_shingles('a b c d e f')) AS m")
      .head.getSeq[Long](0)
    assert(mh.length == 9 && mh.forall(v => v >= 0 && v < GraftExtensions.DefaultModulus))

    val sim = spark.sql("SELECT simhash_signature(array('tok1', 'tok2')) AS s")
      .head.getString(0)
    assert(sim.length == 32 && sim.forall(c => c == '0' || c == '1'))

    val hws = spark.sql("SELECT hashed_word_shingles('a b c d') AS h")
      .head.getSeq[Long](0)
    assert(hws.length == 2) // same count as word_shingles('a b c d')

    val pc = spark.sql(
      "SELECT pair_candidates(array(CAST(16777226 AS BIGINT), CAST(33554442 AS BIGINT))) AS p")
      .head.getSeq[org.apache.spark.sql.Row](0) // docs 1 and 2, n=10 each
    assert(pc.length == 1 && pc.head.getLong(0) == ((1L << 32) | 2L) && pc.head.getInt(1) == 20)
  }

  test("wrong arity raises an analysis error, not MatchError") {
    register()
    val e = intercept[Exception](spark.sql("SELECT float_vector_dot(array(CAST(1 AS FLOAT)))").collect())
    assert(!e.isInstanceOf[scala.MatchError])
  }

  test("null shingle elements are skipped, matching list_min's NULL handling") {
    register()
    val withNull = spark.sql(
      "SELECT minhash_signature(array('x y z', CAST(NULL AS STRING))) AS m")
      .head.getSeq[Long](0)
    val without = spark.sql("SELECT minhash_signature(array('x y z')) AS m")
      .head.getSeq[Long](0)
    assert(withNull == without)
  }
}
