package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SimHashSignature vs an independent hex-string reference: the expression
  * reads bits straight from digest bytes, the reference formats md5 as hex
  * and tests `digit >= '8'` — agreement pins the bit indexing. */
class SimHashSignatureSpec extends SparkSpec {
  import spark.implicits._

  /** Reference formulation: tf-weighted ±cnt sums over hex-digit high bits. */
  private def reference(text: String): String = {
    val toks = text.toLowerCase.split(" ", -1).toSeq
    val tf = toks.groupBy(identity).view.mapValues(_.size)
    val sums = new Array[Int](32)
    tf.foreach { case (tok, cnt) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes).map("%02x".format(_)).mkString
      (0 until 32).foreach { j =>
        if (hex(j) >= '8') sums(j) += cnt else sums(j) -= cnt
      }
    }
    sums.map(s => if (s > 0) '1' else '0').mkString
  }

  test("matches the hex-digit reference, tf weighting included") {
    val texts = Seq(
      "the quick brown fox",
      "the the the repeated token weighting",
      "", // split("") = [""] — md5 of the empty token still counts
      "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      "mixedCASE Tokens lowerCASE first")
    val got = texts.toDF("text")
      .select(SimHashSignature(split(lower(col("text")), " ")).as("sh"))
      .collect().map(_.getString(0))
    texts.zip(got).foreach { case (t, g) =>
      assert(g == reference(t), s"mismatch for '$t'")
      assert(g.length == 32 && g.forall(c => c == '0' || c == '1'))
    }
  }

  test("null array and empty array produce null, null elements are skipped") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1, array('tok')),
        |  (2, CAST(null AS array<string>)),
        |  (3, array(CAST(null AS string), 'tok')),
        |  (4, CAST(array() AS array<string>))
        |AS t(id, toks)""".stripMargin)
    val out = df.select(col("id"), SimHashSignature(col("toks")).as("sh"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(out(2).isEmpty && out(4).isEmpty)
    assert(out(1).nonEmpty && out(3) == out(1)) // null element contributes nothing
  }
}
