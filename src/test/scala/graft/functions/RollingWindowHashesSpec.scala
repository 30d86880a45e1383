package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental rolling update against the definitional left fold
  * `(acc·B + t mod p) mod p` per window — the exact arithmetic the d14
  * DuckDB oracle computes with list_reduce — plus the null/short-doc and
  * position-independence contracts. A drift here would make d14's two
  * engines disagree only on multi-window documents, the worst place to
  * find it. */
class RollingWindowHashesSpec extends SparkSpec {

  import spark.implicits._

  private val W = 5

  /** The definitional fold, per window, in driver Scala. */
  private def foldHashes(t: Seq[Long]): Seq[(Long, Long, Long, Long)] =
    (0 to t.length - W).map { s =>
      val hs = (0 until 3).map { k =>
        val (b, p) = (RollingWindowHashes.Bases(k), RollingWindowHashes.Primes(k))
        t.slice(s, s + W).foldLeft(0L)((acc, x) => (acc * b + x % p) % p)
      }
      ((s + 1).toLong, hs(0), hs(1), hs(2))
    }

  private def rollingHashes(t: Seq[Long]): Seq[(Long, Long, Long, Long)] =
    Seq(Tuple1(t)).toDF("tv")
      .select(explode(RollingWindowHashes(col("tv"), W)).as("x"))
      .select(col("x.pos"), col("x.h1"), col("x.h2"), col("x.h3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("rolling update equals the definitional per-window fold") {
    // deterministic 60-bit-ish values including repeats and extremes
    val t = Seq(0L, 1L, (1L << 60) - 1, 987654321987L, 42L, 42L, 42L,
      1152921504606846975L, 7L, 2147483647L, 2147483646L, 99L, 3L)
    assert(rollingHashes(t) == foldHashes(t))
  }

  test("identical window content at different positions hashes identically") {
    val span = Seq(11L, 22L, 33L, 44L, 55L)
    val t = Seq(1L, 2L) ++ span ++ Seq(9L, 8L, 7L) ++ span ++ Seq(6L)
    val hs = rollingHashes(t)
    val atPos3 = hs.find(_._1 == 3L).get
    val atPos11 = hs.find(_._1 == 11L).get
    assert((atPos3._2, atPos3._3, atPos3._4) == (atPos11._2, atPos11._3, atPos11._4))
    // and a shifted window does NOT collide
    val atPos4 = hs.find(_._1 == 4L).get
    assert((atPos4._2, atPos4._3, atPos4._4) != (atPos3._2, atPos3._3, atPos3._4))
  }

  test("documents shorter than the window yield null (explode emits nothing)") {
    val rows = Seq(Tuple1(Seq(1L, 2L, 3L, 4L))).toDF("tv")
      .select(explode(RollingWindowHashes(col("tv"), W)).as("x"))
      .count()
    assert(rows == 0L)
    // exactly-W yields exactly one window
    assert(rollingHashes(Seq(1L, 2L, 3L, 4L, 5L)).map(_._1) == Seq(1L))
  }
}
