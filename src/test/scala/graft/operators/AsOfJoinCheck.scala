package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property check: AsOfJoin.backward agrees with the obviously-correct
  * quadratic reference (per left row: scan every right row, keep the
  * latest with same key and ts <= left ts, ties by highest tiebreak) on
  * random key/timestamp data with heavy collisions.
  */
// Top-level on purpose: encoder codegen cannot instantiate case classes
// nested inside an object (Janino "no applicable constructor" ERROR spam +
// interpreted fallback on every run).
case class AsOfCheckL(id: Long, k: String, ts: Long)
case class AsOfCheckR(k: String, ts: Long, rid: Long, v: Double)

object AsOfJoinCheck extends Properties("graft.operators.AsOfJoin") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session

  private type L = AsOfCheckL
  private val L = AsOfCheckL
  private type R = AsOfCheckR
  private val R = AsOfCheckR

  private val genL = for {
    id <- Gen.choose(1L, 1000L)
    k <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 20L)
  } yield L(id, k, ts)
  private val genR = for {
    k <- Gen.oneOf("a", "b", "c", "d")
    ts <- Gen.choose(0L, 20L)
    rid <- Gen.choose(1L, 1000L)
    v <- Gen.choose(0, 99).map(_.toDouble)
  } yield R(k, ts, rid, v)

  private def naive(ls: List[L], rs: List[R]): Map[Long, Option[(Long, Double)]] =
    ls.map { l =>
      val best = rs.filter(r => r.k == l.k && r.ts <= l.ts)
        .sortBy(r => (r.ts, r.rid)).lastOption
      l.id -> best.map(r => (r.rid, r.v))
    }.toMap

  /** Forward reference: EARLIEST right row at-or-after, ties by rid under
    * the reversed-time ordering (last in (-ts, rid) order = min ts,
    * max rid — mirroring how the operator's descending window breaks
    * right-side ties). */
  private def naiveForward(ls: List[L], rs: List[R]): Map[Long, Option[(Long, Double)]] =
    ls.map { l =>
      val best = rs.filter(r => r.k == l.k && r.ts >= l.ts)
        .sortBy(r => (-r.ts, r.rid)).lastOption
      l.id -> best.map(r => (r.rid, r.v))
    }.toMap

  /** Nearest reference: closer of the two directed matches by |Δts|,
    * ties to the backward match (the operator's documented rule). */
  private def naiveNearest(ls: List[L], rs: List[R]): Map[Long, Option[(Long, Double)]] =
    ls.map { l =>
      val bw = rs.filter(r => r.k == l.k && r.ts <= l.ts)
        .sortBy(r => (r.ts, r.rid)).lastOption
      val fw = rs.filter(r => r.k == l.k && r.ts >= l.ts)
        .sortBy(r => (-r.ts, r.rid)).lastOption
      val choice = (bw, fw) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          if ((l.ts - b.ts) <= (f.ts - l.ts)) Some(b) else Some(f)
      }
      l.id -> choice.map(r => (r.rid, r.v))
    }.toMap

  /** Run one direction of the operator and collect id → (rid, v). */
  private def run(
      ls: List[L], rs: List[R],
      join: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =>
        org.apache.spark.sql.DataFrame): Map[Long, Option[(Long, Double)]] = {
    import spark.implicits._
    join(ls.toDF("id", "k", "lts"), rs.toDF("k", "rts", "rid", "v"))
      .collect().map { row =>
        val rid = Option(row.getAs[Any]("rid")).map(_.asInstanceOf[Long])
        val v = Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double])
        row.getAs[Long]("id") -> rid.map(r => (r, v.get))
      }.toMap
  }


  property("forward matches the quadratic reference under key/ts collisions") =
    forAll(Gen.listOfN(30, genL), Gen.listOfN(30, genR)) { (ls0, rs0) =>
      val ls = ls0.groupBy(_.id).map(_._2.head).toList
      val rs = rs0.groupBy(r => (r.k, r.ts, r.rid)).map(_._2.head).toList
      val got = run(ls, rs, (l, r) => AsOfJoin.forward(l, r,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts",
        payload = Seq("rid", "v"), rightOrder = Seq(col("rid"))))
      got == naiveForward(ls, rs)
    }

  property("nearest picks the closer directed match, ties to backward") =
    forAll(Gen.listOfN(30, genL), Gen.listOfN(30, genR)) { (ls0, rs0) =>
      val ls = ls0.groupBy(_.id).map(_._2.head).toList
      val rs = rs0.groupBy(r => (r.k, r.ts, r.rid)).map(_._2.head).toList
      val got = run(ls, rs, (l, r) => AsOfJoin.nearest(l, r,
        keys = Seq("k"), leftTs = "lts", rightTs = "rts",
        payload = Seq("rid", "v"), rightOrder = Seq(col("rid"))))
      got == naiveNearest(ls, rs)
    }

  property("matches the quadratic reference under key/ts collisions") =
    forAll(Gen.listOfN(30, genL), Gen.listOfN(30, genR)) { (ls0, rs0) =>
      // distinct left ids: the naive map keys by id; distinct right
      // (k, ts, rid): two right rows tying on the full sort key but
      // carrying different v would make BOTH the operator and the naive
      // reference nondeterministic — not a property worth flaking over
      val ls = ls0.groupBy(_.id).map(_._2.head).toList
      val rs = rs0.groupBy(r => (r.k, r.ts, r.rid)).map(_._2.head).toList
      import spark.implicits._
      val left = ls.toDF("id", "k", "lts")
      val right = rs.toDF("k", "rts", "rid", "v")
      val got = AsOfJoin.backward(left, right,
          keys = Seq("k"), leftTs = "lts", rightTs = "rts",
          payload = Seq("rid", "v"), rightOrder = Seq(col("rid")))
        .collect().map { row =>
          val rid = Option(row.getAs[Any]("rid")).map(_.asInstanceOf[Long])
          val v = Option(row.getAs[Any]("v")).map(_.asInstanceOf[Double])
          row.getAs[Long]("id") -> rid.map(r => (r, v.get))
        }.toMap
      got == naive(ls, rs)
    }
}
