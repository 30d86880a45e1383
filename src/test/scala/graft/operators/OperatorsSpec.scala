package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the unsalted inner join on a skewed key") {
    // 90% of fact rows share one key — the salted variant must still produce
    // the identical result set.
    val fact = (0 until 1000)
      .map(i => (if (i < 900) "hot" else s"k${i % 17}", i.toLong, i * 1.5))
      .toDF("key", "row_id", "v")
    val dim = Seq(("hot", "HOT"), ("k3", "K3"), ("k5", "K5"), ("missing", "M"))
      .toDF("key", "label")

    val expected = fact.join(dim, Seq("key"))
      .select("key", "row_id", "v", "label")
      .collect().map(_.toSeq).toSet
    val got = Skew.saltedJoin(fact, dim, Seq("key"), saltBy = col("row_id"), buckets = 8)
      .select("key", "row_id", "v", "label")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == 900 + fact.filter("key in ('k3','k5')").count())
  }

  test("saltedJoinHot equals the unsalted join across threshold regimes") {
    val fact = (0 until 1000)
      .map(i => (if (i < 900) "hot" else s"k${i % 17}", i.toLong, i * 1.5))
      .toDF("key", "row_id", "v")
    val dim = Seq(("hot", "HOT"), ("k3", "K3"), ("k5", "K5"), ("missing", "M"))
      .toDF("key", "label")
    val expected = fact.join(dim, Seq("key"))
      .select("key", "row_id", "v", "label")
      .collect().map(_.toSeq).toSet

    // threshold 100: only "hot" (900 rows) salts; cold keys (<=7 rows
    // each) ride salt 0. threshold 1: every key salts. threshold 10^6:
    // nothing is hot — all rows carry salt 0 on both sides, so the single
    // join degenerates to the plain equi-join.
    Seq(100L, 1L, 1000000L).foreach { thr =>
      val got = Skew.saltedJoinHot(fact, dim, Seq("key"),
          saltBy = col("row_id"), buckets = 8, hotRowThreshold = thr)
        .select("key", "row_id", "v", "label")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"hotRowThreshold=$thr diverged")
    }
  }

  test("saltedJoinHot replicates the dim only for hot keys") {
    val fact = (0 until 1000)
      .map(i => (if (i < 900) "hot" else s"k${i % 17}", i.toLong, i * 1.5))
      .toDF("key", "row_id", "v")
    val dim = Seq(("hot", "HOT"), ("k3", "K3"), ("k5", "K5"), ("missing", "M"))
      .toDF("key", "label")
    // Reproduce the internal hot-key detection at threshold 100: only "hot"
    // qualifies, so the salted arm's replicated dim must be 1 key x buckets
    // — NOT |dim| x buckets (the saltedJoin cost this operator exists to
    // avoid).
    val hotKeys = fact.groupBy("key").count().filter(col("count") > 100)
      .select("key")
    assert(hotKeys.collect().map(_.getString(0)).toSeq == Seq("hot"))
    val replicated = dim.join(broadcast(hotKeys), Seq("key"), "left_semi")
      .withColumn("_salt", explode(sequence(lit(0), lit(7))))
    assert(replicated.count() == 8L)
  }

  test("distinctCountSkewAware equals countDistinct, nulls included") {
    val df = (0 until 500).map(i => (s"g${i % 3}", if (i % 11 == 0) null else s"v${i % 37}"))
      .toDF("g", "v")
      .union(Seq(("gnull", null), ("gnull", null)).toDF("g", "v"))
    val expected = df.groupBy("g").agg(countDistinct("v").as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Skew.distinctCountSkewAware(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("TopK aggregator matches the window formulation") {
    val rng = new scala.util.Random(11)
    val scored = (0 until 2000).map { i =>
      (i % 5L, rng.nextDouble(), i.toLong) // (queryId, score, candidateId)
    }
    val ds = scored.toDF("q", "score", "id").as[(Long, Double, Long)]

    val viaAgg = ds.groupByKey(_._1)
      .agg(TopK.topK(10).toColumn.name("top"))
      .collect().map { case (q, top) => q -> top.map(_._2) }.toMap

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("q").orderBy(col("score").desc, col("id"))
    val viaWindow = ds.toDF("q", "score", "id")
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .groupBy("q").agg(collect_list("id").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    assert(viaAgg.keySet == viaWindow.keySet)
    viaAgg.foreach { case (q, ids) => assert(ids == viaWindow(q), s"query $q") }
  }

  test("TopK input needs (score, id) — reduce keeps the k best with id tiebreak") {
    val ds = Seq((1L, 0.5, 1L), (1L, 0.5, 2L), (1L, 0.9, 3L), (1L, 0.1, 4L))
      .toDF("q", "score", "id").as[(Long, Double, Long)]
    val got = ds.groupByKey(_._1).agg(TopK.topK(2).toColumn.name("top")).collect()
    assert(got.head._2.map(_._2) == Seq(3L, 1L)) // 0.9 first, then 0.5 with smaller id
  }

  test("TopK orders NaN scores totally (Double.compare), not by IEEE <") {
    // a NaN score (cosine of a zero-norm vector) must behave like the old
    // PriorityQueue's TotalOrdering — above every real score, deterministic
    // regardless of arrival order — never corrupt the heap invariant
    val rows = Seq(
      (1L, Double.NaN, 9L), (1L, 0.9, 1L), (1L, 0.8, 2L), (1L, 0.95, 3L), (1L, 0.7, 4L))
    val perms = Seq(rows, rows.reverse, rows.sortBy(_._3))
    val results = perms.map { p =>
      p.toDF("q", "score", "id").as[(Long, Double, Long)]
        .groupByKey(_._1).agg(TopK.topK(3).toColumn.name("top"))
        .collect().head._2.map(_._2)
    }
    // retention: NaN > all under TotalOrdering, so it deterministically
    // holds a top-3 slot (evicting 0.8/0.7); presentation: finish's
    // (-s, id) sort places NaN last (-NaN is NaN, still ordered totally).
    // Identical result for every arrival order is the point.
    assert(results.forall(_ == Seq(3L, 1L, 9L)), s"got: $results")
  }
}
