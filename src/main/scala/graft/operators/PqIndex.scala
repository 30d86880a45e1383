package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the compression half
  * of the standard IVF-PQ ANN stack (public: Jégou et al., "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011), next to
  * [[AnnIndex]] (IVF cells) and the catalog's `s4` scalar quantizer.
  *
  * The vector is split into `nSub` contiguous subvectors; each subspace
  * gets its own `nCodes`-entry codebook (KMeans on a bounded sample), and a
  * vector is stored as `nSub` single-byte codes — 64 float dims (256 B)
  * become 8 B at nSub=8, a 32× compression that keeps distance structure
  * far better than scalar quantization at the same budget.
  *
  * Search is asymmetric distance computation (ADC): per query, ONE
  * `nSub × nCodes` table of partial squared distances (a few KB) is
  * precomputed and broadcast; a candidate's approximate distance is then
  * `nSub` table lookups over its codes — no float math per candidate. The
  * scale shape: codebooks and tables are fixed-size driver/broadcast state
  * (the b1 bloom posture), encoding is one map-only pass, and search scans
  * CODES (nSub bytes/row), not vectors, with an optional exact rescore of
  * only the shortlist. Encoding/lookup run in `mapPartitions` — the
  * imperative codec boundary, like the multimodal decoders — because a
  * 128-term argmin per row is loop code, not an expression tree.
  */
object PqIndex {

  /** centers(sub)(code) is a subDim-length float array. Subspaces may hold
    * FEWER centers than requested (KMeans returns < k on degenerate data —
    * e.g. a zero-padded or near-constant subspace); every loop below bounds
    * itself by `centers(s).length`, and `nCodes` is the STRIDE (the max),
    * so ragged codebooks encode and search correctly instead of crashing. */
  final case class Codebooks(nSub: Int, subDim: Int, centers: Array[Array[Array[Float]]]) {
    def nCodes: Int = centers.map(_.length).max
  }

  /** Fit per-subspace codebooks on at most `maxFitRows` sampled vectors.
    * `dim` must divide evenly into `nSub` subspaces. */
  def fit(
      corpus: DataFrame,
      vecCol: String,
      dim: Int,
      nSub: Int = 8,
      nCodes: Int = 16,
      seed: Long = 42L,
      maxFitRows: Int = 100000): Codebooks = {
    require(dim % nSub == 0, s"dim $dim must be divisible by nSub $nSub")
    require(nCodes >= 2 && nCodes <= 256,
      s"nCodes must be in [2,256] (codes are stored as single bytes), got $nCodes")
    val subDim = dim / nSub
    // bounded fit set via the shared seeded reservoir (a limit() prefix
    // would train on the first partitions only), cached once for all fits
    val sample = AnnIndex
      .reservoirSample(corpus.select(col(vecCol).as("v")), maxFitRows.toLong, seed)
      .cache()
    try {
      val centers = (0 until nSub).map { s =>
        val slices = sample.select(
          array_to_vector(slice(col("v"), s * subDim + 1, subDim)).as("_vec"))
        val model = new KMeans()
          .setK(nCodes).setSeed(seed + s).setFeaturesCol("_vec")
          .fit(slices)
        model.clusterCenters.map(_.toArray.map(_.toFloat))
      }.toArray
      Codebooks(nSub, subDim, centers)
    } finally { sample.unpersist(); () }
  }

  /** Nearest code per subspace — the encoder both `encode` and tests share. */
  def encodeVec(cb: Codebooks, v: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](cb.nSub)
    var s = 0
    while (s < cb.nSub) {
      val base = s * cb.subDim
      var best = 0; var bestD = Float.MaxValue
      var c = 0
      val codesInSub = cb.centers(s).length
      while (c < codesInSub) {
        val ctr = cb.centers(s)(c)
        var d = 0f; var i = 0
        while (i < cb.subDim) {
          val diff = v(base + i) - ctr(i); d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Map-only encoding pass: (`idCol`, codes array<byte>). */
  def encode(cb: Codebooks, df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, encodeVec(bc.value, v)) })
      .toDF(idCol, "codes")
  }

  /** ADC top-`shortlist` per query over the encoded corpus, then exact
    * cosine rescore of the shortlist against the original vectors, keeping
    * the final top `k`. Queries are collected (tiny by definition — this is
    * the same fixed-size-driver-state posture as AnnIndex's probe cells).
    * Output: query_id, neighbor_id, cos_sim, adc_rank. */
  def searchTopK(
      cb: Codebooks,
      encoded: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 10,
      shortlist: Int = 64): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val qRows = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    // per-query ADC tables: table(q)(s * nCodes + c) = ||q_s − center_sc||²
    val tables = qRows.map { case (qid, qv) =>
      val t = new Array[Float](cb.nSub * cb.nCodes)
      var s = 0
      while (s < cb.nSub) {
        val base = s * cb.subDim
        var c = 0
        val codesInSub = cb.centers(s).length
        while (c < codesInSub) {
          val ctr = cb.centers(s)(c)
          var d = 0f; var i = 0
          while (i < cb.subDim) { val diff = qv(base + i) - ctr(i); d += diff * diff; i += 1 }
          t(s * cb.nCodes + c) = d
          c += 1
        }
        s += 1
      }
      (qid, t)
    }
    val bcTables = spark.sparkContext.broadcast(tables)
    val nSub = cb.nSub; val nCodes = cb.nCodes
    // candidate scoring emits (query, −dist, id) straight into the bounded
    // k-heap aggregate (operators/TopK): only shortlist × partitions rows
    // cross the wire — the window formulation would shuffle EVERY
    // corpus × queries row to its query's reducer, the exact anti-pattern
    // TopK exists to avoid. Self-matches are excluded here, matching the
    // AnnIndex/bruteForce contract (a query is never its own neighbor).
    val short = encoded.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val ts = bcTables.value
        it.flatMap { case (id, codes) =>
          ts.iterator.collect { case (qid, t) if qid != id =>
            var d = 0.0; var s = 0
            while (s < nSub) { d += t(s * nCodes + (codes(s) & 0xFF)); s += 1 }
            (qid, -d, id) // negate: TopK keeps HIGHEST scores = smallest dist
          }
        }
      }
      .groupByKey(_._1)
      .agg(TopK.topK(shortlist).toColumn)
      .flatMap { case (qid, top) =>
        top.zipWithIndex.map { case ((_, id), i) => (qid, id, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "adc_rank")
    // exact rescore of the shortlist only — the original vectors are read
    // for shortlist × queries rows, not the corpus
    val qDf = qRows.toSeq.toDF("query_id", "q_emb")
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      col(vecCol).as("c_emb"))
    val dot = graft.functions.VectorExpressions.dotF _
    val scored = short.join(c, Seq("neighbor_id"))
      .join(broadcast(qDf), Seq("query_id"))
      .withColumn("cos_sim",
        dot(col("q_emb"), col("c_emb")) /
          (sqrt(dot(col("q_emb"), col("q_emb"))) * sqrt(dot(col("c_emb"), col("c_emb")))))
    val finalRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(finalRank))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("adc_rank"))
  }
}
