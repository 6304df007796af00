package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.linalg.Vectors
import graft.functions.VectorOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale plan:
  *   - [[bruteForceTopK]]: exact cosine top-k. The query side is broadcast
  *     (it is by construction small), so the corpus is scanned once with no
  *     shuffle — a BroadcastNestedLoopJoin whose inner loop is a codegen'd
  *     `aggregate(zip_with(...))` dot product. Linear in |corpus|, which is
  *     the right baseline and the verifier for any ANN variant.
  *   - [[bucketedPairs]]: LSH-bucketed near-neighbor pairs. Buckets come
  *     from axis-aligned hyperplane signs (sign of the first `bits`
  *     coordinates) — a deterministic member of the random-hyperplane
  *     cosine-LSH family, portable across engines (no RNG). One shuffle on
  *     the bucket key; pair generation is a self-equi-join per bucket, so
  *     cost is Σ bucket² not n². AQE skew-join splits hot buckets.
  */
object Similarity {

  /** Sign-pattern bucket over the first `bits` coordinates: "1" if ≥ 0. */
  def signBucket(vec: Column, bits: Int): Column =
    array_join(transform(slice(vec, 1, bits),
      x => when(x >= 0, "1").otherwise("0")), "")

  /** All same-bucket pairs with their exact cosine, rounded to 6 dp.
    * Output: (vec_a, vec_b, cosine), vec_a < vec_b.
    */
  def bucketedPairs(df: DataFrame, idCol: String, vecCol: String,
                    bits: Int = 8): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), bits).as("bucket"))
    val a = b.select(col(idCol).as("vec_a"), col(vecCol).as("va"), col("bucket"))
    val c = b.select(col(idCol).as("vec_b"), col(vecCol).as("vb"), col("bucket"))
    a.join(c, Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(VectorOps.cosine(col("va"), col("vb")), 6).as("cosine"))
  }

  /** IVF (inverted-file) approximate top-k — the 100 TB path: a KMeans
    * coarse quantizer (nlist cells, seeded) partitions the corpus once;
    * each query scans only its `nprobe` nearest cells instead of the full
    * corpus. Centroids are a tiny broadcast dimension; the only big-side
    * work is a hash join corpus⋈(query,cell) followed by per-query top-k.
    * Recall tunes with nprobe; [[bruteForceTopK]] is the verifier.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
              seed: Long = 42L, fitSampleRows: Int = 100000,
              totalRows: Option[Long] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val withVec = corpus.withColumn("_mlvec", toVec(col(vecCol)))
    // coarse quantizer settings: random init + few iterations. IVF needs
    // roughly-balanced cells, not converged clusters — kmeans|| init plus
    // 20 iterations costs ~30 sequential jobs for no recall gain here
    // (recall comes from nprobe, verified in SimilaritySpec).
    //
    // The fit runs on a deterministic hash-sample of ~fitSampleRows rows,
    // not the full corpus: 8 KMeans iterations over 100 TB would be 8 full
    // scans just to place rough cell boundaries, and cell shape converges
    // with a bounded sample. The sample is md5(id)-thresholded
    // (Sampling.deterministicSample), so the quantizer — hence cell
    // assignment, hence results — is reproducible on any cluster layout.
    // Only the one `transform` pass below ever touches the full corpus.
    //
    // Sizing the sample fraction needs the corpus row count, which the
    // caller supplies as `totalRows` — a hint, like expectedNumItems on a
    // Bloom filter. Callers at scale pass the count they invariably already
    // have (a column-less parquet count is near-free: the scan reads row
    // counts from footer metadata, never data pages). With NO hint the
    // guard must still engage (r22, closing the r21 hole where a hint-less
    // caller silently fitted the FULL corpus — 8 KMeans passes over every
    // embedding at 100 TB): fall back to counting the corpus here, the same
    // cheap pre-scan r9–r20 always paid. The hint's value is letting the
    // caller supply a cheaper count (raw-scan metadata vs this plan), not
    // skipping the safeguard.
    val km = new KMeans().setK(nlist).setSeed(seed)
      .setInitMode("random").setMaxIter(8)
      .setFeaturesCol("_mlvec").setPredictionCol("_cell")
    val total = totalRows.getOrElse(corpus.count())
    val fitDf =
      if (total > fitSampleRows)
        graft.sampling.Sampling.deterministicSample(
          withVec, col(idCol), fitSampleRows.toDouble / total)
      else withVec
    val model = km.fit(fitDf, ParamMap(km.solver -> "row"))
    val assigned = model.transform(withVec).drop("_mlvec")
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("_cell", "_centroid")

    val probeW = Window.partitionBy(col("query_id")).orderBy(col("cdist"))
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", VectorOps.sqDist(col("qv"), col("_centroid")))
      .withColumn("prk", row_number().over(probeW))
      .filter(col("prk") <= nprobe)
      .select(col("query_id"), col("qv"), col("_cell"))

    val rankW = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    assigned
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("_cell"))
      .join(broadcast(probes), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .withColumn("rk", row_number().over(rankW))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("neighbor_id"), col("cosine"))
  }

  /** Exact cosine top-k neighbors for each row of `queries` against
    * `corpus`. Ranking is on the ROUNDED cosine with id tie-break so the
    * ordering is reproducible across engines/float-sum orders.
    * Output: (query_id, rk, neighbor_id, cosine).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(VectorOps.cosine(col("qv"), col("cv")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk").cast("long").as("rk"),
        col("neighbor_id"), col("cosine"))
  }
}
