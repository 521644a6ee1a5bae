package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (Array[Float]) — brute-force
  * cosine top-k as the exact baseline and a random-hyperplane-LSH bucketed
  * variant as the 100 TB scale path.
  *
  * Determinism/portability: the dot product is a *sequential left fold* in
  * index order (Spark `aggregate` over `zip_with`; DuckDB `list_reduce`),
  * products are float×float exact in double, so the oracle matches
  * bit-for-bit. The LSH hyperplanes are small-integer-valued (pure function
  * of (plane, dim)), so bucket assignment is exact in both engines.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns (exact). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force top-k cosine neighbors for a (small) query id set:
    * broadcast the queries, cross-score against the corpus, keep the k best
    * per query. The per-query candidate set is ranked with a window over
    * the tiny query-id partitioning (bounded by |queries| × |corpus| rows
    * pre-filter; at scale the LSH variant below prunes candidates first).
    */
  def cosineTopK(df: DataFrame, vecCol: String, idCol: String,
                 queryIds: Seq[Long], k: Int): DataFrame = {
    // precompute each side's norm once: inlining cosine() would evaluate
    // three 64-dim folds per comparison and triple the expression tree
    val corpus = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("_nv"))
    val queries = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"), col("_nv").as("_qn"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos", dot(col("_qv"), col(vecCol)) / (col("_qn") * col("_nv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("cos"), asc(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic small-integer hyperplane component for (plane, dim):
    * values in {-3..3}, exact in any engine.
    */
  def planeComponent(p: Int, j: Column): Column =
    pmod(lit(p * 31) + j * 17, lit(7)) - lit(3)

  /** Random-hyperplane LSH bucket id: one sign bit per plane over the
    * integer-valued hyperplanes — the scale path: equal-bucket join
    * replaces the quadratic cross join.
    */
  def lshBucket(vec: Column, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, transform(sequence(lit(0), size(vec) - 1),
          j => planeComponent(p, j).cast("double")),
          (x, h) => x.cast("double") * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1 << p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) top-k: coarse-quantize every vector to its nearest
    * centroid, probe only the query's `nProbe` closest centroid buckets,
    * then exact cosine within the probed buckets — the classic
    * IVF-Flat scale path (bucket equi-join replaces the full cross join;
    * candidate count drops by ~nCentroids/nProbe).
    *
    * Centroids are the vectors with the `nCentroids` smallest ids —
    * deterministic, broadcast-joined (a tiny dim table), no training step.
    * Results are a recall<1 approximation of `cosineTopK` by construction;
    * the OperatorSpec gate asserts recall against brute force.
    */
  def ivfTopK(df: DataFrame, vecCol: String, idCol: String,
              queryIds: Seq[Long], k: Int,
              nCentroids: Int = 8, nProbe: Int = 2): DataFrame = {
    // norms precomputed once per side (see cosineTopK)
    val base = df.select(col(idCol), col(vecCol), norm(col(vecCol)).as("_nv"))
    val cents = base.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cent_id"), col(vecCol).as("_cv"), col("_nv").as("_cn"))
    // assignment: best centroid per vector (broadcast cross + window rank 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(desc("_ccos"), asc("cent_id"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("_ccos", dot(col(vecCol), col("_cv")) / (col("_nv") * col("_cn")))
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1)
      .select(col(idCol), col(vecCol), col("_nv"), col("cent_id"))
    // queries probe their nProbe nearest centroids
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("_qcos"), asc("cent_id"))
    val probes = base.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("_qv"), col("_nv").as("_qn"))
      .crossJoin(broadcast(cents))
      .withColumn("_qcos", dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn")))
      .withColumn("_r", row_number().over(wq)).filter(col("_r") <= nProbe)
      .select(col("query_id"), col("_qv"), col("_qn"), col("cent_id"))
    // exact search within probed buckets only
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("cos"), asc(idCol))
    assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos", dot(col("_qv"), col(vecCol)) / (col("_qn") * col("_nv")))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"), col("rank"))
  }

  /** Bucketed approximate near-duplicate pairs: same LSH bucket, then exact
    * cosine confirmation (id_a < id_b, cosine >= threshold).
    */
  def annPairs(df: DataFrame, vecCol: String, idCol: String,
               nPlanes: Int = 8, threshold: Double = 0.9): DataFrame = {
    val bucketed = df.select(col(idCol), col(vecCol),
        norm(col(vecCol)).as("_nv"))
      .withColumn("bucket", lshBucket(col(vecCol), nPlanes))
    val l = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("_va"), col("_nv").as("_na"))
    val r = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"), col("_nv").as("_nb"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "bucket", "cos")
  }
}
