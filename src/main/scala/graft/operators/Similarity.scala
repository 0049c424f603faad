package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float]).
  *
  * Dot products run as codegen'd `zip_with` + `aggregate` folds in DOUBLE:
  * float32→double casts are exact and the fold is strictly sequential, so
  * scores are bit-identical to any sequential-summation implementation
  * (including the DuckDB oracle).
  *
  * Scale path: brute force is O(Q·N) with the queries broadcast (no
  * shuffle of the corpus); the sign-quantization LSH variant prunes the
  * corpus to one bucket per query — a bucket-key equi-join that Spark
  * executes shuffle- or broadcast-hash depending on size, then top-k per
  * bucket.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded). The query side is broadcast. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(IntegerType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Sign-quantization LSH bucket over the first `bits` dimensions:
    * bucket = Σ 2^i · [v[i] > 0]. Cheap, deterministic, engine-neutral. */
  def signBucket(vec: Column, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(element_at(vec, i + 1) > lit(0.0f), lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** LSH-bucketed ANN: candidates restricted to the query's sign bucket,
    * then exact cosine top-k within the bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast(IntegerType).as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Embedding near-duplicate pairs: all (a<b) pairs with cosine ≥
    * threshold. Brute force at test scale; at corpus scale, restrict to
    * sign-bucket candidates first (see lshTopK). */
  def embeddingNearDupPairs(df: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("vec_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("vec_b"), col(vecCol).as("__vb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("cos"))
  }
}
