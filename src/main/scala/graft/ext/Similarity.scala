package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftColumns

import graft.queries.Num.{r => rnd}

/** Similarity search over an embedding column (north-star ops):
  * brute-force cosine top-k as the exact baseline, and a sign-bucket
  * (hyperplane-quantized) ANN variant as the scale path.
  *
  * Float discipline for oracle parity: elementwise products stay float32
  * (both engines multiply FLOAT*FLOAT), accumulation is sequential into
  * DOUBLE, and the final cosine is rounded — so Spark and DuckDB agree
  * bit-for-bit.
  *
  * Scale: brute force is a broadcast of the query vector over a narrow
  * scan — fine for one query over any corpus size, O(n*d). The bucketed
  * variant prunes to one bucket (2^8 cells from the first 8 dims' signs):
  * at 100 TB the bucket id becomes the partition/bucketBy key so a query
  * touches ~1/256th of the data; IVF-style coarse centroids would replace
  * the sign quantizer without changing the plan shape.
  */
object Similarity {

  /** Sequential dot product; the declarative (CodegenFallback) form, kept
    * as the semantic reference for the codegen'd kernel below.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def normHof(a: Column): Column = sqrt(dotHof(a, a))

  /** Interpreted reference implementation — bit-identical to `cosine`
    * (VecMathSpec asserts it); ~100x slower per row, never in a hot path.
    */
  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  /** Native single-pass cosine (dot + both norms in one generated loop). */
  def cosine(a: Column, b: Column): Column = GraftColumns.cosineSimilarity(a, b)

  /** Sign bucket over the first `bits` dimensions: bit d set when
    * element d+1 > 0 (strict, matching SQL `> 0`).
    */
  def signBucket(vec: Column, bits: Int = 8): Column =
    GraftColumns.signBucket(vec, bits)

  /** Exact top-k by cosine against the query row's vector; deterministic
    * ties via (rounded cosine desc, vec_id asc).
    */
  def bruteForceTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = embeddings
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"))
    embeddings
      .join(broadcast(q))
      .filter(col("vec_id") =!= queryVecId)
      .select(
        col("vec_id"), col("label"),
        rnd(cosine(col("embedding"), col("qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** ANN: same query, but only candidates in the query's sign bucket. */
  def bucketedTopK(embeddings: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val withBucket = embeddings.withColumn("bucket", signBucket(col("embedding")))
    val q = withBucket
      .filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qvec"), col("bucket"))
    withBucket
      .join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= queryVecId)
      .select(
        col("vec_id"), col("bucket"),
        rnd(cosine(col("embedding"), col("qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding near-duplicate pairs: bucket-join then cosine >= threshold
    * (vec1 < vec2; cosine rounded 6). The bucket prune is what makes this
    * viable at scale — all-pairs would be O(n^2).
    */
  def nearDupPairs(embeddings: DataFrame, minCos: Double): DataFrame = {
    val b = embeddings.withColumn("bucket", signBucket(col("embedding")))
    val l = b.select(col("bucket"), col("vec_id").as("vec1"), col("embedding").as("e1"))
    val r = b.select(col("bucket"), col("vec_id").as("vec2"), col("embedding").as("e2"))
    l.join(r, Seq("bucket"))
      .filter(col("vec1") < col("vec2"))
      .select(col("vec1"), col("vec2"),
        rnd(cosine(col("e1"), col("e2")), 6).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
