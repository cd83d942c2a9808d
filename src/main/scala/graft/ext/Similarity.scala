package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`/`array<double>`).
  *
  * Two tiers:
  *  - `bruteForceTopK` — exact cosine top-k via a broadcast of the (small)
  *    query set against the full corpus: one scan of the corpus, ranked with
  *    a window per query. The baseline and the oracle-checkable tier.
  *  - `lshTopK` — random-hyperplane LSH bucketing: corpus and queries are
  *    both bucketed (one cheap signature scan each), candidates come from a
  *    bucket equi-join, then exact re-ranking. At 100 TB the bucket join
  *    replaces the corpus-sized cross product with |corpus|·L rows shuffled
  *    on short keys.
  */
object Similarity {

  /** Cosine via the native codegen expression (graft.exprs.catalyst) —
    * registered on the frame's session, bit-identical to the kernel/HOF
    * forms. */
  private def nativeCosine(df: DataFrame)(a: Column, b: Column): Column = {
    graft.exprs.catalyst.GraftFunctions.register(df.sparkSession)
    call_function(graft.exprs.catalyst.GraftFunctions.CosineName, a, b)
  }

  /** Sequential-order dot product of two numeric array columns (folds left,
    * same order as a scalar loop — reproducible across engines). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n)
  }

  /** Deterministic pseudo-random hyperplane components, seeded. */
  private def randUnit(seed: Long, planes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id from `planes` random hyperplanes: bit i = sign(v·rᵢ).
    * Same seed ⇒ same buckets on every executor and across jobs. */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int, seed: Long = 42L): Column = {
    val hps = randUnit(seed, planes, dim)
    hps.zipWithIndex.map { case (hp, i) =>
      val r = array(hp.map(lit): _*)
      when(dot(v, r) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduceLeft(_ + _)
  }

  /** Exact top-k cosine neighbors for every row of `queries` against
    * `corpus`. Queries are broadcast (they must be small — typically a probe
    * set); the corpus is scanned once. Deterministic ranking: cosine desc,
    * then corpus id asc. Self-matches (same id) are excluded. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", nativeCosine(corpus)(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed ANN: candidates share at least one of `tables` hyperplane
    * sign-buckets; candidates are re-ranked by exact cosine. Recall is
    * tunable via (planes, tables); the shape is the IVF/LSH standard for
    * billion-vector corpora. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 8, tables: Int = 4,
              dim: Int = 64, seed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, vecName: String, idName: String): DataFrame = {
      val withBuckets = df.select(col(idCol).as(idName), col(vecCol).as(vecName))
        .withColumn("buckets",
          Kernels.hyperplaneBucketsKernel(planes, tables, dim, seed)(col(vecName)))
      withBuckets.select(col(idName), col(vecName),
        posexplode(col("buckets")).as(Seq("table", "bucket")))
    }
    val q = bucketed(broadcast(queries), "q_vec", "query_id")
    val c = bucketed(corpus, "c_vec", "neighbor_id")
    val candidates = q.join(c, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "q_vec", "neighbor_id", "c_vec").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    candidates.withColumn("cos", nativeCosine(corpus)(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
