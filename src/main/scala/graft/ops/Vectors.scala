package graft.ops

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`,
  * north-star ExtOp).
  *
  * Two tiers:
  *  - [[cosineTopK]]: brute force — broadcast the (small) query set,
  *    scan the corpus once, per-partition cosine + global top-k. Exact;
  *    linear in corpus size; the right baseline and the correctness
  *    oracle for the approximate tier.
  *  - [[annTopK]]: LSH-bucketed approximate — random-hyperplane
  *    buckets prune the corpus so each query compares against a slice.
  *    Sub-linear; the 100 TB path. Recall vs [[cosineTopK]] is the
  *    quality gate (VectorsSpec).
  *
  * Cosine math uses higher-order functions (zip_with/aggregate) over
  * the raw arrays — no per-row JVM UDF boxing, no mllib Vector
  * conversion on the hot path.
  */
object Vectors {

  /** Sequential left-to-right double accumulation — deterministic. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact cosine top-k of every corpus vector against each query
    * vector. Queries are broadcast (dimension-sized); the corpus is
    * scanned once; the per-query rank is one window shuffle keyed by
    * query — at 1000 executors each holds corpus/1000 and the shuffle
    * moves only (qid, vec_id, cos) triples. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, id: String,
                 vec: String, k: Int): DataFrame = {
    val q = queries.select(col(id).as("qid"), col(vec).as("__qv"))
    val scored = corpus.join(broadcast(q), col(id) =!= col("qid"))
      .withColumn("__cos", cosine(col("__qv"), col(vec)))
    val w = Window.partitionBy(col("qid")).orderBy(col("__cos").desc, col(id).asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col(id))
  }

  /** Approximate NN via random-hyperplane LSH
    * (BucketedRandomProjectionLSH on L2-normalized vectors, so
    * euclidean rank == cosine rank). approxSimilarityJoin compares only
    * bucket collisions — sub-linear candidate generation; rank the
    * candidates exactly. Seeded, deterministic. */
  def annTopK(corpus: DataFrame, queries: DataFrame, id: String,
              vec: String, k: Int, bucketLength: Double = 2.0,
              numHashTables: Int = 3): DataFrame = {
    def normed(df: DataFrame, outId: String): DataFrame =
      df.select(col(id).as(outId),
        array_to_vector(transform(col(vec), x => x.cast("double") / l2norm(col(vec))))
          .as(s"__v_$outId"))
    val c = normed(corpus, "cid")
    val q = normed(queries, "qid")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__v_cid").setOutputCol("__h")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(42L)
    val model = lsh.fit(c)
    val joined = model.approxSimilarityJoin(
        c, q.withColumnRenamed("__v_qid", "__v_cid"), 2.0, "dist")
      .select(col("datasetB.qid").as("qid"), col("datasetA.cid").as("vec_id"),
        col("dist"))
      .filter(col("qid") =!= col("vec_id"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist").asc, col("vec_id").asc)
    joined.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("vec_id"))
  }
}
