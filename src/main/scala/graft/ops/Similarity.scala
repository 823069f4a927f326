package graft.ops

import graft.dedup.PairGen
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>) — the similarity-search leg of a training-data pipeline.
  *
  * Two paths, same contract:
  *  - [[cosineTopK]]: brute-force all-pairs cosine — the exactness baseline.
  *    O(n^2 d); correct at test scale, the oracle for the scale path.
  *  - [[lshCosineTopK]]: random-hyperplane LSH (sign-bit sketch of the
  *    embedding, bucketed by bit blocks) prunes the candidate set before the
  *    exact cosine re-rank — the 100 TB path. Recall is tunable via
  *    (planes, blocks); candidates within a bucket reuse the skew-capped
  *    pair generator of the dedup engine.
  */
object Similarity {

  /** Cosine over two float arrays via codegen-friendly higher-order fns.
    * Summation order = array order on both sides of any comparison, so
    * results are bit-deterministic. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v
      )
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force top-k neighbors per vector: symmetric pair expansion +
    * window rank. embeddings: (vec_id, embedding). */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val x = embeddings.select(col("vec_id").as("a"), col("embedding").as("va"))
    val y = embeddings.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val pairs = x
      .join(y, col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .select(col("a"), col("b"), col("cosine"))
    val sym = pairs
      .select(col("a").as("vec_id"), col("b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("b").as("vec_id"), col("a").as("neighbor"), col("cosine")))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor"))
    sym
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sign-bit sketch: bit i = sign(dot(v, hyperplane_i)), hyperplanes drawn
    * deterministically from `seed`. Collision probability of a bit is
    * 1 - theta/pi (Charikar '02). */
  def hyperplaneSketch(embeddings: DataFrame, dim: Int, planes: Int, seed: Long): DataFrame = {
    val rnd = new java.util.Random(seed)
    // gaussian hyperplanes, materialized as literal arrays (planes x dim)
    val hp = Array.fill(planes, dim)(rnd.nextGaussian())
    val sketch = (0 until planes)
      .map { p =>
        val plane = lit(hp(p))
        val d = aggregate(
          zip_with(col("embedding"), plane, (x, h) => x.cast("double") * h),
          lit(0.0),
          (acc, v) => acc + v
        )
        when(d >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      .reduce(_.bitwiseOR(_))
    embeddings.withColumn("sketch", sketch)
  }

  /** LSH-pruned top-k: bucket on `blocks` disjoint bit blocks of the sketch,
    * candidates = co-bucketed pairs, exact cosine re-rank. */
  def lshCosineTopK(
      embeddings: DataFrame,
      k: Int,
      dim: Int,
      planes: Int = 32,
      blocks: Int = 4,
      maxBucket: Int = 2000,
      seed: Long = 42L
  ): DataFrame = {
    require(planes % blocks == 0 && planes <= 64)
    val bits = planes / blocks
    val sk = hyperplaneSketch(embeddings, dim, planes, seed)
      .select(col("vec_id").as("doc_id"), col("embedding"), col("sketch"))
    val blockCols = array((0 until blocks).map { b =>
      shiftrightunsigned(col("sketch"), b * bits).bitwiseAND(lit((1L << bits) - 1))
    }: _*)
    val rows = sk
      .select(col("doc_id"), posexplode(blockCols).as(Seq("block", "block_val")))
      .withColumn("group", lit("all"))
    val cand = PairGen.pairsFromBuckets(rows, Seq("group", "block", "block_val"), maxBucket)
    val va = sk.select(col("doc_id").as("a"), col("embedding").as("va"))
    val vb = sk.select(col("doc_id").as("b"), col("embedding").as("vb"))
    val pairs = cand
      .join(va, "a")
      .join(vb, "b")
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .select(col("a"), col("b"), col("cosine"))
    val sym = pairs
      .select(col("a").as("vec_id"), col("b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("b").as("vec_id"), col("a").as("neighbor"), col("cosine")))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor"))
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs at a cosine threshold (brute force). */
  def nearDupPairs(embeddings: DataFrame, minCosine: Double): DataFrame = {
    val x = embeddings.select(col("vec_id").as("a"), col("embedding").as("va"))
    val y = embeddings.select(col("vec_id").as("b"), col("embedding").as("vb"))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      .filter(col("cosine") >= minCosine)
      .select(col("a"), col("b"), col("cosine"))
  }
}
