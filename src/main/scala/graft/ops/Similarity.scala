package graft.ops

import graft.dedup.PairGen
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One tile of the corpus for block-nested-loop similarity: `n` vectors,
  * ids sorted ascending, `data` = row-major n x dim doubles, `norms` =
  * per-vector dot(v, v). */
final case class VecBlock(bid: Long, n: Int, dim: Int, ids: Array[Long], data: Array[Double], norms: Array[Double])

/** Similarity search over an embedding column (array<float>) — the
  * similarity-search leg of a training-data pipeline.
  *
  * Three paths, one contract:
  *  - [[cosineTopKBlocked]] / [[nearDupPairsBlocked]]: EXACT all-pairs
  *    cosine as a distributed block-nested-loop "matrix multiply" — the
  *    corpus is tiled into [[VecBlock]]s, every block PAIR is one task doing
  *    a dense tile-x-tile dot-product loop (JIT-compiled primitive arrays,
  *    no per-pair row machinery). Exactness of brute force, but distributed:
  *    no driver collect, no full-corpus broadcast, task memory bounded by
  *    2 tiles. O(n^2 d) total work — the unavoidable cost of an EXACT
  *    threshold/top-k answer — spread over B^2/2 perfectly parallel tasks.
  *  - [[cosineTopK]] / [[nearDupPairs]]: naive per-pair Column-expression
  *    brute force, kept as the independent test oracle for the above.
  *  - [[lshCosineTopK]]: random-hyperplane LSH (sign-bit sketch, bucketed by
  *    bit blocks) prunes candidates before the exact re-rank — the path for
  *    corpora where even tiled O(n^2) is off the table; approximate
  *    (recall tunable via planes/blocks), measured against the exact path
  *    in the test suite.
  */
object Similarity {

  /** Tile the corpus into blocks of ~`blockSize` vectors (block = vec_id mod
    * B, ids sorted within). One count job sizes B; everything else is one
    * groupByKey shuffle of the raw vectors. */
  def toBlocks(embeddings: DataFrame, blockSize: Int): Dataset[VecBlock] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val n = embeddings.count()
    val nBlocks = math.max(1L, (n + blockSize - 1) / blockSize)
    embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .groupByKey(_._1 % nBlocks)
      .mapGroups { (bid, it) =>
        val rows = it.toArray.sortBy(_._1)
        val dim = if (rows.isEmpty) 0 else rows(0)._2.length
        val ids = new Array[Long](rows.length)
        val data = new Array[Double](rows.length * dim)
        val norms = new Array[Double](rows.length)
        var i = 0
        while (i < rows.length) {
          ids(i) = rows(i)._1
          val v = rows(i)._2
          var d = 0
          var nn = 0.0
          while (d < dim) {
            val x = v(d).toDouble
            data(i * dim + d) = x
            nn += x * x
            d += 1
          }
          norms(i) = nn
          i += 1
        }
        VecBlock(bid, rows.length, dim, ids, data, norms)
      }
  }

  /** All block pairs (bid_x <= bid_y): B^2/2 rows, each one independent
    * tile-pair task. The tiny block table is joined to itself with a
    * nested-loop join — B is small (n / blockSize), the heavy data rides
    * inside the rows. */
  private def blockPairs(blocks: Dataset[VecBlock]): Dataset[(VecBlock, VecBlock)] = {
    val spark = blocks.sparkSession
    import spark.implicits._
    blocks.as("x").joinWith(blocks.as("y"), col("x.bid") <= col("y.bid"))
  }

  private def dot(data: Array[Double], i: Int, other: Array[Double], j: Int, dim: Int): Double = {
    var s = 0.0
    var d = 0
    val oi = i * dim
    val oj = j * dim
    while (d < dim) { s += data(oi + d) * other(oj + d); d += 1 }
    s
  }

  /** Exact threshold pairs (a < b, cosine >= minCosine), block-tiled. */
  def nearDupPairsBlocked(embeddings: DataFrame, minCosine: Double, blockSize: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    blockPairs(toBlocks(embeddings, blockSize))
      .flatMap { case (x, y) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        val dim = x.dim
        var i = 0
        while (i < x.n) {
          var j = if (x.bid == y.bid) i + 1 else 0
          while (j < y.n) {
            // zero-norm vectors have no defined cosine: skip the pair
            // explicitly (NaN would fail the >= anyway, but the top-k path
            // must match — see cosineTopKBlocked)
            val c =
              if (x.norms(i) == 0.0 || y.norms(j) == 0.0) -2.0
              else dot(x.data, i, y.data, j, dim) / (math.sqrt(x.norms(i)) * math.sqrt(y.norms(j)))
            if (c >= minCosine) {
              val a = x.ids(i); val b = y.ids(j)
              out += (if (a < b) (a, b, c) else (b, a, c))
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("a", "b", "cosine")
  }

  /** Exact top-k neighbors per vector, block-tiled: each tile pair emits its
    * per-probe partial top-k (a bounded insertion list — global top-k is a
    * subset of the per-tile top-ks), then one window takes the final k. */
  def cosineTopKBlocked(embeddings: DataFrame, k: Int, blockSize: Int = 4096): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val partial = blockPairs(toBlocks(embeddings, blockSize)).flatMap { case (x, y) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
      val dim = x.dim
      // bounded top-k insertion: order by (cosine desc, neighbor asc)
      def topkInto(
          probeIds: Array[Long], probeData: Array[Double], probeNorms: Array[Double], pn: Int,
          otherIds: Array[Long], otherData: Array[Double], otherNorms: Array[Double], on: Int,
          sameBlock: Boolean
      ): Unit = {
        val bc = new Array[Double](k)
        val bi = new Array[Long](k)
        var i = 0
        while (i < pn) {
          var m = 0 // current size
          var j = 0
          while (j < on) {
            // zero-norm on either side -> no defined cosine, skip: a NaN
            // would fail every insertion comparison but the final window's
            // desc sort ranks NaN first, diverging from the naive oracle
            if (!(sameBlock && i == j) && probeNorms(i) != 0.0 && otherNorms(j) != 0.0) {
              val c = dot(probeData, i, otherData, j, dim) /
                (math.sqrt(probeNorms(i)) * math.sqrt(otherNorms(j)))
              val id = otherIds(j)
              // find insert position among m entries
              var p = m
              while (p > 0 && (bc(p - 1) < c || (bc(p - 1) == c && bi(p - 1) > id))) p -= 1
              if (p < k) {
                val last = math.min(m, k - 1)
                var q = last
                while (q > p) { bc(q) = bc(q - 1); bi(q) = bi(q - 1); q -= 1 }
                bc(p) = c; bi(p) = id
                if (m < k) m += 1
              }
            }
            j += 1
          }
          var r = 0
          while (r < m) { out += ((probeIds(i), bi(r), bc(r))); r += 1 }
          i += 1
        }
      }
      if (x.bid == y.bid)
        topkInto(x.ids, x.data, x.norms, x.n, x.ids, x.data, x.norms, x.n, sameBlock = true)
      else {
        topkInto(x.ids, x.data, x.norms, x.n, y.ids, y.data, y.norms, y.n, sameBlock = false)
        topkInto(y.ids, y.data, y.norms, y.n, x.ids, x.data, x.norms, x.n, sameBlock = false)
      }
      out
    }.toDF("vec_id", "neighbor", "cosine")
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor"))
    partial.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Cosine over two float arrays via codegen-friendly higher-order fns.
    * Summation order = array order on both sides of any comparison, so
    * results are bit-deterministic. Zero-norm inputs yield NULL (no defined
    * cosine; also ANSI mode would throw on the 0-divide) — consumers filter
    * nulls, matching the blocked paths' skip. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v
      )
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(denom === 0.0, lit(null).cast("double")).otherwise(dot(a, b) / denom)
  }

  /** Brute-force top-k neighbors per vector: symmetric pair expansion +
    * window rank. embeddings: (vec_id, embedding). */
  def cosineTopK(embeddings: DataFrame, k: Int): DataFrame = {
    val x = embeddings.select(col("vec_id").as("a"), col("embedding").as("va"))
    val y = embeddings.select(col("vec_id").as("b"), col("embedding").as("vb"))
    val pairs = x
      .join(y, col("a") < col("b"))
      .withColumn("cosine", cosine(col("va"), col("vb")))
      // zero-norm embeddings yield NaN: drop, matching the blocked path
      .filter(col("cosine").isNotNull)
      .select(col("a"), col("b"), col("cosine"))
    val sym = pairs
      .select(col("a").as("vec_id"), col("b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("b").as("vec_id"), col("a").as("neighbor"), col("cosine")))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor"))
    sym
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic gaussian hyperplane matrix (planes x dim) for `seed` —
    * public so oracles can reproduce the sketch value-for-value. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit sketch: bit i = sign(dot(v, hyperplane_i)), hyperplanes drawn
    * deterministically from `seed`. Collision probability of a bit is
    * 1 - theta/pi (Charikar '02). One compiled kernel pass — the round-4
    * version composed `planes` interpreted aggregate(zip_with(...)) columns,
    * i.e. 32 higher-order re-walks of the embedding per row outside codegen
    * ([[HyperplaneSketch]] pins dot-product order so the SQL oracle's sums
    * stay bit-identical). */
  def hyperplaneSketch(embeddings: DataFrame, dim: Int, planes: Int, seed: Long): DataFrame =
    embeddings.withColumn("sketch", HyperplaneSketch(col("embedding"), dim, planes, seed))

  /** The interpreted built-ins twin of [[hyperplaneSketch]] (test oracle for
    * the kernel's bit-exactness, including the length-mismatch null case). */
  def hyperplaneSketchBuiltins(embeddings: DataFrame, dim: Int, planes: Int, seed: Long): DataFrame = {
    val hp = hyperplanes(dim, planes, seed)
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
      seed: Long = 42L,
      reg: graft.dedup.CacheRegistry = graft.dedup.CacheRegistry.unmanaged
  ): DataFrame = {
    require(planes % blocks == 0 && planes <= 64)
    val bits = planes / blocks
    // persisted: consumed by the block-bucket pass AND both re-rank sides
    val sk = reg.persist(
      hyperplaneSketch(embeddings, dim, planes, seed)
        .select(col("vec_id").as("doc_id"), col("embedding"), col("sketch"))
    )
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
      // codegen'd kernel, bit-equal to the Column cosine (same index-ordered
      // double sums); zero-norm sides come back NaN instead of NULL — both
      // mean "no defined cosine" and both are dropped here
      .withColumn("cosine", graft.dedup.CosineFloat(col("va"), col("vb")))
      .filter(!isnan(col("cosine")))
      .select(col("a"), col("b"), col("cosine"))
    val sym = pairs
      .select(col("a").as("vec_id"), col("b").as("neighbor"), col("cosine"))
      .unionByName(pairs.select(col("b").as("vec_id"), col("a").as("neighbor"), col("cosine")))
    val w = Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor"))
    sym.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-flat approximate top-k: a coarse quantizer partitions the corpus
    * into `nCentroids` inverted lists (assignment = nearest centroid by
    * cosine), each query probes its `nProbe` nearest lists and re-ranks the
    * candidates exactly. The quadratic work drops to ~n^2 * nProbe /
    * nCentroids; recall is tunable via nProbe (measured against the exact
    * path in the test suite).
    *
    * The quantizer is DETERMINISTIC: centroids are the embeddings of the
    * `nCentroids` lowest vec_ids (one narrow filter + driver collect of a
    * few KB). A production deployment would k-means-refine them on a sample —
    * refinement changes only the centroid values, not the plan shape — but
    * fixed seeds keep the operator a pure function of its input, which is
    * what lets an ANSI-SQL oracle reproduce it value-for-value (q36).
    *
    * All cosines are evaluated in the same index-ordered shape as [[cosine]],
    * so scores are bit-identical across engines; ties break on (score desc,
    * centroid/neighbor id asc). Emitted: (vec_id, neighbor, cosine, rank).
    */
  def ivfCosineTopK(
      embeddings: DataFrame,
      k: Int,
      nCentroids: Int = 0, // 0 = adaptive: max(16, ceil(sqrt(n))) — the
      // classic IVF sizing that keeps probe-list volume ~ n^1.5 * nProbe
      nProbe: Int = 4,
      refineIters: Int = 0, // k-means refinement passes over the quantizer;
      // 0 keeps the pure-function-of-input contract the q36 oracle needs
      reg: graft.dedup.CacheRegistry = graft.dedup.CacheRegistry.unmanaged,
      // Precomputed coarse centroids (as produced by [[centroids]] at the
      // adaptive sqrt(n) size): callers that run several quantized operators
      // over ONE embeddings table pass them once, skipping this operator's
      // sizing count job and centroid collect. null = compute here
      // (identical result: the quantizer is a pure function of the input).
      knownCentroids: Array[(Long, Array[Double])] = null
  ): DataFrame = {
    val base: Array[(Long, Array[Double])] =
      if (knownCentroids != null) knownCentroids
      else {
        val nc =
          if (nCentroids > 0) nCentroids
          else math.max(16, math.ceil(math.sqrt(embeddings.count().toDouble)).toInt)
        centroids(embeddings, nc)
      }
    val cents: Array[(Long, Array[Double])] =
      refineCentroids(embeddings, base, refineIters)
    val spark = embeddings.sparkSession
    val bCents = spark.sparkContext.broadcast(cents)
    val np = nProbe
    // top-nProbe centroid ids per vector, ordered (score desc, cid asc) —
    // one tight loop over the broadcast matrix; cosine accumulation is the
    // same index-ordered shape as CosineKernel / the SQL oracle, so the
    // selected lists match the oracle's ranking bitwise. A 100-plus-wide
    // Column expression here blew past whole-stage codegen limits.
    val probesUdf = udf { (emb: Seq[Float]) =>
      val cs = bCents.value
      val scores = new Array[Double](cs.length)
      var j = 0
      while (j < cs.length) {
        val c = cs(j)._2
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < c.length) {
          val x = emb(i).toDouble
          val y = c(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        scores(j) = dot / (math.sqrt(na) * math.sqrt(nb))
        j += 1
      }
      // selection sort of the top np indexes by (score desc, cid asc) —
      // cs is cid-ascending, so index order is cid order; NaN (zero-norm)
      // scores lose every comparison and such vectors probe nothing
      val sel = Array.newBuilder[Int]
      val used = new Array[Boolean](cs.length)
      var r = 0
      while (r < math.min(np, cs.length)) {
        var best = -1
        var jj = 0
        while (jj < cs.length) {
          if (!used(jj) && scores(jj) == scores(jj) &&
            (best == -1 || scores(jj) > scores(best))) best = jj
          jj += 1
        }
        if (best == -1) r = cs.length // only NaNs left
        else { used(best) = true; sel += cs(best)._1.toInt; r += 1 }
      }
      sel.result()
    }
    val ranked = reg.persist(
      // consumed twice (assignment + probes) inside the returned lazy plan;
      // cache lifetime is caller-owned via `reg` (the bench/verify drivers
      // release after materializing each query)
      embeddings
        .select(col("vec_id"), col("embedding"), probesUdf(col("embedding")).as("probes"))
        .filter(size(col("probes")) > 0)
    )
    val assignment = ranked.select(
      col("vec_id"),
      col("embedding"),
      col("probes").getItem(0).as("cid") // nearest centroid = list membership
    )
    val probes = ranked.select(
      col("vec_id"),
      col("embedding").as("q_embedding"),
      explode(col("probes")).as("cid")
    )
    // candidates: query x members of its probed lists (self excluded);
    // (vec_id, neighbor) is structurally unique — each neighbor lives in
    // exactly one inverted list — so no dedup shuffle is needed. Exact
    // re-rank through the codegen'd kernel (bit-equal to Column cosine).
    val members = assignment.select(col("cid"), col("vec_id").as("neighbor"), col("embedding").as("n_embedding"))
    probes
      .join(members, "cid")
      .filter(col("vec_id") =!= col("neighbor"))
      .select(
        col("vec_id"),
        col("neighbor"),
        graft.dedup.CosineFloat(col("q_embedding"), col("n_embedding")).as("cosine")
      )
      .filter(!isnan(col("cosine")))
      .withColumn(
        "rank",
        row_number().over(Window.partitionBy(col("vec_id")).orderBy(desc("cosine"), asc("neighbor")))
      )
      .filter(col("rank") <= k)
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540): partition the
    * embedding space with a coarse quantizer, then mark within-cluster
    * semantic duplicates at a cosine threshold — the sub-quadratic semantic
    * dedup used on web-scale LLM corpora. Quadratic work happens only WITHIN
    * clusters (~n^1.5 total at the adaptive sqrt(n) centroid count), and the
    * cluster self-join is an equi-join on cid that shuffles each cluster to
    * one task — the same scale shape as the paper's per-cluster pass.
    *
    * Determinism contract matches [[ivfCosineTopK]]: centroids are the
    * `nCentroids` lowest vec_ids ([[refineCentroids]] would change values,
    * not plan shape), assignment ties break toward the lowest centroid id,
    * and the keep rule is "a vector is removed iff a LOWER-vec_id member of
    * its cluster is within `minCosine`" — the paper keeps one example per
    * epsilon-neighborhood; lowest-id is the deterministic representative an
    * ANSI oracle can reproduce value-for-value (q37).
    *
    * Emits (vec_id, cid, kept) for every vector with a non-degenerate
    * embedding (zero-norm vectors have no nearest centroid, as in q36).
    */
  def semDedup(
      embeddings: DataFrame,
      minCosine: Double,
      nCentroids: Int = 0,
      reg: graft.dedup.CacheRegistry = graft.dedup.CacheRegistry.unmanaged,
      // precomputed quantizer — same contract as [[ivfCosineTopK]]'s param
      knownCentroids: Array[(Long, Array[Double])] = null
  ): DataFrame = {
    val cents =
      if (knownCentroids != null) knownCentroids
      else {
        val nc =
          if (nCentroids > 0) nCentroids
          else math.max(16, math.ceil(math.sqrt(embeddings.count().toDouble)).toInt)
        centroids(embeddings, nc)
      }
    val spark = embeddings.sparkSession
    val bCents = spark.sparkContext.broadcast(cents)
    val nearestUdf = udf { (emb: Seq[Float]) =>
      val cs = bCents.value
      var best = -1L
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < cs.length) {
        val c = cs(j)._2
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < c.length) {
          val x = emb(i).toDouble; val y = c(i)
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val s = dot / (math.sqrt(na) * math.sqrt(nb))
        // strict > over the cid-ascending broadcast = ties keep lowest cid,
        // the SQL oracle's (score DESC, cid) ordering; NaN loses every
        // comparison so zero-norm vectors stay unassigned (best = -1)
        if (s == s && s > bestScore) { bestScore = s; best = cs(j)._1 }
        j += 1
      }
      best
    }
    val assigned = reg.persist(
      embeddings
        .select(col("vec_id"), col("embedding"), nearestUdf(col("embedding")).as("cid"))
        .filter(col("cid") >= 0)
    )
    val leftM = assigned.select(col("cid"), col("vec_id").as("a"), col("embedding").as("va"))
    val rightM = assigned.select(col("cid"), col("vec_id").as("b"), col("embedding").as("vb"))
    val removed = leftM
      .join(rightM, "cid")
      .filter(col("a") < col("b"))
      .select(col("b").as("vec_id"), graft.dedup.CosineFloat(col("va"), col("vb")).as("cosine"))
      .filter(!isnan(col("cosine")) && col("cosine") >= minCosine)
      .select("vec_id")
      .distinct()
    assigned
      .join(removed.withColumn("rm", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"), col("rm").isNull.as("kept"))
  }

  /** Lloyd k-means refinement of the coarse quantizer: assign every vector
    * to its nearest current centroid by cosine (broadcast matrix, one
    * narrow pass), recompute each centroid as its cluster's per-dimension
    * mean (distributed posexplode + avg — no driver pass over the corpus),
    * repeat. Centroid ids keep their slot; a cluster that loses all members
    * keeps its previous centroid (classic empty-cluster rule). The
    * per-dimension mean is a float aggregate whose summation order Spark
    * does not fix, so REFINED quantizers trade bitwise run-to-run
    * determinism for tighter lists — which is why the oracle-checked q36
    * path runs refineIters=0 and the refinement sits behind the flag
    * (recall-vs-exact measured in OpsSpec). */
  def refineCentroids(
      embeddings: DataFrame,
      initial: Array[(Long, Array[Double])],
      iters: Int
  ): Array[(Long, Array[Double])] = {
    if (iters <= 0 || initial.isEmpty) return initial
    val spark = embeddings.sparkSession
    var cents = initial
    var it = 0
    while (it < iters) {
      val bCents = spark.sparkContext.broadcast(cents)
      val nearestUdf = udf { (emb: Seq[Float]) =>
        val cs = bCents.value
        var best = -1L
        var bestScore = Double.NegativeInfinity
        var j = 0
        while (j < cs.length) {
          val c = cs(j)._2
          var dot = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < c.length) {
            val x = emb(i).toDouble; val y = c(i)
            dot += x * y; na += x * x; nb += y * y
            i += 1
          }
          val s = dot / (math.sqrt(na) * math.sqrt(nb))
          if (s == s && s > bestScore) { bestScore = s; best = cs(j)._1 }
          j += 1
        }
        best
      }
      val means = embeddings
        .select(nearestUdf(col("embedding")).as("cid"), col("embedding"))
        .filter(col("cid") >= 0)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          val dim = rows.length
          val arr = new Array[Double](dim)
          rows.foreach(r => arr(r.getInt(1)) = r.getDouble(2))
          cid -> arr
        }
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      it += 1
    }
    cents
  }

  /** The deterministic coarse centroids: embeddings of the `n` LOWEST
    * vec_ids, as doubles (public so the SQL oracle can embed them).
    * orderBy + limit, not `vec_id < n` — with sparse or non-zero-based ids
    * the filter form silently under-collects (ADVICE round 3). */
  def centroids(embeddings: DataFrame, n: Int): Array[(Long, Array[Double])] =
    embeddings
      .select(col("vec_id").cast("long"), col("embedding"))
      .orderBy(col("vec_id"))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)

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

/** Static kernel for the sign-bit hyperplane sketch. Semantics are EXACTLY
  * the interpreted aggregate(zip_with(cast-to-double multiply)) chain it
  * replaced: index-ordered left-to-right double sums (so the SQL oracle's
  * list_sum reproduces every dot product bit-for-bit), bit p set iff
  * d >= 0 (NaN and the zip_with length-mismatch null both leave it clear).
  * A null ELEMENT nulls every plane's zip_with sum in the twin, clearing
  * every bit — reproduced here as an early 0L (getFloat would NPE on
  * GenericArrayData or read the zeroed slot on UnsafeArrayData). */
object SketchKernel {
  def eval(emb: org.apache.spark.sql.catalyst.util.ArrayData, hp: Array[Array[Double]]): Long = {
    var i0 = 0
    val n0 = emb.numElements()
    while (i0 < n0) { if (emb.isNullAt(i0)) return 0L; i0 += 1 }
    var out = 0L
    var p = 0
    while (p < hp.length) {
      val plane = hp(p)
      if (emb.numElements() == plane.length) {
        var d = 0.0
        var i = 0
        while (i < plane.length) { d += emb.getFloat(i).toDouble * plane(i); i += 1 }
        if (d >= 0) out |= (1L << p)
      }
      p += 1
    }
    out
  }
}

/** Codegen'd hyperplane sketch over array<float> — see [[SketchKernel]].
  * The (dim, planes, seed) parameters regenerate the gaussian matrix
  * deterministically per executor (primitive params keep Catalyst's
  * expression equality semantics intact). */
case class HyperplaneSketch(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    dim: Int,
    planes: Int,
    seed: Long
) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  @transient private lazy val hp: Array[Array[Double]] =
    Similarity.hyperplanes(dim, planes, seed)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_sketch expects array<float>, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(e: Any): Any =
    SketchKernel.eval(e.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], hp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hpRef = ctx.addReferenceObj("hp", hp, "double[][]")
    nullSafeCodeGen(ctx, ev, e => s"${ev.value} = graft.ops.SketchKernel.eval($e, $hpRef);")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): HyperplaneSketch =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sketch"
}

object HyperplaneSketch {
  def apply(c: Column, dim: Int, planes: Int, seed: Long): Column =
    org.apache.spark.sql.GraftBridge.column(
      HyperplaneSketch(org.apache.spark.sql.GraftBridge.expression(c), dim, planes, seed))
}
