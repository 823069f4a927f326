package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over the verified-pair graph via alternating
  * large-star / small-star (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14) — O(log n) rounds of pure DataFrame
  * joins/aggregations, no GraphX, no driver-side state beyond the
  * convergence checksum.
  *
  * The reference has no clustering stage; BASELINE.json north_star requires
  * it ("clustered via iterative connected-components (large-star/small-star)
  * in DataFrames"). Cluster id = min doc_id of the component, matching a
  * union-find over the same pair set (asserted by the test suite).
  *
  * Each round persists its edge set and cuts lineage with localCheckpoint —
  * without it the plan doubles every iteration and the driver OOMs on plan
  * size long before data size matters.
  */
object Components {

  val MaxIterations = 50

  /** large-star: connect every strictly-larger neighbor of u to min(N(u) u {u}). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mins = sym.groupBy("src").agg(least(min(col("dst")), first(col("src"))).as("m"))
    sym
      .join(mins, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** small-star: connect every smaller-or-equal neighbor of u to the min. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val sym = edges
      .select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst")
      )
      .filter(col("src") =!= col("dst"))
      .distinct()
    val mins = sym.groupBy("src").agg(min(col("dst")).as("m"))
    val relinked = sym
      .join(mins, "src")
      .select(col("dst").as("node"), col("m"))
      .filter(col("node") =!= col("m"))
      .select(col("node").as("src"), col("m").as("dst"))
    val starCenters = mins.select(col("src"), col("m").as("dst"))
    relinked.unionByName(starCenters).filter(col("src") =!= col("dst")).distinct()
  }

  private def checksum(edges: DataFrame): (Long, Long) = {
    val r = edges
      .agg(count(lit(1)).as("n"), coalesce(sum(hash(col("src"), col("dst")).cast("long")), lit(0L)).as("h"))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  /** Edge sets below this collapse on the driver: a union-find over a few
    * million longs beats dozens of near-empty distributed rounds by orders of
    * magnitude, and the dedup edge set is typically tiny next to the corpus.
    * Above it, the O(log n) star-contraction runs distributed. */
  val DriverLocalMaxEdges = 5000000L

  /** pairs: any DataFrame with (a, b) doc-id edge columns.
    * Returns assignments (doc_id, cluster_id) for every node in the graph.
    */
  def run(pairs: DataFrame, driverLocalMaxEdges: Long = DriverLocalMaxEdges): DataFrame = {
    var edges = pairs
      .select(col("a").as("src"), col("b").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = edges.count() // materializes the cache; path decision

    if (nEdges <= driverLocalMaxEdges) {
      val collected = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      edges.unpersist()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      collected.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = collected.flatMap(e => Seq(e._1, e._2)).distinct
      val spark0 = pairs.sparkSession
      import spark0.implicits._
      // parallelize with explicit slicing, NOT toDF: a LocalRelation ships
      // the whole node->cluster map inside one task (round 1 logged 12 MB
      // tasks); ParallelCollectionRDD serializes only each task's slice.
      val assignments = nodes.map(n => (n, find(n)))
      // ~20k rows/slice keeps serialized task size well under Spark's
      // 1000 KiB advisory (50k sliced at ~1.2 MB and warned every bench run)
      val slices = math.max(
        spark0.sparkContext.defaultParallelism,
        (assignments.length / 20000) + 1
      )
      return spark0.sparkContext
        .parallelize(assignments.toIndexedSeq, slices)
        .toDF("doc_id", "cluster_id")
    }

    // Size the loop's shuffle parallelism to the EDGE data, not the session
    // default: the edge set is orders of magnitude smaller than the corpus,
    // and star-contraction rounds are join/agg chains of tiny tasks whose
    // scheduling overhead otherwise dominates (and grows with cores).
    val spark = edges.sparkSession
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions")
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism * 2,
      (nEdges / 500000L).toInt + 1
    ))

    var prev = checksum(edges) // one pass over the already-cached edge set
    var converged = false
    var iter = 0
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      while (!converged && iter < MaxIterations) {
        // LAZY localCheckpoint: the checksum action below materializes the
        // checkpoint AND folds the convergence aggregate into the same job —
        // one job per round instead of round-2's materialize + checksum pair
        val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
        val cur = checksum(next)
        converged = cur == prev
        prev = cur
        edges.unpersist()
        edges = next
        iter += 1
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", sessionParts)
    // After convergence edges form stars: (node -> componentMin).
    val assign = edges.select(col("src").as("doc_id"), col("dst").as("cluster_id"))
    val roots = edges.select(col("dst").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
    assign.unionByName(roots).distinct()
  }

  /** Assignments for the full doc set: singletons cluster to themselves. */
  def assignAll(
      docs: DataFrame,
      pairs: DataFrame,
      driverLocalMaxEdges: Long = DriverLocalMaxEdges
  ): DataFrame = {
    val cc = run(pairs, driverLocalMaxEdges)
    docs
      .select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }
}
