package graft

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: runs named SparkEntry queries back-to-back
  * with Bench's cache semantics (transient caches dropped per query, shared
  * memo chains kept for the session) so a new query's marginal suite cost
  * can be measured without a full bench run.
  *
  * Usage: runMain graft.QTime <sfDir> <query> [query ...]   (repeated twice:
  * cold then warm-shared-chain timings are both informative)
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q25_components", "q25b_components_incremental")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { rep =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"QTIME rep=$rep $name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
        SparkEntry.releaseTransientCaches()
      }
      SparkEntry.releaseSharedCaches()
    }
    spark.stop()
  }
}
