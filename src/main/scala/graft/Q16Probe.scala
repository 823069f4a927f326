package graft

import graft.dedup.{Ids, IntersectCountSorted, Tokenize}
import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only sub-chain profiler for q16 (3-gram Jaccard at t=0.2): times the
  * gram explode, ranking, set build, prefix join and verify separately. */
object Q16Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"Q16PROBE $label%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val ws = TextAnalysis.words(col("text"))
    val grams = d.select(col("doc_id"), col("lang"), explode(array_distinct(Tokenize.shingles(ws, 3))).as("gram"))
    val gdf = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    time("gdf-count")(println("  grams distinct: " + gdf.count()))
    val ranked = time("rank")(Ids.assignDense(gdf, Seq("df", "gram"), "eid"))
    val nSing = time("singletons")(ranked.filter(col("df") < 2).count())
    println(s"  singletons: $nSing")
    val pe = grams.join(ranked.select(col("gram"), col("eid").cast("int").as("eid")), "gram")
    val sets = time("sets") {
      val s = pe.groupBy("doc_id", "lang").agg(sort_array(collect_list(col("eid"))).as("ts"))
        .withColumn("n", size(col("ts")))
        .persist()
      println("  docs with sets: " + s.count()); s
    }
    val minSim = 0.2
    val prefLen = (col("n") - ceil(lit(minSim) * col("n") - lit(1e-9)) + lit(1)).cast("int")
    val pref = sets
      .select(col("lang"), col("doc_id"), col("n"), posexplode(slice(col("ts"), lit(1), prefLen)).as(Seq("p", "eid")))
      .filter(col("eid") >= nSing)
    time("pref-rows")(println("  pref rows: " + pref.count()))
    val alpha = ceil(lit(minSim) / (lit(1.0) + lit(minSim)) * (col("na") + col("nb")) - lit(1e-9))
    val cand = pref
      .select(col("lang"), col("eid"), col("doc_id").as("a"), col("n").as("na"), col("p").as("pa"))
      .join(pref.select(col("lang"), col("eid"), col("doc_id").as("b"), col("n").as("nb"), col("p").as("pb")), Seq("lang", "eid"))
      .filter(col("a") < col("b"))
      .filter(least(col("pa"), col("pb")) + lit(1) + least(col("na") - col("pa") - lit(1), col("nb") - col("pb") - lit(1)) >= alpha)
      .select(col("lang"), col("a"), col("b"))
      .distinct()
    val candP = time("cand-join") { val c = cand.persist(); println("  candidates: " + c.count()); c }
    val sa = sets.select(col("doc_id").as("a"), col("ts").as("ts_a"), col("n").as("na"))
    val sb = sets.select(col("doc_id").as("b"), col("ts").as("ts_b"), col("n").as("nb"))
    time("verify") {
      val v = candP.join(sa, "a").join(sb, "b")
        .withColumn("inter_cnt", IntersectCountSorted(col("ts_a"), col("ts_b")).cast("long"))
        .withColumn("sim", col("inter_cnt").cast("double") / ((col("na") + col("nb")).cast("long") - col("inter_cnt")))
        .filter(col("sim") >= minSim)
      println("  verified: " + v.count())
    }
    spark.stop()
  }
}
