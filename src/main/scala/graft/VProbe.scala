package graft

import graft.dedup.{Config, Ids, Vocabulary}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe: time the vocab stage's sub-steps over an existing docs
  * checkpoint (usage: runMain graft.VProbe <workDir> [cpus]). */
object VProbe {
  def main(args: Array[String]): Unit = {
    val work = args(0)
    val cpus = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"VPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$work/docs")
    time("scan-only")(docs.agg(sum(size(col("tokens")))).head())
    val agg = docs
      .select(explode(col("tokens")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    time("agg-count")(println("  vocab rows " + agg.count()))
    val reg = new graft.dedup.CacheRegistry
    val vocab = time("build-ids")(Vocabulary.build(docs, Config(), reg))
    time("materialize")(println("  ids rows " + vocab.count()))
    time("write")(vocab.write.mode("overwrite").option("compression", "zstd").parquet(s"/tmp/vprobe-out"))
    reg.release()
    spark.stop()
  }
}
