package graft
import graft.dedup.{Config, CorpusGen, Pipeline}
import org.apache.spark.sql.SparkSession
object ScaleProbe {
  def run(cpus: Int, n: Long): Double = {
    val s = SparkSession.builder().master(s"local[$cpus]").appName(s"probe$cpus")
      .config("spark.sql.shuffle.partitions", (2*cpus).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory(s"probe$cpus").toString
    val t0 = System.nanoTime()
    Pipeline.run(s, CorpusGen.corpus(s, n).toDF(), Config(), work).components.count()
    val secs = (System.nanoTime()-t0)/1e9
    s.stop(); SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    println(f"SCALE cpus=$cpus n=$n secs=$secs%.1f files/sec=${n/secs}%.0f work=$work")
    n/secs
  }
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILES","250000").toLong
    run(8, 2000) // JIT warmup
    val t2 = run(2, n)
    val t8 = run(8, n)
    println(f"SCALE efficiency_2to8=${t8/t2/4.0}%.3f")
  }
}
