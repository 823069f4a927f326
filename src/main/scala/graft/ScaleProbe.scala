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
    println(f"SCALE cpus=$cpus n=$n secs=$secs%.1f files/sec=${n/secs}%.0f")
    secs
  }
  def main(args: Array[String]): Unit = {
    run(8, 2000)
    run(8, 250000)
    run(2, 250000)
  }
}
