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
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILES","250000").toLong
    run(8, 2000) // warmup
    val legs = Seq(2, 8, 2, 8).map(c => c -> run(c, n))
    val t2 = legs.filter(_._1 == 2).map(_._2).min
    val t8 = legs.filter(_._1 == 8).map(_._2).min
    println(f"SCALE efficiency_2to8=${t2/t8/4.0}%.3f")
  }
}
