package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness (guide §1.4) — NOT part of the driver
  * contract, which times only `graft.Bench`. Subcommands:
  *
  *   setup [reps]      time each memoized shared chain individually
  *   q <name> [reps]   time one query with the noop sink (no count shortcut)
  *   explain <name> <out-file>   write .explain("formatted") for a query
  *
  * Session config mirrors Bench.session so numbers are comparable.
  */
object BenchExtra {

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[bench-extra] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args.toList match {
      case "setup" :: rest =>
        val reps = rest.headOption.map(_.toInt).getOrElse(3)
        val spark = session()
        (1 to reps).foreach { r =>
          spark.sparkContext.setJobDescription(s"setup rep $r")
          time(s"rep$r enc")(SparkEntry.encCached(spark, sfDir))
          time(s"rep$r lshVerified")(SparkEntry.lshVerifiedCached(spark, sfDir))
          time(s"rep$r exactPairs")(SparkEntry.exactPairsCached(spark, sfDir))
          time(s"rep$r winnowCand")(SparkEntry.winnowCandCached(spark, sfDir))
          time(s"rep$r components")(SparkEntry.componentsCached(spark, sfDir))
          SparkEntry.releaseTransientCaches()
          SparkEntry.releaseSharedCaches()
          spark.catalog.clearCache()
        }
        spark.stop()
      case "q" :: name :: rest =>
        val reps = rest.headOption.map(_.toInt).getOrElse(3)
        val spark = session()
        val fn = SparkEntry.queries(name)
        (1 to reps).foreach { r =>
          spark.sparkContext.setJobDescription(s"$name warm rep $r")
          time(s"rep$r warm")(SparkEntry.warmSharedCaches(spark, sfDir))
          spark.sparkContext.setJobDescription(s"$name rep $r")
          time(s"rep$r $name")(
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          )
          SparkEntry.releaseTransientCaches()
          SparkEntry.releaseSharedCaches()
          spark.catalog.clearCache()
        }
        spark.stop()
      case "pipeline" :: cpus :: nFiles :: _ =>
        val (secs, stages, _) = Bench.pipelineRun(cpus.toInt, nFiles.toLong)
        println(f"[bench-extra] pipeline local[$cpus] $nFiles files ${secs}%.1f s")
        stages.toSeq.sortBy(_._1).foreach { case (st, ms) =>
          println(f"[bench-extra]   stage $st%-12s ${ms / 1000.0}%.1f s")
        }
      // Bench-shaped leg protocol in ONE JVM (warmup per level, then
      // interleaved 2/8 pairs) with per-stage walls per leg — for decomposing
      // the per-leg fixed cost without touching the frozen Bench.
      case "legs" :: nFiles :: pairs :: _ =>
        val n = nFiles.toLong
        def leg(cpus: Int, label: String): Double = {
          val (secs, stages, _) = Bench.pipelineRun(cpus, n)
          println(f"[bench-extra] $label local[$cpus] $n files ${secs}%.1f s")
          stages.toSeq.sortBy(_._1).foreach { case (st, ms) =>
            println(f"[bench-extra]   stage $st%-12s ${ms / 1000.0}%.1f s")
          }
          secs
        }
        leg(2, "warmup"); leg(8, "warmup")
        val t2 = Seq.newBuilder[Double]; val t8 = Seq.newBuilder[Double]
        (1 to pairs.toInt).foreach { p =>
          t2 += leg(2, s"pair$p"); t8 += leg(8, s"pair$p")
        }
        val m2 = Bench.median(t2.result()); val m8 = Bench.median(t8.result())
        println(f"[bench-extra] legs median t2=${m2}%.1f t8=${m8}%.1f ratio=${m2 / m8}%.2f eff=${m2 / m8 / 4}%.3f")
      case "explain" :: names :: outDir :: suffix :: _ =>
        val spark = session()
        SparkEntry.warmSharedCaches(spark, sfDir)
        Files.createDirectories(Paths.get(outDir))
        names.split(",").foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode
          )
          val out = Paths.get(outDir, s"$name$suffix.txt")
          Files.write(out, txt.getBytes(StandardCharsets.UTF_8))
          SparkEntry.releaseTransientCaches()
          println(s"[bench-extra] wrote plan for $name to $out")
        }
        spark.stop()
      case other =>
        System.err.println(s"unknown args: $other (want: setup [reps] | q <name> [reps] | explain <name> <file>)")
        sys.exit(2)
    }
  }
}
