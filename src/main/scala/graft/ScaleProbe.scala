package graft

/** Dev-only scaling probe: runs the exact Bench pipeline leg (tmpfs work
  * dirs, cleanup, per-stage breakdown) at arbitrary (cpus, nFiles) pairs so
  * serial-fraction fixes can be iterated without the full bench.
  *
  * Usage: runMain graft.ScaleProbe [nFiles] [cpus cpus ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(250000L)
    val levels = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(2, 8)
    Bench.pipelineRun(8, math.min(n, 50000L)) // warmup
    val res = levels.map { c =>
      val (secs, stages, _) = Bench.pipelineRun(c, n)
      println(f"SCALE cpus=$c n=$n secs=$secs%.1f files/sec=${n / secs}%.0f")
      stages.toSeq.sortBy(_._1).foreach { case (s, ms) => println(f"  stage $s%-12s ${ms / 1000.0}%.1f s") }
      c -> secs
    }
    for (Seq((c1, t1), (c2, t2)) <- res.sliding(2)) {
      val eff = (t1 / t2) / (c2.toDouble / c1)
      println(f"EFF $c1%d->$c2%d: $eff%.3f")
    }
  }
}
