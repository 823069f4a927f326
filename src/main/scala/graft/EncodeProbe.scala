package graft

import graft.dedup.Config

/** Dev-only probe for the encode-path evidence leg: interleaved reps of the
  * broadcast-dict plan vs the forced shuffle-join plan (broadcastMaxVocab
  * clamped under the corpus vocabulary) at one parallelism level, with
  * per-stage wall breakdowns — to separate a real plan-cost difference from
  * single-shot leg variance (round 4 recorded 15.9k vs 11.8k files/s for the
  * shuffle leg across two same-code runs).
  *
  * Usage: runMain graft.EncodeProbe [nFiles] [cpus] [reps]
  */
object EncodeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(8)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    // warm up BOTH plans: the shuffle-join encode has its own codegen/JIT
    // paths, and leaving it cold would bias exactly the comparison this
    // probe exists to settle
    val shuffleCfg = Config(broadcastMaxVocab = 100000L)
    Bench.pipelineRun(cpus, math.min(n, 100000L))
    Bench.pipelineRun(cpus, math.min(n, 100000L), shuffleCfg)
    val legs = (1 to reps).flatMap { r =>
      Seq(("broadcast", Config()), ("shuffle", shuffleCfg)).map {
        case (label, cfg) =>
          val (secs, stages, _) = Bench.pipelineRun(cpus, n, cfg)
          println(f"ENCODE rep=$r path=$label%-9s secs=$secs%.1f files/sec=${n / secs}%.0f")
          stages.toSeq.sortBy(_._1).foreach { case (s, ms) =>
            println(f"  stage $s%-12s ${ms / 1000.0}%.1f s")
          }
          (label, secs)
      }
    }
    Seq("broadcast", "shuffle").foreach { label =>
      val ts = legs.filter(_._1 == label).map(_._2)
      val med = Bench.median(ts) // midpoint-averaged, same as the bench legs
      println(f"ENCODE median path=$label%-9s secs=$med%.1f files/sec=${n / med}%.0f (all: ${ts.sorted.map(t => f"$t%.1f").mkString(", ")})")
    }
  }
}
