package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Detector for the broadcast-build pathology found in round 17 (PLANS
  * `quality_length_corr` note; VERDICT r17 #3): a BroadcastExchange
  * build — AQE-planned or hinted — executes its ENTIRE subtree under
  * the driver-side `SQLExecution.withThreadLocalCaptured` future, so a
  * build whose lineage embeds expensive derived columns re-runs that
  * work in ONE task (observed: 6.5 s single-threaded for 0.5 s of
  * parallel work). Such stages are named
  * `$anonfun$withThreadLocalCaptured$… at CompletableFuture.java:…`
  * (empirically verified on Spark 4.1.2 for both the AQE and hinted
  * shapes), so the tell is precisely: ONE task, above-threshold wall
  * seconds, that name. Healthy broadcast builds trip none of the three
  * (a small dim scan is milliseconds; a parallel build has > 1 task).
  *
  * The listener only RECORDS (submission-time, seconds) pairs —
  * listener-bus delivery is asynchronous, so attribution to a query
  * happens afterwards by matching each stage's submission time into the
  * caller's per-query wall-clock windows ([[attribute]]), never by a
  * mutable "current query" label a late event could mis-file. */
final class PathologyListener(thresholdSec: Double = 1.0) extends SparkListener {
  private val hits =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Double)]()

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val si = sc.stageInfo
    val dur = (for { s <- si.submissionTime; c <- si.completionTime }
      yield (c - s) / 1000.0).getOrElse(0.0)
    if (si.numTasks == 1 && dur > thresholdSec &&
        si.name.contains("withThreadLocalCaptured"))
      si.submissionTime.foreach(t => hits.add((t, dur)))
  }

  /** Raw (submissionTimeMs, seconds) hits recorded so far. */
  def stages: Seq[(Long, Double)] = {
    import scala.jdk.CollectionConverters._
    hits.iterator().asScala.toSeq
  }

  /** Fold the recorded hits into per-query flags: each hit lands in the
    * query whose [startMs, endMs] window contains its submission time
    * (`_unattributed` otherwise — a hit delivered for work outside any
    * window). A query is flagged only when it hit the detector at least
    * `minHits` times — a REAL pathology re-executes on every sweep pass
    * (Bench runs each query ≥ 2 times), while a host-contention blip
    * stretches one pass's small broadcast build past the threshold
    * exactly once (observed live: a calib-1.0 contended pass flagged
    * three 1.2-2.2 s builds that the quiet run's passes never repeat).
    * The reported seconds are the MIN across hits — the steady-state
    * magnitude, the same min-of-passes discipline as the sweep itself.
    * Sorted worst-first. */
  def attribute(windows: Seq[(String, Long, Long)],
                minHits: Int = 2): Seq[(String, Double)] =
    stages
      .map { case (t, d) =>
        windows.find(w => t >= w._2 && t <= w._3)
          .map(_._1).getOrElse("_unattributed") -> d
      }
      .groupBy(_._1).collect {
        case (k, vs) if vs.size >= minHits => k -> vs.map(_._2).min
      }
      .toSeq.sortBy(-_._2)
}
