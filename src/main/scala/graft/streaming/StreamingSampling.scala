package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row of the weighted input stream: one document per row. */
case class PrioInput(stratum: String, doc_id: Long, weight: Double)

/** Per-stratum sampler state: the current top-(k+1) by priority, plus the
  * emission sequence number (lets consumers and specs isolate the latest
  * emission per stratum in update-mode sinks). */
case class PrioState(rows: List[(Long, Double, Double)], seq: Long)

/** One sample row: the stratum's current k-sample with the unbiased
  * max(w, τ) estimator, stamped with the emission sequence. */
case class PrioSample(stratum: String, doc_id: Long, weight: Double,
                      priority: Double, w_est: Double, seq: Long)

/** Streaming priority sampling — the unbounded-stream form of
  * [[graft.operators.TextAnalysis.samplePriorityPerStratum]]: each stratum
  * keeps a weight-proportional-without-replacement k-sample of EVERYTHING
  * seen so far, with the Duffield–Lund–Thorup max(w, τ) estimator, in
  * O(k) state per stratum (the top-(k+1) priorities — nothing grows with
  * the stream). Priorities are CONTENT-DERIVED (the same md5-dyadic
  * construction as the batch operator, no RNG), which is what makes the
  * sampler replay-stable: reprocessing the same rows after a restart or
  * an at-least-once redelivery merges to the IDENTICAL state (merge
  * dedups by id), so the emitted sample never depends on delivery order
  * or retries — and it equals the batch operator's answer on the same
  * rows (spec-pinned parity).
  *
  * Every trigger that touches a stratum re-emits that stratum's full
  * current k-sample with a bumped `seq`; downstream consumers (and the
  * update-mode memory sink) take the max-seq emission per stratum. */
object StreamingSampling {

  /** The batch construction verbatim: u = (first 13 md5 hex chars + 0.5)
    * / 2^52, priority = w / u — every op exact in IEEE doubles. */
  private[streaming] def priority(id: Long, w: Double): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (md(i) & 0xffL); i += 1 } // 56 bits
    h = h >>> 4 // first 13 hex chars = top 52 bits of the first 7 bytes
    w / ((h.toDouble + 0.5) / 4503599627370496.0)
  }

  def run(spark: SparkSession, rows: Dataset[PrioInput], k: Int): Dataset[PrioSample] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    rows.groupByKey(_.stratum)
      .flatMapGroupsWithState[PrioState, PrioSample](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, it: Iterator[PrioInput], state: GroupState[PrioState]) =>
          val prev = state.getOption.getOrElse(PrioState(Nil, 0L))
          val incoming = it.map(r => (r.doc_id, r.weight, priority(r.doc_id, r.weight)))
          // merge, dedup by id (replay/redelivery idempotence), keep top-(k+1)
          val merged = (prev.rows ++ incoming)
            .groupBy(_._1).map(_._2.head).toList
            .sortBy(t => (-t._3, t._1))
            .take(k + 1)
          val seq = prev.seq + 1
          state.update(PrioState(merged, seq))
          val tau = if (merged.size == k + 1) Some(merged.last._3) else None
          merged.take(k).iterator.map { case (id, w, q) =>
            PrioSample(stratum, id, w, q, tau.fold(w)(t => math.max(w, t)), seq)
          }
      }
  }
}
