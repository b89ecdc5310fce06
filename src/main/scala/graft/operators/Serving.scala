package graft.operators

/** Cross-artifact SERVING SNAPSHOT (round-18 verdict #1): a composed
  * serving pipeline (q175: inverted index + IVF index + similarity graph)
  * answers from SEVERAL versioned artifacts, each individually
  * epoch-consistent — but nothing pinned them to each other. A mutation
  * landing on ONE artifact mid-serve (between the sparse channel's
  * manifest resolution and the serp-dedup's graph read) would hand the
  * page a MIXED snapshot: candidates ranked against one corpus version,
  * deduped against another — each read locally valid, the composition
  * silently wrong.
  *
  * The discipline is [[Similarity.requireCertifiedRecall]]'s, widened
  * from one artifact to the SET: resolve every artifact's manifest epoch
  * ONCE at serve start ([[resolveServingSnapshot]]), build every channel,
  * and assert — after the last artifact read is resolved, before the page
  * ships — that NO epoch moved ([[requireServingSnapshot]]). Cost is one
  * small manifest re-read per artifact (O(1) in corpus size, the
  * certificate-assertion economics); a moved epoch fails LOUDLY with the
  * artifact named, and the caller re-serves from a fresh snapshot —
  * exactly the behavior a mixed page must never have.
  *
  * This is detection, not prevention: Spark plans are lazy, so a mutation
  * during EXECUTION is instead covered by the manifest grace generation
  * (an in-flight scan keeps its resolved directories — MaintenanceIo
  * scaladoc); what the snapshot closes is the construction window, where
  * two channels resolve the SAME artifact family at different times.
  */
object Serving {

  /** Artifact root → manifest epoch, resolved now. Resolve ONCE at serve
    * start, over every versioned artifact the pipeline will read.
    */
  def resolveServingSnapshot(paths: Seq[String]): Map[String, Long] =
    paths.map(p => p -> MaintenanceIo.requireManifest(p).epoch).toMap

  /** Re-read every artifact's manifest and fail loudly if ANY epoch moved
    * past the snapshot — the serve is answering from a mixed artifact set
    * and must be re-run from a fresh [[resolveServingSnapshot]].
    */
  def requireServingSnapshot(snapshot: Map[String, Long]): Unit =
    snapshot.foreach { case (path, epoch) =>
      val cur = MaintenanceIo.requireManifest(path).epoch
      if (cur != epoch)
        throw new IllegalStateException(
          s"serving snapshot violated: $path mutated mid-serve (epoch " +
            s"$epoch at serve start, $cur now) — the composed page would " +
            "mix artifact versions; re-serve from a fresh snapshot")
    }
}
