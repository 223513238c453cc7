package graft

/** Sweep stale per-process graft temp directories (the pid-salted
  * persisted-index paths q86/q91/q124/q153/q215–q219 write under
  * java.io.tmpdir). Pid-salting fixed the cross-process write/read race,
  * at the cost of one abandoned directory set per finished process — this
  * reclaims them. Age-gated (default 6 h) on the NEWEST mtime anywhere in
  * the directory TREE — not the top-level dir's, which appends into
  * existing subdirs (appendIvfCorpus, appendBm25Index, ManifestTable
  * appends) never bump — so a concurrent graft process's live index is
  * never swept as long as anything inside it was written within the gate.
  * Called from the Verify/Bench/ScaleProbe mains, never from queries. */
object TmpHygiene {
  def sweep(maxAgeMillis: Long = 6L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def delete(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
      f.delete(): Unit
    }
    def newestMtime(f: java.io.File): Long =
      (f.lastModified() +: Option(f.listFiles()).getOrElse(Array.empty)
        .map(newestMtime).toSeq).max
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_q") &&
        newestMtime(f) < cutoff)
      .foreach { f =>
        try delete(f)
        catch { case _: Throwable => () } // best-effort hygiene, never fatal
      }
  }
}
