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
  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }

  def sweep(maxAgeMillis: Long = 6L * 3600 * 1000): Unit = {
    val cutoff = System.currentTimeMillis() - maxAgeMillis
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    def newestMtime(f: java.io.File): Long =
      (f.lastModified() +: Option(f.listFiles()).getOrElse(Array.empty)
        .map(newestMtime).toSeq).max
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_q") &&
        newestMtime(f) < cutoff)
      .foreach { f =>
        try deleteTree(f)
        catch { case _: Throwable => () } // best-effort hygiene, never fatal
      }
  }

  /** Sweep THIS process's per-query index dirs (`graft_q…_<pid>`) — called
    * by Bench between queries, outside every timed window, so the 240-query
    * sweep doesn't accumulate gigabytes of dead indexes whose page-cache
    * and disk pressure bleeds into LATER queries' timed windows (the
    * round-12 in-suite-vs-isolated gap, q165 6.78 s vs 4.92). Pid-scoped,
    * so a concurrent graft process's live dirs are untouchable; within one
    * process it runs only BETWEEN queries (each query's own reps keep
    * their dirs — tagged-retry semantics stay measured). */
  def sweepCurrentProcess(): Unit = {
    val pid = java.lang.ProcessHandle.current().pid()
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_q") &&
        f.getName.endsWith("_" + pid))
      .foreach { f =>
        try deleteTree(f)
        catch { case _: Throwable => () }
      }
  }
}
