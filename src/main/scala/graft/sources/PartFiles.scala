package graft.sources

/** Driver-side pre-write cleanup shared by the partition-local container
  * writers (Arrow / Avro / WebDataset / WARC). Each writer task replaces
  * its OWN file atomically (attempt-suffixed temp + rename), which makes
  * a re-run into the same directory a clean overwrite only when the
  * partition count is unchanged: a re-run with FEWER partitions would
  * otherwise leave stale higher-numbered part files that the readers
  * pick up alongside the new ones (same schema, so the quarantine rules
  * cannot catch them — silently mixed rows). Clearing the directory's
  * matching part files (and any orphaned attempt temps) before the
  * distributed write restores whole-directory overwrite semantics,
  * mirroring the persisted-index writers' manifest/overwrite discipline.
  *
  * One driver-side listing per write — no distributed work, and a no-op
  * on a fresh directory.
  */
private[sources] object PartFiles {

  /** Delete `<prefix>*<suffix>` finals and `.<prefix>*.tmp` attempt
    * leftovers directly under `dir` (non-recursive — the writers never
    * nest). */
  def clearStale(dir: String, prefix: String, suffix: String,
                 conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        val stale = (n.startsWith(prefix) && n.endsWith(suffix)) ||
          (n.startsWith("." + prefix) && n.endsWith(".tmp"))
        if (st.isFile && stale) fs.delete(st.getPath, false)
      }
    }
  }
}
