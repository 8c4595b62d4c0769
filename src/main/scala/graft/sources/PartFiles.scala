package graft.sources

/** Driver-side overwrite discipline shared by the partition-local
  * container writers (Arrow / Avro / WebDataset / WARC). Each writer
  * task replaces its OWN file atomically (attempt-suffixed temp +
  * rename), which makes a re-run into the same directory a clean
  * overwrite only when the partition count is unchanged: a re-run with
  * FEWER partitions would otherwise leave stale higher-numbered part
  * files that the readers pick up alongside the new ones (same schema,
  * so the quarantine rules cannot catch them — silently mixed rows).
  *
  * The cleanup runs AFTER the distributed write succeeds, deleting only
  * matching files the finished job did NOT write (plus orphaned attempt
  * temps): on success the directory is exactly the new generation, and
  * a job that dies mid-write leaves the previous generation's files in
  * place instead of destroying them up front — the write is repeatable,
  * so crash recovery is "run it again", never data loss. One
  * driver-side listing per write, no distributed work.
  */
private[sources] object PartFiles {

  /** Delete `<prefix>*<suffix>` finals NOT in `keep` and every
    * `.<prefix>*.tmp` attempt leftover, directly under `dir`
    * (non-recursive — the writers never nest). */
  def clearStaleExcept(dir: String, prefix: String, suffix: String,
                       keep: Set[String],
                       conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) {
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        val stale =
          (n.startsWith(prefix) && n.endsWith(suffix) && !keep(n)) ||
            (n.startsWith("." + prefix) && n.endsWith(".tmp"))
        if (st.isFile && stale) fs.delete(st.getPath, false)
      }
    }
  }
}
