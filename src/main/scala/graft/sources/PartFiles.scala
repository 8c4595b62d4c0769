package graft.sources

/** Driver-side overwrite discipline shared by the partition-local
  * container writers (Arrow / Avro / WebDataset / WARC). Each writer
  * task streams its file into a hidden STAGING GENERATION
  * (`<dir>/.gen/<name>`, via an attempt-suffixed temp + rename), so the
  * live directory's previous generation is untouched while the
  * distributed job runs: a job that dies mid-write leaves the complete
  * old generation readable (plus a staging dir the next attempt
  * clears) — never a cross-generation mix, never partial data. Only
  * after the job SUCCEEDS does the driver swap the generation in: each
  * staged file renames over its final name, then matching finals the
  * new generation did not produce are deleted (the fewer-partitions
  * re-run case — same schema, so reader quarantine could never catch
  * stale extras). The swap is a driver rename loop — milliseconds, not
  * job-sized; readers ignore the dot-prefixed staging dir by the
  * standard hidden-path rule. Single maintenance writer per directory,
  * the same contract as the persisted indexes.
  */
private[sources] object PartFiles {

  /** The staging path for final name `name` under `dir`; clears any
    * previous crashed attempt's staging tree once per job (driver call,
    * before tasks launch). */
  def stagingDir(dir: String): String = s"$dir/.gen"

  def clearStaging(dir: String,
                   conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p = new org.apache.hadoop.fs.Path(stagingDir(dir))
    val fs = p.getFileSystem(conf)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Publish a successful job's staged generation: rename each staged
    * file over its final name, delete matching finals not in this
    * generation, drop the staging dir. `names` are the final file names
    * the tasks REPORTED (the single source of truth — re-deriving them
    * driver-side from a duplicated format string would delete the new
    * generation on any drift between the two sites). */
  def publishGeneration(dir: String, prefix: String, suffix: String,
                        names: Seq[String],
                        conf: org.apache.hadoop.conf.Configuration): Unit = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(conf)
    names.foreach { n =>
      val fin = new org.apache.hadoop.fs.Path(dir, n)
      fs.delete(fin, false)
      val staged = new org.apache.hadoop.fs.Path(stagingDir(dir), n)
      if (!fs.rename(staged, fin))
        throw new java.io.IOException(s"publish $staged -> $fin failed")
    }
    val keep = names.toSet
    fs.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith(prefix) && n.endsWith(suffix)
          && !keep(n))
        fs.delete(st.getPath, false)
    }
    clearStaging(dir, conf)
  }
}
