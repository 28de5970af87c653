package graft.core

/** Per-JVM scratch directories for query-staged artifacts (persisted
  * indexes, bucketed tables, stream landing/checkpoint dirs, IVF cells).
  *
  * The harness runs several JVMs against this repo concurrently (Verify,
  * Bench, test suites); a fixed shared path means one JVM's
  * SaveMode.Overwrite can delete a directory in the window where another
  * JVM is planning a read of it (observed: UNABLE_TO_INFER_SCHEMA on the
  * fts postings dir). A pid-scoped root makes every JVM's scratch space
  * private while staying deterministic within the JVM. target/ is
  * disposable, so accumulation across runs is bounded by `sbt clean`.
  */
object Scratch {
  private val root =
    s"/root/repo/target/qtmp/jvm-${ProcessHandle.current().pid()}"

  def dir(name: String): String = s"$root/$name"
}
