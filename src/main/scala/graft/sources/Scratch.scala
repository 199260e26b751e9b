package graft.sources

/** Scratch-directory lifecycle for queries/specs that build a store,
  * read through it, and discard it (the cdc15/q102 pattern) — one
  * definition of the recursive teardown instead of a copy per site.
  */
object Scratch {

  def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    // a manifest checkpoint still queued for this root would recreate
    // the directory after the walk below — drain the writer first
    ManifestStore.awaitCheckpoints()
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files
        .walk(p)
        .sorted(java.util.Comparator.reverseOrder())
        .iterator()
        .asScala
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
  }

  /** Run `body` against a fresh scratch dir, always cleaning up. The
    * result must be MATERIALIZED before returning (collect /
    * localCheckpoint) — the directory is gone afterwards.
    */
  def withTempDir[A](prefix: String)(body: String => A): A = {
    val path = tempDir(prefix)
    try body(path)
    finally deleteRecursively(path)
  }
}
