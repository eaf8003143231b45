package graft

/** Session temp-root for gate/operator scratch directories.
  *
  * Every demo gate that stages an artifact (signature stores, summary
  * mv dirs, snapshot stores, …) used to `Files.createTempDirectory`
  * per invocation with no cleanup — small directories, but repeated
  * bench/verify runs accumulated them in /tmp without bound. All such
  * scratch now nests under ONE session root with ONE shutdown hook
  * (the `derivedFactDir` pattern from round 15, generalized), so a JVM
  * exit leaves zero `graft-*` residue regardless of how many gates
  * ran. The root is created lazily — a JVM that never stages anything
  * never touches /tmp.
  *
  * This is GATE hygiene, not engine machinery: production artifact
  * paths are caller-supplied (catalog dirs, snapshot stores on real
  * filesystems); only the self-contained demo/test gates stage under
  * /tmp.
  */
object TempDirs {

  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-s-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      deleteRecursively(r.toFile)))
    r
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** A fresh scratch directory under the session root; deleted (with
    * everything staged inside it) by the root's shutdown hook.
    * Named `<prefix>-<counter>`, NOT a second random temp suffix: the
    * root already carries the per-JVM randomness, and gates assert on
    * artifact paths in `executedPlan.toString`, whose metadata values
    * truncate at `spark.sql.maxMetadataStringLength` (default 100
    * chars) — a doubly-random nested path pushed real artifact names
    * past the cut and made every summary gate read as "rewrite did
    * not fire" while the rewrite was in fact serving. */
  def create(prefix: String): java.nio.file.Path = {
    val p = root.resolve(prefix + "-" + seq.incrementAndGet())
    java.nio.file.Files.createDirectories(p)
    p
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }
}
