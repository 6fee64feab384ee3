package graft

import java.nio.file.{Files, Path, Paths}

/** Temp-directory registry: every scratch directory the query harnesses
  * create (staged stream inputs, streaming sink tables, on-disk ANN
  * indexes) is registered here and recursively deleted on JVM exit, so
  * repeated verify/bench loops don't accumulate copies under /tmp. */
object TempDirs {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => registered.forEach(p => deleteRecursively(Paths.get(p)))))

  /** Create a fresh temp directory that dies with the JVM. */
  def create(prefix: String): String =
    register(Files.createTempDirectory(prefix).toString)

  /** Register an existing path for deletion on JVM exit; returns it. */
  def register(path: String): String = {
    hook
    registered.add(path)
    path
  }

  /** Delete a registered directory NOW (session-scoped eviction —
    * SharedAnn's listener) instead of waiting for JVM exit. */
  def delete(path: String): Unit = {
    registered.remove(path)
    deleteRecursively(Paths.get(path))
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    try Files.deleteIfExists(p) catch { case _: Exception => () }
  }
}
