package graft.util

import java.io.File
import java.nio.file.{Files, Path}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** JVM-exit cleanup for scratch store directories. `File.deleteOnExit`
  * only removes empty directories, so parquet stores written under
  * tmpdir would otherwise accumulate across runs; this registers one
  * shutdown hook and deletes the marked trees recursively. */
object TempDirs {

  private val registered = mutable.LinkedHashSet.empty[String]

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.synchronized(registered.toSeq).foreach(deleteTree)))

  def deleteOnExit(dir: String): Unit = {
    hookInstalled
    registered.synchronized { registered += dir }
  }

  private def deleteTree(dir: String): Unit =
    try {
      val root = new File(dir).toPath
      if (Files.exists(root)) {
        val stream = Files.walk(root)
        val paths: Seq[Path] =
          try stream.iterator().asScala.toSeq
          finally stream.close()
        paths.sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
      }
    } catch { case _: Exception => () } // best-effort at JVM exit
}
