package graft.io

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** S9 — local file utilities (reference: local_file_manager.py:24-35,
  * 56-85: copy2-based upload/download + recursive prefix listing).
  * Driver-side metadata ops only — never data-path. */
object FileUtils {

  def copy(src: String, dst: String): Unit = {
    val d = Paths.get(dst)
    Option(d.getParent).foreach(Files.createDirectories(_))
    Files.copy(Paths.get(src), d, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Recursive listing of regular files under `root` whose path relative
    * to root starts with `prefix`, sorted for determinism. */
  def listObjects(root: String, prefix: String = ""): Seq[String] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) Seq.empty
    else {
      val stream = Files.walk(rootPath)
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => rootPath.relativize(p).toString)
        .filter(_.startsWith(prefix))
        .toSeq.sorted
      finally stream.close()
    }
  }

  def sizeBytes(root: String, rel: String): Long =
    Files.size(Paths.get(root).resolve(rel))
}
