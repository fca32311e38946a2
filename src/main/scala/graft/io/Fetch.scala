package graft.io

import java.io.{BufferedInputStream, FileOutputStream}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** S8 — source fetch (reference: scripts/download_data.py:14-51 streams
  * parquet files to local disk in 8 KB chunks). Driver-side pre-step:
  * Spark then scans the landed copy. Any java.net.URL scheme works
  * (https in production; file:// in the zero-egress test container). */
object Fetch {

  /** Stream `url` to `dest`, chunked; returns bytes written. Existing
    * files are skipped (the reference's idempotent re-run behavior).
    * Downloads land in a temp sibling and move into place atomically, so
    * an interrupted fetch can never leave a partial file that the
    * skip-if-exists guard would later treat as complete. */
  def fetchToLocal(url: String, dest: String, chunkBytes: Int = 8192,
                   overwrite: Boolean = false): Long = {
    val destPath = Paths.get(dest)
    if (Files.exists(destPath) && !overwrite) return Files.size(destPath)
    Option(destPath.getParent).foreach(Files.createDirectories(_))
    val tmp = destPath.resolveSibling(destPath.getFileName.toString + ".part")
    // Both streams are opened INSIDE the try with null-guarded closes, so a
    // failing FileOutputStream constructor (unwritable dir, tmp is a
    // directory) cannot leak the already-opened URL stream.
    var in: BufferedInputStream = null
    var out: FileOutputStream = null
    val total =
      try {
        in = new BufferedInputStream(new java.net.URL(url).openStream())
        out = new FileOutputStream(tmp.toFile)
        val buf = new Array[Byte](chunkBytes)
        var n = in.read(buf)
        var written = 0L
        while (n >= 0) {
          out.write(buf, 0, n)
          written += n
          n = in.read(buf)
        }
        written
      } catch {
        case e: Throwable =>
          if (out != null) { out.close(); out = null }
          Files.deleteIfExists(tmp)
          throw e
      } finally {
        if (in != null) in.close()
        if (out != null) out.close()
      }
    Files.move(tmp, destPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    total
  }

  /** Fetch a list of URLs into `destDir`, keeping the reference's
    * error-isolation policy: one failed download logs and continues. */
  def fetchAll(urls: Seq[String], destDir: String): Seq[(String, Either[String, Long])] =
    urls.map { url =>
      val name = url.replaceAll(".*/", "")
      url -> (try Right(fetchToLocal(url, s"$destDir/$name"))
      catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") })
    }
}
