package graft.sources

import java.io.File

/** The two local-filesystem helpers the artifact/maintenance layer kept
  * re-implementing (review finding: three md5-hex clones, two recursive
  * deletes with different guards). One definition each; the delete is
  * null-safe against unreadable directories (`listFiles` returning null).
  */
private[graft] object LocalFs {

  def deleteRecursively(f: File): Unit = if (f.exists()) {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .foreach(deleteRecursively)
    f.delete()
  }

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
