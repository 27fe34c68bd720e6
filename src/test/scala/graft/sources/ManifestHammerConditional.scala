package graft.sources

/** A real [[StoreManifest.ConditionalPut]] implementation over the local
  * filesystem using link(2) — the object-store adapter leg of
  * [[ManifestMultiJvmSpec]]. The content is written to a private temp
  * name, then `Files.createLink` publishes it at the destination:
  * atomic (the kernel arbitrates EEXIST on the directory entry) and
  * WHOLE-OBJECT (the destination either resolves to the complete content
  * or does not exist — a reader can never open a partial version file),
  * which is exactly the S3 `If-None-Match: *` contract the trait
  * documents. Deliberately a DIFFERENT primitive from the O_EXCL open the
  * file-scheme default uses, so the adapter leg exercises close-time
  * arbitration (buffered PUT, FileAlreadyExistsException from close, the
  * post-close verify classifying the loss) rather than re-testing
  * create-time O_EXCL. */
final class LinkLocalObjectStore extends StoreManifest.ConditionalPut {
  override def putIfAbsent(path: java.net.URI,
      content: Array[Byte]): Boolean = {
    val dst = java.nio.file.Paths.get(path.getPath)
    if (dst.getParent != null)
      java.nio.file.Files.createDirectories(dst.getParent)
    val tmp = dst.resolveSibling(
      s"${dst.getFileName}.put-${java.util.UUID.randomUUID}")
    java.nio.file.Files.write(tmp, content)
    try { java.nio.file.Files.createLink(dst, tmp); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

/** [[ManifestHammer]] with the conditional-put adapter installed for the
  * local scheme — every version create in this JVM arbitrates through
  * [[LinkLocalObjectStore.putIfAbsent]] instead of kernel O_EXCL, so the
  * multi-JVM gate races the ADAPTER protocol end to end. */
object ManifestHammerConditional {
  def main(args: Array[String]): Unit = {
    StoreManifest.registerConditionalPut("file", new LinkLocalObjectStore)
    println("CONDITIONAL-PUT ADAPTER INSTALLED")
    ManifestHammer.main(args)
  }
}
