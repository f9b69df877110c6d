package graft.sources

/**
 * Scratch-directory discipline shared by the persistent-store registry
 * round-trips ([[MinhashIndex.dedupIndexed]], [[PqIndex.annPqIndexed]],
 * [[SqIndex.annSqIndexed]], [[DsirStore.dsirStored]], ...): each
 * build-then-probe audit writes its store under a tmpdir path derived
 * from
 *   - the FULL md5 digest of the corpus path (not a 32-bit hashCode —
 *     distinct paths can never collide short of an md5 collision), and
 *   - a per-JVM nonce, so two concurrent sessions auditing the same
 *     corpus never race one build/overwrite against the other's probe;
 * and every issued directory is deleted recursively at JVM exit, so
 * repeated audit runs leave nothing behind in tmpdir.
 *
 * Within one JVM the mapping is stable (the nonce is a val), so a
 * build in one registry call and a probe in a later one — the Verify
 * driver's pattern — still meet on the same directory.
 */
private[sources] object StoreDirs {

  private val jvmNonce: String =
    java.lang.Long.toHexString(
      java.util.UUID.randomUUID().getLeastSignificantBits)

  private val issued =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val cleaner: Thread = {
    val t = new Thread(() => {
      issued.forEach { d => deleteRec(new java.io.File(d)) }
    }, "graft-store-dir-cleaner")
    Runtime.getRuntime.addShutdownHook(t)
    t
  }

  /** The scratch store directory for (`prefix`, `key`) — registered
    * for recursive deletion at JVM exit. */
  def tmpStoreDir(prefix: String, key: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    val dir = s"${System.getProperty("java.io.tmpdir")}/" +
      s"$prefix-$digest-$jvmNonce"
    if (issued.add(dir)) { cleaner; () }
    dir
  }

  private def deleteRec(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete()
    ()
  }
}
