package graft.pipeline

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, FileUtil, Options, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Filesystem seam for every manifest/metadata file the pipeline tier
  * writes (Checkpoint, CurationJob, Backup) — the Hadoop `FileSystem`
  * API, NOT `java.nio`, so the checkpoint/resume story works wherever
  * the data parquet lives: local disk, NFS, HDFS, or an object store
  * configured through `fs.*` (the reference's SQLite cache at
  * src/utils/cache_manager.py:79-97 assumed one local disk; a Spark
  * deployment cannot).
  *
  * Commit semantics by filesystem:
  *   - HDFS / local `file://`: `writeAtomic` is tmp + atomic rename
  *     (`FileContext.rename(OVERWRITE)`), the strongest form — a reader
  *     sees the old manifest or the new one, never a partial file.
  *   - Object stores without an `AbstractFileSystem` binding (e.g. s3a):
  *     falls back to delete + rename (copy-based on S3). The window only
  *     ever exposes "manifest ABSENT", and every reader here treats a
  *     missing manifest as "not committed → recompute", so crash safety
  *     degrades gracefully: worst case is recomputing a completed stage,
  *     never trusting a partial one. (S3 PUT/rename-copy is atomic per
  *     object, so a manifest is still never read half-written; for
  *     exactly-once commit markers on S3 use conditional-put via a
  *     committer — documented, out of engine scope.)
  *
  * Paths are plain strings (optionally scheme-qualified, e.g.
  * `file:///tmp/x`, `hdfs://nn/x`); the Hadoop configuration comes from
  * the active SparkSession when one exists so `fs.*` settings (S3
  * credentials, endpoints) flow through.
  */
object Fs {

  def conf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def hpath(s: String): HPath = new HPath(s)

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf)

  def exists(s: String): Boolean = { val p = hpath(s); fsOf(p).exists(p) }

  def mkdirs(s: String): Unit = { val p = hpath(s); fsOf(p).mkdirs(p) }

  def isDirectory(s: String): Boolean = {
    val p = hpath(s); val fs = fsOf(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def fileSize(s: String): Long = { val p = hpath(s); fsOf(p).getFileStatus(p).getLen }

  def deleteIfExists(s: String): Unit = {
    val p = hpath(s); val fs = fsOf(p)
    if (fs.exists(p)) fs.delete(p, false)
  }

  def deleteTree(s: String): Unit = {
    val p = hpath(s); val fs = fsOf(p)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Rename with overwrite — atomic where the FS provides it (see object
    * doc). `src` and `dst` must be on the same filesystem.
    */
  def renameOverwrite(src: String, dst: String): Unit = {
    val s = hpath(src); val d = hpath(dst)
    try {
      val fc = FileContext.getFileContext(fsOf(d).getUri, conf)
      fc.rename(s, d, Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem binding (object stores): non-atomic
        // overwrite, but the only observable intermediate state is
        // "dst absent" = not-committed — safe for every caller here
        val fs = fsOf(d)
        if (fs.exists(d)) fs.delete(d, false)
        if (!fs.rename(s, d))
          throw new java.io.IOException(s"rename $src -> $dst failed")
    }
  }

  /** Write `content` durably at `dest` via tmp + rename-overwrite. */
  def writeAtomic(dest: String, content: String): Unit = {
    val d = hpath(dest); val fs = fsOf(d)
    if (d.getParent != null) fs.mkdirs(d.getParent)
    val tmp = new HPath(d.getParent, "." + d.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    renameOverwrite(tmp.toString, dest)
  }

  def readString(s: String): Option[String] = {
    val p = hpath(s); val fs = fsOf(p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** Total bytes of regular files under `dir` (recursive; 0 if absent).
    * One recursive listing — on object stores this is a flat LIST call,
    * not a per-directory walk.
    */
  def dirBytes(dir: String): Long = {
    val p = hpath(dir); val fs = fsOf(p)
    if (!fs.exists(p)) 0L
    else if (fs.getFileStatus(p).isFile) fs.getFileStatus(p).getLen
    else {
      var acc = 0L
      val it = fs.listFiles(p, true)
      while (it.hasNext) acc += it.next().getLen
      acc
    }
  }

  /** Regular files under `p` (recursive), or `p` itself if a file. */
  def listFilesRecursive(s: String): Seq[String] = {
    val p = hpath(s); val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else {
      val buf = scala.collection.mutable.ListBuffer.empty[String]
      val it = fs.listFiles(p, true)
      while (it.hasNext) buf += it.next().getPath.toString
      buf.toSeq
    }
  }

  /** Immediate subdirectory NAMES of `dir` (empty if absent). */
  def listDirNames(dir: String): Seq[String] = {
    val p = hpath(dir); val fs = fsOf(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Copy one file (overwrites; creates parent dirs). */
  def copyFile(src: String, dst: String): Unit = {
    val s = hpath(src); val d = hpath(dst)
    val sfs = fsOf(s); val dfs = fsOf(d)
    if (d.getParent != null) dfs.mkdirs(d.getParent)
    if (!FileUtil.copy(sfs, s, dfs, d, false, true, conf))
      throw new java.io.IOException(s"copy $src -> $dst failed")
  }

  /** Streaming md5 of a file. A file that cannot be read back cleanly
    * (missing, truncated, or failing the filesystem's OWN checksum —
    * Hadoop's local FS verifies `.crc` sidecars on open) reports as
    * `"unreadable:<reason>"`, which can never equal a real digest: bit
    * rot below the FS surfaces as an integrity mismatch, not a crash.
    */
  def md5(s: String): String = {
    val p = hpath(s)
    try {
      val fs = fsOf(p)
      val md = java.security.MessageDigest.getInstance("MD5")
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](65536)
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
      md.digest().map("%02x".format(_)).mkString
    } catch {
      case e: java.io.IOException => s"unreadable:${e.getClass.getSimpleName}"
    }
  }

  /** `child`'s path relative to `base` (scheme-insensitive). Both sides
    * are fully QUALIFIED against their filesystem first: listings return
    * absolute qualified paths (file:/abs/...), so a caller-supplied
    * RELATIVE base would otherwise never prefix-match its own children.
    */
  def relativize(base: String, child: String): String = {
    def qualified(s: String): String = {
      val p = hpath(s)
      fsOf(p).makeQualified(p).toUri.getPath
    }
    val b = qualified(base).stripSuffix("/")
    val c = qualified(child)
    require(c.startsWith(b + "/"), s"$child is not under $base")
    c.substring(b.length + 1)
  }

  /** Modification time (epoch ms) of a path, 0 if absent. */
  def mtime(s: String): Long = {
    val p = hpath(s); val fs = fsOf(p)
    if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
  }
}
