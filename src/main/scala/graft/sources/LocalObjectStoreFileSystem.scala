package graft.sources

import java.io.{FileNotFoundException, IOException}
import java.net.URI
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption, Path => NioPath}
import java.util.Comparator

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A local-directory-backed Hadoop `FileSystem` that answers for object-store
  * schemes (`s3a://`, `gs://`, …), mapping `scheme://bucket/key` onto
  * `$root/bucket/key` on the local disk.
  *
  * Purpose: the reference exercises its object-store path end-to-end against
  * a local minio in CI (`.github/workflows/build.yml:73-158`); the cloud
  * connector jars (hadoop-aws, gcs-connector) do not exist in this offline
  * environment, so this shim is the minio analog — registered via
  * `fs.s3a.impl` / `fs.gs.impl`, it lets `ObjectStores`' URI rewriting and
  * credential injection drive a REAL `register → list → read → query` round
  * trip through Spark's FileSystem layer (listing, FileIndex, parquet
  * footers, split planning) instead of stopping at string assertions. In a
  * real deployment the stock connectors take this seat; nothing else in the
  * code path changes.
  *
  * Hadoop caches one instance per (scheme, authority, ugi), so each bucket
  * gets its own instance; the backing root comes from
  * `fs.graft.localstore.root` in the Hadoop configuration.
  */
class LocalObjectStoreFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var rootDir: NioPath = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    val root = conf.get(LocalObjectStoreFileSystem.RootKey)
    if (root == null)
      throw new IOException(
        s"${LocalObjectStoreFileSystem.RootKey} must point at the local dir backing " +
          s"${name.getScheme}:// (this is the offline object-store shim)")
    rootDir = Paths.get(root)
    fsUri = URI.create(name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri
  override def getScheme: String = fsUri.getScheme

  /** `scheme://bucket/key` → `$root/bucket/key`. */
  private def toLocal(f: Path): NioPath = {
    val u = f.makeQualified(fsUri, workDir).toUri
    val bucket = Option(u.getAuthority).getOrElse(fsUri.getAuthority)
    val rel = Option(u.getPath).getOrElse("/").stripPrefix("/")
    if (rel.isEmpty) rootDir.resolve(bucket) else rootDir.resolve(bucket).resolve(rel)
  }

  private def qualified(f: Path): Path = f.makeQualified(fsUri, workDir)

  private def statusOf(f: Path, p: NioPath): FileStatus = {
    val isDir = Files.isDirectory(p)
    new FileStatus(if (isDir) 0L else Files.size(p), isDir, 1, 32 * 1024 * 1024,
      Files.getLastModifiedTime(p).toMillis, qualified(f))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val p = toLocal(f)
    if (!Files.exists(p)) throw new FileNotFoundException(qualified(f).toString)
    statusOf(f, p)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val p = toLocal(f)
    if (!Files.exists(p)) throw new FileNotFoundException(qualified(f).toString)
    if (!Files.isDirectory(p)) Array(statusOf(f, p))
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val out = Array.newBuilder[FileStatus]
        while (it.hasNext) {
          val child = it.next()
          val childPath = new Path(qualified(f), child.getFileName.toString)
          out += statusOf(childPath, child)
        }
        out.result()
      } finally s.close()
    }
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val p = toLocal(f)
    if (!Files.exists(p)) throw new FileNotFoundException(qualified(f).toString)
    new FSDataInputStream(new LocalObjectStoreFileSystem.NioInputStream(
      FileChannel.open(p, StandardOpenOption.READ)))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val p = toLocal(f)
    if (!overwrite && Files.exists(p))
      throw new IOException(s"already exists: ${qualified(f)}")
    Option(p.getParent).foreach(Files.createDirectories(_))
    new FSDataOutputStream(Files.newOutputStream(p), statistics)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new IOException("append is not supported by the object-store shim")

  override def rename(src: Path, dst: Path): Boolean = {
    val s = toLocal(src); val d = toLocal(dst)
    // Hadoop contract: rename returns FALSE on a missing source or an
    // existing destination rather than throwing (committers and retry
    // logic branch on the boolean)
    if (!Files.exists(s) || Files.exists(d)) false
    else {
      Option(d.getParent).foreach(Files.createDirectories(_))
      Files.move(s, d); true
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val p = toLocal(f)
    if (!Files.exists(p)) false
    else if (Files.isDirectory(p)) {
      val children = Files.list(p)
      val hasChildren = try children.findFirst().isPresent finally children.close()
      if (hasChildren && !recursive)
        throw new IOException(s"directory not empty: ${qualified(f)}")
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[NioPath]())
        .forEach(c => Files.delete(c)) finally walk.close()
      true
    } else { Files.delete(p); true }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    Files.createDirectories(toLocal(f)); true
  }

  override def setWorkingDirectory(dir: Path): Unit = workDir = qualified(dir)
  override def getWorkingDirectory: Path = workDir
}

object LocalObjectStoreFileSystem {
  /** Hadoop conf key naming the local directory that plays the object store. */
  val RootKey = "fs.graft.localstore.root"

  /** Seekable + positioned-readable stream over a local file channel (the
    * contract `FSDataInputStream` requires; `FSInputStream` derives the
    * positioned reads from seek+read). */
  private final class NioInputStream(ch: FileChannel) extends FSInputStream {
    override def seek(pos: Long): Unit = { ch.position(pos); () }
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = {
      val b = ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xFF
    }
    override def read(buf: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(buf, off, len))
    override def available(): Int =
      math.min(Int.MaxValue.toLong, math.max(0L, ch.size() - ch.position())).toInt
    override def close(): Unit = ch.close()
  }
}
