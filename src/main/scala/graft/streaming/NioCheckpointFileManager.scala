package graft.streaming

import java.io.{BufferedOutputStream, FileNotFoundException, InputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{DirectoryStream, Files, Paths, StandardOpenOption, Path => JPath}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, FSDataOutputStream, FSInputStream, Path, PathFilter}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager.CancellableFSDataOutputStream

/** java.nio-backed [[CheckpointFileManager]] for LOCAL-filesystem streaming
  * checkpoints (the harness's JVM-lifetime temp dirs under [[graft.TempDirs]]).
  *
  * Why (optimization guide §5/§6, round-15 sampled-profiler evidence): every
  * micro-batch of every stateful shard funnels its checkpoint file ops —
  * offset/commit log writes, state-store delta creates, temp-file renames,
  * directory listings — through Hadoop's `LocalFileSystem`, which is
  * `ChecksumFileSystem` over `RawLocalFileSystem`: each created file gets a
  * sibling `.crc`, each mkdir/create may fork a `chmod` via
  * `Shell.runCommand`, and each `FileSystem.get` walks the service-loader
  * cache. At fixture scale this PER-FILE fixed cost dominated the streaming
  * family (~0.5 s per shard-task regardless of row volume). This manager
  * performs the identical operations through `java.nio.file` directly: no
  * checksum siblings, no process forks, no Hadoop `FileSystem` resolution —
  * same commit protocol (write temp file, atomic rename), same failure
  * semantics (`FileAlreadyExistsException` on a losing non-overwrite race,
  * `FileNotFoundException` on missing reads/lists).
  *
  * Scope: the harness enables it per streaming query via
  * `spark.sql.streaming.checkpointFileManagerClass` ONLY for its scratch
  * checkpoints (see `StreamingQueries.withStatePartitions`), where
  * durability beyond the JVM is a non-goal by construction (the dirs die
  * with the run). A deployment with durable checkpoints on HDFS/S3 keeps
  * Spark's default manager; this class fails fast on non-local paths. At
  * 100 TB the analogous win is real but belongs to the checkpoint STORE
  * choice (local NVMe + RocksDB provider, or a lean object-store manager),
  * not to this local-FS implementation.
  *
  * Thread-safety: stateless; all methods delegate to java.nio statics.
  */
class NioCheckpointFileManager(root: Path, hadoopConf: Configuration)
    extends CheckpointFileManager {

  NioCheckpointFileManager.requireLocal(root)

  private def nio(p: Path): JPath = {
    val uri = p.toUri
    val scheme = uri.getScheme
    require(scheme == null || scheme == "file",
      s"NioCheckpointFileManager handles local paths only, got: $p")
    Paths.get(uri.getPath)
  }

  private def status(f: JPath): FileStatus = {
    val attrs = Files.readAttributes(f,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    new FileStatus(attrs.size(), attrs.isDirectory, 1, 33554432L,
      attrs.lastModifiedTime().toMillis,
      new Path("file", null, f.toAbsolutePath.toString))
  }

  /** Same commit protocol as Spark's RenameBasedFSDataOutputStream
    * (which is constructor-coupled to the sealed RenameHelperMethods
    * trait): write a hidden temp file in the destination directory,
    * atomic-rename on close, delete on cancel; a losing non-overwrite
    * race surfaces as Hadoop's FileAlreadyExistsException from close(),
    * exactly what HDFSMetadataLog catches as "someone else committed
    * this batch". */
  override def createAtomic(path: Path,
      overwriteIfPossible: Boolean): CancellableFSDataOutputStream = {
    val dst = nio(path)
    val parent = dst.getParent
    if (parent != null) Files.createDirectories(parent)
    val temp = parent.resolve(
      s".${dst.getFileName}.${java.util.UUID.randomUUID}.tmp")
    val out = new BufferedOutputStream(Files.newOutputStream(temp,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE), 32 * 1024)
    new NioCheckpointFileManager.RenameOnCloseStream(
      out, temp, dst, overwriteIfPossible)
  }

  override def open(path: Path): FSDataInputStream = {
    val f = nio(path)
    val ch =
      try FileChannel.open(f, StandardOpenOption.READ)
      catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new FileNotFoundException(s"$path does not exist")
      }
    new FSDataInputStream(new NioCheckpointFileManager.SeekableChannelStream(ch))
  }

  override def list(path: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = nio(path)
    if (!Files.exists(dir)) throw new FileNotFoundException(s"$path does not exist")
    if (!Files.isDirectory(dir)) {
      val st = status(dir)
      return if (filter.accept(st.getPath)) Array(st) else Array.empty
    }
    val out = Array.newBuilder[FileStatus]
    val stream: DirectoryStream[JPath] = Files.newDirectoryStream(dir)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val child = it.next()
        val hp = new Path("file", null, child.toAbsolutePath.toString)
        if (filter.accept(hp)) out += status(child)
      }
    } finally stream.close()
    out.result()
  }

  override def mkdirs(path: Path): Unit = {
    Files.createDirectories(nio(path))
    ()
  }

  override def exists(path: Path): Boolean = Files.exists(nio(path))

  override def delete(path: Path): Unit = {
    def rec(p: JPath): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.newDirectoryStream(p)
        try { val it = s.iterator(); while (it.hasNext) rec(it.next()) }
        finally s.close()
      }
      try { Files.deleteIfExists(p); () }
      catch { case _: java.nio.file.NoSuchFileException => () }
    }
    rec(nio(path))
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    val dir = nio(root)
    Files.createDirectories(dir)
    new Path("file", null, dir.toAbsolutePath.toString)
  }
}

object NioCheckpointFileManager {
  /** Conf value for `spark.sql.streaming.checkpointFileManagerClass`. */
  val className: String = classOf[NioCheckpointFileManager].getName

  private def requireLocal(p: Path): Unit = {
    val scheme = p.toUri.getScheme
    require(scheme == null || scheme == "file",
      s"NioCheckpointFileManager handles local checkpoint paths only; " +
        s"got '$p'. Durable (HDFS/S3) checkpoints must keep Spark's " +
        "default CheckpointFileManager.")
  }

  /** Temp-file stream committed by atomic rename on close (the same
    * protocol as Spark's RenameBasedFSDataOutputStream): close() flushes,
    * renames temp→dst; with overwriteIfPossible=false and dst already
    * present it deletes the temp and throws Hadoop's
    * FileAlreadyExistsException (swallowed when overwrite is allowed,
    * mirroring Spark's close contract); cancel() drops the temp file. */
  private final class RenameOnCloseStream(out: java.io.OutputStream,
      temp: JPath, dst: JPath, overwriteIfPossible: Boolean)
      extends CancellableFSDataOutputStream(out) {

    @volatile private var terminated = false

    override def close(): Unit = synchronized {
      if (terminated) return
      try {
        underlyingStream.close()
        try renameTemp()
        catch {
          case fe: FileAlreadyExistsException =>
            if (!overwriteIfPossible) throw fe
        }
      } finally terminated = true
    }

    private def renameTemp(): Unit = {
      if (!overwriteIfPossible && Files.exists(dst)) {
        // losing side of a concurrent commit: leave dst, drop the temp
        Files.deleteIfExists(temp)
        throw new FileAlreadyExistsException(
          s"rename destination $dst already exists")
      }
      try Files.move(temp, dst, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // non-POSIX fallback: only reachable when the fs cannot replace
          // on move; honor the overwrite contract explicitly
          if (overwriteIfPossible) {
            Files.move(temp, dst,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          } else {
            Files.deleteIfExists(temp)
            throw new FileAlreadyExistsException(
              s"rename destination $dst already exists")
          }
      }
    }

    override def cancel(): Unit = synchronized {
      if (terminated) return
      try {
        underlyingStream.close()
        Files.deleteIfExists(temp)
        ()
      } catch { case _: Exception => () }
      finally terminated = true
    }
  }

  /** Read-only seekable adapter FSDataInputStream requires (Seekable +
    * PositionedReadable), backed by one FileChannel. Positioned reads go
    * through the channel's stateless pread so concurrent callers never
    * corrupt the sequential position. */
  private final class SeekableChannelStream(ch: FileChannel)
      extends FSInputStream {

    override def read(): Int = {
      val one = ByteBuffer.allocate(1)
      val n = ch.read(one)
      if (n <= 0) -1 else one.get(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(b, off, len))

    override def read(position: Long, b: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(b, off, len), position)

    override def seek(pos: Long): Unit = { ch.position(pos); () }

    override def getPos: Long = ch.position()

    override def seekToNewSource(targetPos: Long): Boolean = false

    override def available(): Int =
      math.min(Int.MaxValue.toLong, math.max(0L, ch.size() - ch.position())).toInt

    override def close(): Unit = ch.close()
  }
}
