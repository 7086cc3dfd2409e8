package graft.io

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}

/** The one storage primitive [[TxTable]]'s optimistic concurrency
  * stands on: publish manifest version N atomically and exclusively —
  * at most one writer ever wins a given version, and a reader never
  * observes a torn manifest. Everything else in the protocol (immutable
  * data files, snapshot reads, loser re-merge) is plain file I/O.
  *
  * This is the public Delta-LogStore landscape, one implementation per
  * store class:
  *
  *  - [[SymlinkCommitStore]] (local POSIX): `symlink(2)` is atomic,
  *    exclusive, AND carries the body pointer inside the link — there
  *    is no claimed-but-bodyless crash window at all. The default for
  *    `file:` paths.
  *  - [[RenameCommitStore]] (HDFS-class filesystems): the body is
  *    fully written under a temp name, then rename-without-overwrite
  *    into the version slot — atomic and exclusive in the HDFS
  *    namenode. (On a raw local FS this rename is only
  *    check-then-rename, which is why the symlink store is the local
  *    default.)
  *  - Object stores without atomic rename (S3) need put-if-absent or
  *    an external coordinator — same trait, not shipped here.
  */
trait CommitStore {

  /** Latest committed (version, manifest lines); (0, Nil) on a fresh
    * table. */
  def latest(logDir: String): (Long, Seq[String])

  /** Manifest lines of a SPECIFIC committed version (time travel);
    * None if that version was never committed or has been vacuumed. */
  def at(logDir: String, version: Long): Option[Seq[String]]

  /** Atomically publish `lines` as manifest `version`. False = the
    * version slot was already taken by a concurrent commit. */
  def tryCommit(logDir: String, version: Long, lines: Seq[String]): Boolean
}

object CommitStore {
  private[io] def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.length > 1 && name.drop(1).forall(_.isDigit))
      Some(name.drop(1).toLong)
    else None

  private[io] def slotName(version: Long): String = f"v$version%020d"

  /** Store selection by path scheme: local paths get the exact symlink
    * CAS; anything with a non-file scheme (hdfs:, and Hadoop-API
    * lookalikes with atomic rename) gets the rename store. */
  def forPath(fs: FileSystem, dir: String): CommitStore = {
    val scheme = new Path(dir).toUri.getScheme
    if (scheme == null || scheme == "file") SymlinkCommitStore
    else new RenameCommitStore(fs)
  }
}

/** Local-filesystem store: version slot = a symlink whose target is the
  * fully-written body file. POSIX `symlink(2)` fails with EEXIST if the
  * slot is taken and publishes pointer + content in one atomic call. */
object SymlinkCommitStore extends CommitStore {

  override def latest(logDir: String): (Long, Seq[String]) = {
    val log = Paths.get(logDir)
    if (!Files.isDirectory(log)) return (0L, Nil)
    // Files.list holds a directory handle until closed — this runs on
    // every snapshot resolve and commit attempt, so leaking it would
    // exhaust fds in a long-running driver
    val listing = Files.list(log)
    val versions =
      try listing.iterator().asScala
        .flatMap(p => CommitStore.versionOf(p.getFileName.toString).map(_ -> p))
        .toList
      finally listing.close()
    if (versions.isEmpty) return (0L, Nil)
    val (v, ptr) = versions.maxBy(_._1)
    (v, readSlot(ptr))
  }

  override def at(logDir: String, version: Long): Option[Seq[String]] = {
    val slot = Paths.get(logDir).resolve(CommitStore.slotName(version))
    // a dangling slot (body vacuumed, or a partially-reclaimed log)
    // reads as absent, not as a crash
    if (Files.isSymbolicLink(slot) && Files.exists(slot)) Some(readSlot(slot))
    else None
  }

  private def readSlot(ptr: java.nio.file.Path): Seq[String] = {
    val body = ptr.resolveSibling(Files.readSymbolicLink(ptr))
    Files.readAllLines(body, UTF_8).asScala.toSeq.filter(_.nonEmpty)
  }

  override def tryCommit(
      logDir: String, version: Long, lines: Seq[String]): Boolean = {
    val log = Paths.get(logDir)
    Files.createDirectories(log)
    val body = log.resolve(s"m-${UUID.randomUUID()}.tsv")
    Files.write(body, lines.asJava, UTF_8)
    try {
      Files.createSymbolicLink(
        log.resolve(CommitStore.slotName(version)), body.getFileName)
      true
    } catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(body)
        false
    }
  }
}

/** HDFS-class store: the version slot is a regular file renamed into
  * place WITHOUT overwrite after being fully written under a dot-temp
  * name. HDFS's namenode makes that rename atomic and exclusive; the
  * body is complete before the slot exists, so readers never see a
  * torn manifest. */
final class RenameCommitStore(fs: FileSystem) extends CommitStore {

  override def latest(logDir: String): (Long, Seq[String]) = {
    val log = new Path(logDir)
    if (!fs.exists(log)) return (0L, Nil)
    val versions = fs.listStatus(log).toSeq
      .flatMap(s => CommitStore.versionOf(s.getPath.getName).map(_ -> s.getPath))
    if (versions.isEmpty) return (0L, Nil)
    val (v, slot) = versions.maxBy(_._1)
    (v, readSlot(slot))
  }

  override def at(logDir: String, version: Long): Option[Seq[String]] = {
    val slot = new Path(logDir, CommitStore.slotName(version))
    if (fs.exists(slot)) Some(readSlot(slot)) else None
  }

  private def readSlot(slot: Path): Seq[String] = {
    val in = fs.open(slot)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  override def tryCommit(
      logDir: String, version: Long, lines: Seq[String]): Boolean = {
    val log = new Path(logDir)
    fs.mkdirs(log)
    val tmp = new Path(log, s".m-${UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, false)
    try out.write((lines.mkString("\n") + "\n").getBytes(UTF_8))
    finally out.close()
    val slot = new Path(log, CommitStore.slotName(version))
    // rename-without-overwrite: returns false (or throws on some
    // implementations) when the slot is already taken
    val won =
      try !fs.exists(slot) && fs.rename(tmp, slot)
      catch { case _: java.io.IOException => false }
    if (!won) fs.delete(tmp, false)
    won
  }
}
