package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** The versioned-directory commit protocol shared by every full-rewrite
  * path (batch merge/optimize in [[IngestionRunner]], the streaming upsert
  * sink in `graft.streaming.StreamOps`): new contents go into a fresh
  * version dir under a root, and the commit is an atomic rename of a
  * `_current` manifest naming that dir (FileContext rename with OVERWRITE —
  * the posix-style atomic replace; a plain FileSystem.rename would need a
  * delete first, leaving a no-pointer window). A crash at ANY point before
  * the rename leaves the previously-committed version complete and
  * pointed-to. Superseded version dirs are deleted best-effort only AFTER
  * the pointer moves.
  *
  * All IO goes through the Hadoop FileSystem API — roots are HDFS/S3 URIs
  * in production, where java.io.File would silently resolve locally. */
object Versioned {

  private def fs(p: Path, conf: Configuration): FileSystem = p.getFileSystem(conf)

  /** The committed version dir under `root`, if any commit has happened. */
  def current(root: Path, conf: Configuration): Option[Path] = {
    val cur = new Path(root, "_current")
    val f = fs(cur, conf)
    if (!f.exists(cur)) None
    else {
      val in = f.open(cur)
      val name = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      Some(new Path(root, name))
    }
  }

  /** A fresh version dir path to stage into. Pass a deterministic `name`
    * (e.g. a streaming batchId) when the caller needs replay idempotence —
    * re-staging the same name overwrites the same dir, and [[isCommitted]]
    * tells a replayer the commit already happened. */
  def stagePath(root: Path, name: Option[String] = None): Path =
    new Path(root, name.getOrElse(s"v_${System.nanoTime()}"))

  /** True iff `dir` is the currently-committed version of `root`. */
  def isCommitted(root: Path, dir: Path, conf: Configuration): Boolean =
    current(root, conf).exists(_.getName == dir.getName)

  /** Atomically repoint `root`'s manifest at `dir`, then GC older versions
    * (best-effort — a failed delete is retried by the next commit). */
  def commit(root: Path, dir: Path, conf: Configuration): Unit = {
    val f = fs(root, conf)
    val tmp = new Path(root, "_current.tmp")
    val out = f.create(tmp, true)
    try out.write(dir.getName.getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(root.toUri, conf)
      .rename(tmp, new Path(root, "_current"), Options.Rename.OVERWRITE)
    try f.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName != dir.getName)
      .foreach(s => f.delete(s.getPath, true))
    catch { case _: Exception => () }
  }
}
