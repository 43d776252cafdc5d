package graft.sources

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` filesystem without the per-file `chmod` FORK.
  *
  * In a JVM without libhadoop (this sandbox, most laptops, many container
  * images), Hadoop's `RawLocalFileSystem.setPermission` falls back from
  * NativeIO to `Shell.execCommand` — it FORKS a `chmod` process for EVERY
  * file and directory a write creates (`FileSystem.create` and
  * `mkdirsWithOptionalPermission` both call it). On a many-GB heap, fork
  * is slow and partly serialized, so a date-partitioned fact write
  * (~2,400 files + dirs + .crc sidecars) measured 32 tasks × 5.8 s wall
  * with only 0.4 s CPU each — every executor thread parked in
  * `ProcessImpl.forkAndExec` (jstack receipt in OPTIMIZATION_r19.md). The
  * chmod calls are pure overhead here: local-zone files need no
  * permission management, and on a REAL deployment (HDFS/object store,
  * or local with libhadoop) this fork path does not exist at all — so
  * removing it makes local measurements MORE representative of cluster
  * behavior, not less.
  *
  * `BareLocalFileSystem` is the checksummed `LocalFileSystem` over a raw
  * FS whose `setPermission` is a no-op (created files simply keep the
  * process umask, which is what they effectively got anyway). Wire it in
  * with `.config("spark.hadoop.fs.file.impl",
  * classOf[BareLocalFileSystem].getName)` — every runtime main does.
  */
final class BareLocalFileSystem extends LocalFileSystem(new BareRawLocalFileSystem)

final class BareRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
}
