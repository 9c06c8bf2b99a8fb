package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Versioned Parquet snapshots — the engine's mutation substrate.
  *
  * The reference mutates SQLite in place under a cross-process file lock
  * (`index_wikimedia.py:47-48,94`; `rclip_server.py:233`). On immutable
  * Parquet the equivalent is snapshot-commit (SURVEY §7.4): every write
  * lands in a fresh `v%05d` directory and only becomes visible once
  * Spark's `_SUCCESS` marker exists, so readers never observe a partial
  * write and a crashed writer leaves no corruption — the same
  * all-or-nothing contract the file lock provided, minus the lock.
  * Scales: commit cost is O(1) metadata; data files are written once.
  */
final class SnapshotStore(val root: String) {

  /** All `v%05d` directories, committed or not (close the OS dir stream —
    * Files.list leaks a file descriptor otherwise). */
  private def allVersionDirs: Seq[(Int, String)] = {
    val p = Paths.get(root)
    if (!Files.isDirectory(p)) Nil
    else {
      val st = Files.list(p)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d{5}"))
        .map(n => n.substring(1).toInt -> s"$root/$n")
        .toSeq.sortBy(_._1)
      finally st.close()
    }
  }

  private def versionDirs: Seq[(Int, String)] =
    allVersionDirs.filter { case (_, dir) =>
      Files.exists(Paths.get(dir, "_SUCCESS"))
    }

  def latestVersion: Option[Int] = versionDirs.lastOption.map(_._1)
  def latestDir: Option[String] = versionDirs.lastOption.map(_._2)

  /** Read the newest committed snapshot. */
  def read(spark: SparkSession): DataFrame =
    latestDir match {
      case Some(d) => spark.read.parquet(d)
      case None    => throw new IllegalStateException(s"no committed snapshot under $root")
    }

  /** Commit `df` as the next version and return its directory. Numbering
    * skips past uncommitted (torn-write) directories too — a writer that
    * crashed mid-write of v N must not wedge the next writer on an
    * already-exists error at v N. */
  def write(df: DataFrame): String = {
    val next = allVersionDirs.lastOption.map(_._1).getOrElse(0) + 1
    val dir = f"$root/v$next%05d"
    df.write.parquet(dir) // parquet commit protocol writes _SUCCESS last
    dir
  }

  /** Seed the store from an external Parquet table (no-op if versioned). */
  def initFrom(spark: SparkSession, sourcePath: String): Unit =
    if (latestDir.isEmpty) write(spark.read.parquet(sourcePath))

  /** Retention: delete all but the newest `keep` committed versions,
    * including torn-write directories below that cutoff. Torn dirs ABOVE
    * the cutoff are left alone (a concurrent writer could be mid-write);
    * they cannot wedge the store because write() numbers past every
    * existing directory, committed or not. Mutation-heavy workloads
    * (censor, dedup, upsert) write a full snapshot per call — without
    * pruning the store grows by one corpus copy per mutation. Returns the
    * number of directories removed. Readers of a pruned version would
    * fail, so call this from the same single-writer context that calls
    * write(). */
  def prune(keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the newest snapshot")
    val cutoff = versionDirs.takeRight(keep).headOption.map(_._1).getOrElse(0)
    val doomed = allVersionDirs.collect {
      case (v, dir) if v < cutoff => Paths.get(dir)
    }
    doomed.foreach { dir =>
      val st = Files.walk(dir)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally st.close()
    }
    doomed.size
  }
}
