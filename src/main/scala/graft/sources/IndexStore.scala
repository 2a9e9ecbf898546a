package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once, query-many index artifacts (reference lifecycle: construct
  * index in minutes, answer many queries in seconds — across SESSIONS, not
  * just within one).
  *
  * An artifact is a parquet directory keyed by (data dir, artifact name)
  * under a configurable root. `materialize` is load-or-build: a second
  * session (or a second process on the same box/cluster) finds the artifact
  * complete and skips the build scan entirely. Parquet's `_SUCCESS` marker
  * is the completeness check, so a half-written artifact is rebuilt, never
  * served.
  *
  * At cluster scale the root is a shared filesystem/object-store prefix and
  * the same code serves every executor; locally it defaults to the system
  * temp dir. Disable persistence with `graft.index.persist=false` (builds
  * are then served directly, nothing written).
  */
object IndexStore {

  def root(s: SparkSession): String =
    s.conf.get("graft.index.dir", s"${sys.props("java.io.tmpdir")}/graft_index")

  def persistEnabled(s: SparkSession): Boolean =
    s.conf.get("graft.index.persist", "true").toBoolean

  /** Collision-safe identifier for a table/data directory inside artifact
    * validity keys: 64-bit SHA-256 prefix. A 32-bit string hash here is a
    * real risk — two distinct table dirs sharing one `graft.index.dir`
    * that collide would silently serve each other's artifacts (wrong
    * results, no error); at 64 bits the birthday bound is ~2³² tables. */
  def dirId(dir: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString

  /** Artifact key = data dir + a cheap content fingerprint (name/size/mtime
    * of each source file), so a REGENERATED data dir gets fresh artifacts
    * instead of being served stale index data. The cluster-scale analog is
    * keying by the source table's snapshot/commit version. */
  private def dirKey(dataDir: String): String = {
    val d = new java.io.File(dataDir)
    val sig = Option(d.listFiles()).map(_.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(";"))
      .getOrElse("")
    Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(s"$dataDir|$sig"))
  }

  def artifactPath(s: SparkSession, dataDir: String, name: String): String =
    s"${root(s)}/${dirKey(dataDir)}/$name"

  /** Artifact path under an EXPLICIT caller-supplied validity key — for
    * artifacts whose lifetime is narrower than the whole data dir (e.g. an
    * index over the CORPUS SUBSET of a table that also receives daily batch
    * appends: the whole-dir fingerprint changes every ingest, but the
    * corpus-keyed artifact must survive it). The caller owns key hygiene:
    * the key must change iff the artifact's actual inputs change (subset
    * content fingerprint, snapshot/commit version, roster hash, ...). */
  def artifactPathKeyed(s: SparkSession, key: String, name: String): String =
    s"${root(s)}/k_$key/$name"

  def exists(s: SparkSession, path: String): Boolean = {
    val marker = new Path(path, "_SUCCESS")
    marker.getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker)
  }

  /** Load the artifact if complete; else run `build`, write it, and serve
    * the written copy (both paths read the same physical layout). Returns
    * (frame, loadedFromArtifact). */
  def materialize(s: SparkSession, dataDir: String, name: String)
                 (build: => DataFrame): (DataFrame, Boolean) =
    materializeAt(s, artifactPath(s, dataDir, name))(build)

  /** [[materialize]] under an explicit validity key ([[artifactPathKeyed]]). */
  def materializeKeyed(s: SparkSession, key: String, name: String)
                      (build: => DataFrame): (DataFrame, Boolean) =
    materializeAt(s, artifactPathKeyed(s, key, name))(build)

  private def materializeAt(s: SparkSession, path: String)
                           (build: => DataFrame): (DataFrame, Boolean) = {
    if (!persistEnabled(s)) return (build, false)
    if (exists(s, path)) (s.read.parquet(path), true)
    else {
      build.write.mode("overwrite").parquet(path)
      (s.read.parquet(path), false)
    }
  }

  /** Drop every artifact for a data dir (tests / forced rebuild). */
  def invalidate(s: SparkSession, dataDir: String): Unit = {
    val dir = new Path(s"${root(s)}/${dirKey(dataDir)}")
    val fs = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) { fs.delete(dir, true); () }
  }

  /** Reclaim STALE artifact key-directories: validity keys roll forward as
    * corpora change (content fingerprints, snapshot versions), so the dead
    * keys' artifacts accumulate forever without a sweep. A key dir whose
    * newest file is older than `maxAgeMs` is deleted; returns the count.
    *
    * Safety model: GC can only cost a REBUILD, never correctness — the
    * `_SUCCESS` completeness check means a reclaimed (or half-reclaimed)
    * artifact is rebuilt on next access, and validity keys guarantee the
    * rebuild equals what was deleted. A query actively READING an artifact
    * while GC deletes it fails loudly (file-not-found) rather than giving
    * wrong results; run GC with an age comfortably above query lifetime
    * (the vacuum retention-window reasoning). */
  def gc(s: SparkSession, maxAgeMs: Long): Int = {
    val rootDir = new java.io.File(root(s))
    val kids = Option(rootDir.listFiles()).getOrElse(Array.empty).filter(_.isDirectory)
    val horizon = System.currentTimeMillis() - maxAgeMs
    def newest(f: java.io.File): Long =
      Option(f.listFiles()).getOrElse(Array.empty)
        .map(c => if (c.isDirectory) newest(c) else c.lastModified())
        .foldLeft(f.lastModified())(math.max)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    // Scan→delete race with a concurrent WRITER: a build that starts
    // inside the window would lose files mid-write. The re-check right
    // before rm closes the scan-sized window (a fresh write bumps mtimes
    // past the horizon, so the dir is skipped this sweep); the residual
    // instant between re-check and delete can only strand a HALF-written
    // artifact, which the `_SUCCESS` completeness check turns into a
    // rebuild on next access — never silent corruption (safety model
    // above).
    kids.filter(newest(_) < horizon)
      .count { f => val still = newest(f) < horizon; if (still) rm(f); still }
  }
}
