package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable per-corpus derived artifacts — the parquet form of the
  * in-session index memos (IVF centroid models, dedup cluster
  * labelings). An index build costs multiple full data passes; a
  * session must pay it at most once per corpus STATE, and a restarted
  * driver (or another session on the same cluster) should reload the
  * published artifact instead of rebuilding (VERDICT r3 #7 — the
  * in-session `localCheckpoint`/TrieMap memos die with the session,
  * and executor loss invalidates checkpoint blocks; a parquet
  * artifact survives both).
  *
  * Layout: `<root>/<kind>/<fingerprint-hash>/part-*.parquet`, where
  *   - `root` is `spark.graft.artifactDir` — on a real cluster a
  *     shared HDFS/S3 URI; defaults to the local tmp dir (the
  *     corpus dir itself may be read-only, as the gate's is);
  *   - `kind` names the artifact AND its algorithm version
  *     (`ivf-model-v1`) — a semantics change must bump the version
  *     so old artifacts miss rather than silently serve stale
  *     results to the oracle gate;
  *   - the hash is over [[Tables.fingerprint]]'s (path, length,
  *     mtime) file listing — metadata-only, so an in-place corpus
  *     rewrite invalidates the artifact with no data pass.
  *
  * Publication is atomic: build → write to a hidden sibling temp
  * path → rename into place. Readers accept only directories whose
  * `_SUCCESS` marker exists, so a crashed writer leaves garbage,
  * never a half-artifact; a lost publish race defers to the winner
  * (same corpus state ⟹ same content).
  */
object ArtifactStore {

  def root(spark: SparkSession): String =
    spark.conf.get("spark.graft.artifactDir",
      new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft-artifacts").getPath)

  private def fingerprintHash(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  /** Where (kind, corpus-table state) lives under the artifact root. */
  def artifactPath(
      spark: SparkSession, corpusDir: String, table: String, kind: String): Path =
    new Path(new Path(root(spark), kind),
      fingerprintHash(Tables.fingerprint(spark, corpusDir, table)))

  /** The artifact frame for (kind, corpus-table state): reload if a
    * complete publication exists, else run `build`, publish
    * atomically, and read back. The returned frame is always a plain
    * parquet scan — downstream lineage never re-runs the build.
    */
  def loadOrBuild(
      spark: SparkSession, corpusDir: String, table: String, kind: String)(
      build: => DataFrame): DataFrame = {
    val p = artifactPath(spark, corpusDir, table, kind)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val success = new Path(p, "_SUCCESS")
    if (!fs.exists(success)) {
      val tmp = new Path(p.getParent,
        s".${p.getName}.inprogress-${java.util.UUID.randomUUID()}")
      build.write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(p)) fs.delete(p, true) // crashed writer's half-artifact
      if (!fs.rename(tmp, p)) {
        fs.delete(tmp, true)
        if (!fs.exists(success))
          throw new IllegalStateException(s"artifact publish failed: $p")
      }
    }
    spark.read.parquet(p.toString)
  }
}
