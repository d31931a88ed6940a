package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-text sidecar IO through the Hadoop FileSystem API — the ONE
  * way every store sidecar (`_quantizer`, `_srp_params`,
  * `_sig_params`, `_order_meta`) reads and writes its file.
  *
  * Why Hadoop FS and not `java.io.File`: the store path is a
  * production URI (hdfs://, s3a://, file://), and a `java.io.File`
  * over such a path silently normalizes to a junk LOCAL path — writes
  * "succeed" into the driver's cwd and reads return None, so a
  * geometry pin (the silent-recall-0 guard) would be silently inert
  * exactly where it matters (the round-15 streaming review's top
  * finding; [[TextIngest.batchPartitionDirs]] documents the same
  * defect class for listings).
  *
  * Write discipline: tmp file in the sidecar directory, then
  * delete-dest + rename — a reader concurrent with the swap sees the
  * OLD file or (in the delete-to-rename window) NO file, never a torn
  * one. "No file" readers take their documented absent-sidecar
  * fallback, which every sidecar defines; a truncate-in-place write
  * (the previous `_order_meta` shape) instead fed them a HALF file
  * that parses as garbage. Rename is atomic on HDFS and local
  * filesystems; object stores emulate it per-object, which suffices
  * for a single small file. */
private[streaming] object Sidecars {

  /** ONE FileSystem getter for the whole streaming store layer —
    * sidecars, partition listings, stale-dir deletes, and marker
    * files must all resolve a store path through the SAME conf, or a
    * session-level fs override would split the store across two
    * filesystems (the Avro-sink lesson). Session conf: it carries
    * spark.hadoop.* overrides and is what the stores' own DataFrame
    * writes resolve against. The clone-per-call cost is one driver-
    * side Configuration copy per store operation — noise beside the
    * Spark actions around it. */
  private[streaming] def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Write `body` to `file` (full path under the store), replacing any
    * previous content via the tmp + rename swap above. */
  def write(spark: SparkSession, file: String, body: String): Unit = {
    val dest = new Path(file)
    val f = fs(spark, dest)
    f.mkdirs(dest.getParent)
    val tmp = new Path(dest.getParent, "." + dest.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    f.delete(dest, false)
    require(f.rename(tmp, dest),
      s"sidecar swap $tmp -> $dest failed — refusing to leave a stale pin")
    ()
  }

  /** The sidecar's full content, or None when absent (including the
    * mid-swap window — callers take their absent fallback). The
    * exists/open pair races the writer's delete-to-rename window, so
    * a FileNotFoundException from open IS the absent case, not an
    * error (round-15 review: without the catch, a reader timed
    * exactly into the swap crashed where the contract promises the
    * fallback). */
  def read(spark: SparkSession, file: String): Option[String] = {
    val dest = new Path(file)
    val f = fs(spark, dest)
    if (!f.exists(dest)) None
    else {
      val in = try f.open(dest) catch {
        case _: java.io.FileNotFoundException => null
      }
      if (in == null) None
      else try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, "UTF-8"))
      } finally in.close()
    }
  }
}
