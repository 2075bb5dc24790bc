package graft.streaming

/** The shared EXACTLY-ONCE bookkeeping for foreachBatch maintainers that
  * publish generation directories ([[AnnServeStream.maintain]],
  * [[PackingStream]]): an applied-batch marker written INSIDE each
  * published generation, scoped to a checkpoint INCARNATION id — batch ids
  * restart from 0 whenever a checkpoint dir is recreated, and a marker
  * from the previous life of the same path must not veto the new stream's
  * first batches (nor may a replayed batch of the same life re-apply).
  * The incarnation id lives inside the checkpoint dir itself, so it
  * survives JVM restarts with the checkpoint and dies with it. */
private[streaming] object Applied {

  /** The incarnation id stored INSIDE the checkpoint dir (Hadoop FS — any
    * scheme): created on first use, reused while the checkpoint lives,
    * regenerated when the checkpoint is wiped. */
  def incarnationId(spark: org.apache.spark.sql.SparkSession,
                    checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "graft_incarnation")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](256)
        var n = in.read(tmp)
        while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    } else {
      val id = java.util.UUID.randomUUID().toString
      val out = fs.create(p, true)
      try out.write(id.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      id
    }
  }

  def write(spark: org.apache.spark.sql.SparkSession, dir: String,
            incarnation: String, batchId: Long): Unit = {
    import spark.implicits._
    Seq((incarnation, batchId)).toDF("incarnation", "batch_id")
      .write.mode("overwrite").parquet(s"$dir/applied")
  }

  /** The generation's applied batch id under `incarnation`; −1 when no
    * marker exists or it belongs to another incarnation. A MISSING marker
    * maps to −1 (AnalysisException — no such path); genuine IO failures
    * propagate and fail the batch so the stream retries — mapping them to
    * −1 would turn a transient read error into a silent double-apply. */
  def read(spark: org.apache.spark.sql.SparkSession, dir: String,
           incarnation: String): Long =
    try {
      val r = spark.read.parquet(s"$dir/applied").first()
      if (r.getString(0) == incarnation) r.getLong(1) else -1L
    } catch {
      case _: org.apache.spark.sql.AnalysisException => -1L
    }

  /** True iff a READABLE marker exists under `dir`, under ANY incarnation
    * — the probe a cumulative sink uses to distinguish "fresh start" from
    * "checkpoint wiped but the published store kept" (where [[read]]'s −1
    * is ambiguous). Path existence alone is NOT enough: a crash mid
    * [[write]] leaves `<dir>/applied` as a committer skeleton
    * (`_temporary`, no footer) that [[read]] maps to −1 — that is our OWN
    * interrupted first write, recoverable by the replay's idempotent
    * overwrite, and must not read as a foreign marker. */
  def exists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean =
    try { spark.read.parquet(s"$dir/applied").first(); true }
    catch {
      case _: org.apache.spark.sql.AnalysisException => false
      case _: java.util.NoSuchElementException => false
    }
}
