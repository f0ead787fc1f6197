package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import scala.collection.JavaConverters._

/** Small-file compaction for feather part directories — the maintenance job
  * every streaming sink needs at scale. A drop-directory sink landing one
  * part per trigger produces thousands of small files per day; scans then
  * pay a footer read and a tiny record batch per file, and the driver's
  * planning cost grows linearly in file count. Compaction bin-packs
  * neighboring small parts into files near `targetBytes` and swaps them in
  * with file-level exactly-once semantics (the reference's ecosystem solves
  * this one layer up, in table formats; a bare directory needs the job
  * itself).
  *
  * Scale design:
  *  - grouping is name-ordered greedy first-fit on the driver (listing
  *    only — no data read); single-file groups are never rewritten, so a
  *    second run over a compacted directory is a no-op;
  *  - each multi-file group is rewritten by ONE executor task (decode →
  *    re-encode through [[GraftFeather.FeatherPartWriter]], which also
  *    regenerates the skipping-index sidecar), groups run in parallel;
  *  - hive-style `key=value` leaves compact independently — partition
  *    values live in directory names, so rows never cross leaves;
  *  - the swap is crash-safe via a manifest: `_compact/<out>.json` listing
  *    the inputs is written BEFORE the output rename, and deleted after the
  *    inputs are. Recovery on the next run completes a half-done swap
  *    (output present → delete leftover inputs) or discards a half-written
  *    output (no rename happened → inputs intact, group re-planned).
  *    Output names are deterministic (group id + hash of input names), so
  *    recovery and re-runs converge.
  *
  * NOT safe to run concurrently with another writer of the same leaf, or
  * under a name-based streaming consumer ([[graft.sources.DropDirectoryStream]]
  * tracks processed file NAMES — a compacted output is a new name and
  * would replay; the same caveat applies to Spark's FileStreamSource).
  */
object FeatherCompact {

  /** What a run did: inputs/outputs counted over every leaf. */
  case class Result(leaves: Int, groupsRewritten: Int,
                    filesBefore: Int, filesAfter: Int)

  private case class Group(leaf: String, gid: Int, inputs: Seq[(String, Long)]) {
    // deterministic output name: re-planning the same inputs reproduces it,
    // so a crashed run's recovery and the re-run agree on the target
    def outName: String = {
      val h = inputs.map(_._1).hashCode() & 0x7fffffff
      f"compact-$gid%05d-$h%08x.feather"
    }
  }

  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              codec: String = "lz4", batchSize: Int = 4096): Result = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"FeatherCompact: $path does not exist")

    // leaves = every directory that directly holds .feather parts (the
    // bare dir itself, or hive key=value leaves from the partitioned sink)
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Path]
    def walk(dir: Path): Unit = {
      val entries = fs.listStatus(dir)
      if (entries.exists(e => !e.isDirectory &&
          e.getPath.getName.endsWith(".feather") &&
          !e.getPath.getName.startsWith(".")))
        leaves += dir
      entries.filter(e => e.isDirectory && !e.getPath.getName.startsWith("_"))
        .foreach(e => walk(e.getPath))
    }
    walk(root)

    var groupsRewritten = 0
    var filesBefore = 0
    var filesAfter = 0
    leaves.foreach { leaf =>
      recover(fs, leaf)
      val files = fs.listStatus(leaf).iterator
        .filter(e => !e.isDirectory)
        .map(_.getPath)
        .filter(p => p.getName.endsWith(".feather") && !p.getName.startsWith("."))
        .map(p => (p.toString, fs.getFileStatus(p).getLen))
        .toSeq.sortBy(_._1)
      filesBefore += files.size

      // greedy first-fit in name order; a group of ONE is left untouched
      val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var accBytes = 0L
      def close(): Unit = {
        if (acc.size > 1) groups += Group(leaf.toString, groups.size, acc.toSeq)
        acc.clear(); accBytes = 0L
      }
      files.foreach { case (f, len) =>
        if (acc.nonEmpty && accBytes + len > targetBytes) close()
        acc += ((f, len)); accBytes += len
        if (accBytes >= targetBytes) close()
      }
      close()

      if (groups.nonEmpty) {
        val schema = StructType(GraftFeather.readFields(spark, groups.head.inputs.head._1)
          .map(f => org.apache.spark.sql.types.StructField(
            f.getName, GraftFeather.toSparkType(f), f.isNullable)))
        val confMap = GraftHadoop.confBroadcast(spark)
        val codecN = codec
        val bsz = batchSize
        // one task per group; the task writes a HIDDEN tmp and returns the
        // batch stats — the driver owns the commit protocol
        val written = spark.sparkContext
          .parallelize(groups.toSeq, groups.size)
          .map { g =>
            val execConf = new org.apache.hadoop.conf.Configuration(false)
            confMap.value.foreach { case (k, v) => execConf.set(k, v) }
            val lfs = new Path(g.leaf).getFileSystem(execConf)
            val tmp = new Path(g.leaf, s".${g.outName}.tmp")
            val pw = new GraftFeather.FeatherPartWriter(
              schema, lfs.create(tmp, true), codecN, bsz)
            val readers = scala.collection.mutable.ArrayBuffer
              .empty[org.apache.arrow.vector.ipc.ArrowFileReader]
            try {
              g.inputs.foreach { case (f, len) =>
                // footer first for the batch count, then every batch
                val nBatches = {
                  val r = GraftFeather.openReader(execConf, f, len)
                  try r.getRecordBlocks.size()
                  finally r.close()
                }
                GraftFeather.splitRows(execConf, f, len, 0 until nBatches,
                  schema.fieldNames.toSeq, readers += _)
                  .foreach(pw.append)
                // retire each input's reader as soon as it drains — a
                // group of thousands of tiny files must not hold every
                // file's buffers until the group ends
                readers.foreach(r => try r.close() catch { case _: Exception => () })
                readers.clear()
              }
              pw.finish()
              (g.gid, FeatherStats.toJson(pw.batchStats))
            } catch {
              case e: Throwable =>
                pw.abort()
                try lfs.delete(tmp, false) catch { case _: Exception => () }
                throw e
            } finally readers.foreach(r =>
              try r.close() catch { case _: Exception => () })
          }.collect().toMap

        groups.foreach { g =>
          val lfs = new Path(g.leaf).getFileSystem(conf)
          val out = new Path(g.leaf, g.outName)
          val tmp = new Path(g.leaf, s".${g.outName}.tmp")
          // 1. manifest first: from here a crash is recoverable
          writeManifest(lfs, new Path(g.leaf), g)
          // 2. output becomes visible (complete file, atomic rename)
          require(lfs.rename(tmp, out), s"rename $tmp -> $out failed")
          val sc = lfs.create(new Path(g.leaf, g.outName + ".stats.json"), true)
          try sc.write(written(g.gid).getBytes("UTF-8"))
          finally sc.close()
          // 3. inputs retire; 4. manifest retires
          g.inputs.foreach { case (f, _) =>
            lfs.delete(new Path(f), false)
            lfs.delete(new Path(f + ".stats.json"), false)
          }
          lfs.delete(manifestPath(new Path(g.leaf), g.outName), false)
          groupsRewritten += 1
        }
      }
      filesAfter += fs.listStatus(leaf).count(e => !e.isDirectory &&
        e.getPath.getName.endsWith(".feather") && !e.getPath.getName.startsWith("."))
    }
    Result(leaves.size, groupsRewritten, filesBefore, filesAfter)
  }

  private def manifestPath(leaf: Path, outName: String): Path =
    new Path(new Path(leaf, "_compact"), outName + ".json")

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
                            leaf: Path, g: Group): Unit = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.createObjectNode()
    node.put("output", g.outName)
    val arr = node.putArray("inputs")
    g.inputs.foreach { case (f, _) => arr.add(new Path(f).getName) }
    fs.mkdirs(new Path(leaf, "_compact"))
    val out = fs.create(manifestPath(leaf, g.outName), true)
    try out.write(m.writeValueAsString(node).getBytes("UTF-8"))
    finally out.close()
  }

  /** Completes or discards swaps a crashed run left behind. Idempotent. */
  private def recover(fs: org.apache.hadoop.fs.FileSystem, leaf: Path): Unit = {
    val dir = new Path(leaf, "_compact")
    if (!fs.exists(dir)) return
    fs.listStatus(dir).filter(_.getPath.getName.endsWith(".json")).foreach { st =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val in = fs.open(st.getPath)
      val node =
        try m.readTree(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        finally in.close()
      val out = new Path(leaf, node.get("output").asText())
      if (fs.exists(out)) {
        // crash happened between rename and input deletion: finish retiring
        val it = node.get("inputs").elements()
        while (it.hasNext) {
          val name = it.next().asText()
          fs.delete(new Path(leaf, name), false)
          fs.delete(new Path(leaf, name + ".stats.json"), false)
        }
      } else {
        // crash before the rename: inputs are intact, drop the half-write
        fs.delete(new Path(leaf, s".${out.getName}.tmp"), false)
      }
      fs.delete(st.getPath, false)
    }
  }
}
