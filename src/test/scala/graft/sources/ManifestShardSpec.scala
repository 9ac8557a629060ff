package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Manifest sharding: above [[CommittedTable.InlineMaxParts]] partitions
  * the `_commit` root holds one `shard=` line per shard and the
  * per-partition lines live in immutable `_ms-*` shard files — a publish
  * rewrites only the shards its touched partitions live in (O(touched)
  * metadata writes), and a partition-value read parses the root plus the
  * surviving shards only (O(survivors) planning). Above
  * [[CommittedTable.RootInlineMaxShards]] shard refs the root splits
  * AGAIN (two-level root): one `shardidx=` line per immutable `_msx-*`
  * index file of [[CommittedTable.ShardIdxTarget]] shard lines, so the
  * root stays ~31 lines at 1M partitions and a publish rewrites only the
  * dirty shards' index groups. Small tables keep the single-file inline
  * format, byte-compatible with the pre-sharding protocol. */
class ManifestShardSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-ms-$tag").toString + "/t"

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootLines(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    val in = fs.open(new Path(dir, "_commit"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def shardFiles(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_ms-")).sorted
  }

  private def idxFiles(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_msx-")).sorted
  }

  // 200 partitions, a handful of rows each — comfortably past the
  // inline threshold of 64
  private def wide(n: Int = 200) =
    spark.range(n * 3).select(
      col("id"),
      format_string("p%03d", col("id") % n).as("part"),
      (col("id") * 10).cast("double").as("value"),
      lit(1L).as("version"))

  test("a 200-partition table shards its manifest; read/merge/time-travel " +
      "semantics are unchanged") {
    val dir = freshDir("e2e")
    CommittedTable.write(wide(), dir, "part",
      statsCols = Seq("value"), keyCol = Some("id"),
      versionCol = Some("version"))
    val root = rootLines(dir)
    assert(root.exists(_.startsWith("shard=")), "root must carry shard refs")
    assert(root.exists(_.startsWith("probe=")), "root must carry the probe seg")
    assert(!root.exists(_.startsWith("f=")), "no inline file lists in a sharded root")
    assert(!root.exists(_.startsWith("rows=")), "no inline row counts in a sharded root")
    val nShards = root.count(_.startsWith("shard="))
    assert(nShards === math.ceil(200.0 / CommittedTable.ShardTargetParts).toInt)
    // full read sees everything
    assert(CommittedTable.read(spark, dir).count() === 600L)
    // a partition-value read is pruned AND correct
    val one = CommittedTable.read(spark, dir, Some(Seq("p007")))
    assert(one.select("id").as[Long].collect().toSet === Set(7L, 207L, 407L))
    // metadata count path intact
    assert(CommittedTable.count(spark, dir) === 600L)

    // merge touching ONE partition: only that partition's shard rewrites
    val before = shardFiles(dir)
    CommittedTable.merge(spark, dir,
      Seq((7L, "p007", 777.0, 2L)).toDF("id", "part", "value", "version"),
      "id", "version", "part")
    val after = shardFiles(dir)
    val fresh = after.toSet -- before.toSet
    assert(fresh.size === 1,
      s"one touched partition must rewrite exactly one shard, wrote $fresh")
    // untouched shards carried by REFERENCE (still listed in the new root)
    val root2 = rootLines(dir)
    val referenced = root2.filter(_.startsWith("shard="))
      .map(_.stripPrefix("shard=").split('\t').head)
    assert(referenced.count(before.contains) === nShards - 1)
    // content correct after the merge
    assert(CommittedTable.read(spark, dir, Some(Seq("p007")))
      .filter(col("id") === 7L).select("value").as[Double].head() === 777.0)
    assert(CommittedTable.read(spark, dir).count() === 600L)
    // time travel to gen 1 serves the pre-merge content (anchor roots
    // reference the carried shard files)
    assert(CommittedTable.readAt(spark, dir, 1L)
      .filter(col("id") === 7L).select("value").as[Double].head() === 70.0)
    // SQL path: schema via the probe line, pruned scan, metadata COUNT(*)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$dir`")
      .collect().head.getLong(0) === 600L)
    assert(spark.sql(
      s"SELECT CAST(SUM(id) AS BIGINT) FROM graft.`$dir` WHERE part = 'p003'")
      .collect().head.getLong(0) === 3L + 203L + 403L)
  }

  test("pruned hydration: a partition probe parses only the shard that " +
      "can hold it; publishes refuse partial manifests") {
    val dir = freshDir("pruned")
    CommittedTable.write(wide(), dir, "part", keyCol = Some("id"),
      versionCol = Some("version"))
    val fs = fsOf(dir)
    val table = new Path(dir)
    val pruned = CommittedTable.readManifestPruned(fs, table, Set("p007")).get
    assert(pruned.partial)
    assert(pruned.segments.contains("p007"))
    assert(pruned.segments.size <= CommittedTable.ShardTargetParts,
      s"a one-value probe must hydrate at most one shard's partitions, " +
        s"got ${pruned.segments.size}")
    // a probed value that does not exist hydrates nothing and reads empty
    val missing = CommittedTable.readManifestPruned(fs, table, Set("zzz")).get
    assert(missing.segments.isEmpty)
    assert(CommittedTable.read(spark, dir, Some(Seq("zzz"))).count() === 0L)
    // the partial manifest can never publish
    val e = intercept[IllegalArgumentException] {
      CommittedTable.swapManifest(spark.sparkContext.hadoopConfiguration,
        table, pruned.copy(gen = pruned.gen + 1))
    }
    assert(e.getMessage.contains("partially-hydrated"))
  }

  test("O(touched) publish and O(survivors) parse on a synthetic " +
      "100k-file manifest — no data files needed") {
    val dir = freshDir("synth")
    val fs = fsOf(dir)
    val table = new Path(dir)
    fs.mkdirs(table)
    val n = 100000
    val parts = (0 until n).map(i => f"p$i%06d")
    val segs = parts.map(v => v -> s"seg-g1-aaaaaaaa-$v").toMap
    val m = CommittedTable.Manifest(
      gen = 1L, cols = Seq("id", "part"), segments = segs, retain = 2,
      rowCounts = parts.map(_ -> 3L).toMap,
      files = segs.values.map(s => s -> Seq(("part-0.parquet", 1000L))).toMap,
      partitionCol = Some("part"))
    CommittedTable.swapManifest(spark.sparkContext.hadoopConfiguration,
      table, m)
    val rootSize = fs.getFileStatus(new Path(dir, "_commit")).getLen
    val shards1 = shardFiles(dir)
    val totalShardBytes = shards1.map(f =>
      fs.getFileStatus(new Path(dir, f)).getLen).sum
    val nShards = math.ceil(
      n.toDouble / CommittedTable.ShardTargetParts).toInt
    assert(shards1.size === nShards)
    // 100k partitions ⇒ 1,563 shards > RootInlineMaxShards: the root
    // goes TWO-LEVEL — shardidx= lines only, one per index group
    assert(nShards > CommittedTable.RootInlineMaxShards)
    val root1 = rootLines(dir)
    assert(!root1.exists(_.startsWith("shard=")),
      "a two-level root must not inline shard refs")
    assert(root1.count(_.startsWith("shardidx=")) ===
      math.ceil(nShards.toDouble / CommittedTable.ShardIdxTarget).toInt)
    assert(idxFiles(dir).size === root1.count(_.startsWith("shardidx=")))
    // the root is a small fraction of the full metadata
    assert(rootSize < totalShardBytes / 10,
      s"root $rootSize vs shards $totalShardBytes")

    // publish #2 touches ONE partition: new metadata bytes are O(touched)
    val m1 = CommittedTable.readManifest(fs, table).get
    val touched = "p012345"
    val m2 = m1.copy(gen = 2L,
      segments = m1.segments + (touched -> s"seg-g2-bbbbbbbb-$touched"),
      rowCounts = m1.rowCounts + (touched -> 4L),
      files = m1.files +
        (s"seg-g2-bbbbbbbb-$touched" -> Seq(("part-0.parquet", 1100L))))
    val idx1 = idxFiles(dir)
    CommittedTable.swapManifest(spark.sparkContext.hadoopConfiguration,
      table, m2)
    val shards2 = shardFiles(dir)
    val freshShards = shards2.toSet -- shards1.toSet
    assert(freshShards.size === 1,
      s"one touched partition ⇒ one rewritten shard, got ${freshShards.size}")
    // …and exactly ONE index group rewritten (the dirty shard's owner);
    // the other groups carry by reference
    val freshIdx = idxFiles(dir).toSet -- idx1.toSet
    assert(freshIdx.size === 1,
      s"one dirty shard ⇒ one rewritten index group, got ${freshIdx.size}")
    // publish metadata writes = the ONE rewritten shard + the root copies
    // (tmp/anchor/prev — O(#shards) lines each, ~1% of the full
    // manifest); the inline protocol would have rewritten all 9.3 MB
    // three times over
    val newBytes = freshShards.toSeq.map(f =>
      fs.getFileStatus(new Path(dir, f)).getLen).sum +
      3 * fs.getFileStatus(new Path(dir, "_commit")).getLen
    assert(newBytes < totalShardBytes / 20,
      s"publish wrote $newBytes metadata bytes; full manifest is $totalShardBytes")

    // O(survivors) parse: a 3-value probe hydrates ≤ 3 shards' partitions
    val pruned = CommittedTable.readManifestPruned(fs, table,
      Set("p000001", "p050000", "p099999")).get
    assert(pruned.partial)
    assert(pruned.segments.size <= 3 * CommittedTable.ShardTargetParts)
    assert(pruned.segments.contains("p050000"))
    // root-only totals: size and row count from the shardidx= aggregates
    // alone — zero index or shard reads
    val root = CommittedTable.readManifestRoot(fs, table).get
    assert(root.partial && root.segments.isEmpty && root.shards.isEmpty)
    assert(root.shardIdx.nonEmpty)
    assert(CommittedTable.rootBytes(root) === 1000L * (n - 1) + 1100L)
    assert(CommittedTable.rootRows(root) === Some(3L * (n - 1) + 4L))
    // full hydration reproduces the whole table
    val full = CommittedTable.readManifest(fs, table).get
    assert(full.segments.size === n)
    assert(full.segments(touched) === s"seg-g2-bbbbbbbb-$touched")
    // GC: a bogus unreferenced aged index file collects; every
    // root-referenced one survives
    val bogus = new Path(dir, "_msx-g0-99-deadbeef")
    val out = fs.create(bogus, true); out.write("shard=x\ta\tb\t1\t1\t-\n"
      .getBytes("UTF-8")); out.close()
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    (idxFiles(dir) :+ bogus.getName).foreach(f =>
      fs.setTimes(new Path(dir, f), old, -1))
    CommittedTable.vacuum(spark, dir)
    assert(!fs.exists(bogus), "unreferenced aged index file must collect")
    val referencedIdx = rootLines(dir).filter(_.startsWith("shardidx="))
      .map(_.stripPrefix("shardidx=").split('\t').head).toSet
    assert(referencedIdx.subsetOf(idxFiles(dir).toSet),
      "every live-root-referenced index file must survive GC")
  }

  test("the 1M-partition rung: root lines stay O(shards / target); one " +
      "dirty shard rewrites one index group — pure layout math, no I/O") {
    // 1M partitions / 64 per shard = 15,625 shard refs — the scale where
    // a one-level root's shard lines become the O(table) publish term
    val nShards = 15625
    val refs = (0 until nShards).map(i =>
      CommittedTable.ShardRef(f"_ms-g1-$i%05d-aaaaaaaa",
        f"p$i%05da", f"p$i%05dz", 64, 64000L, Some(192L)))
    val m = CommittedTable.Manifest(gen = 1L, cols = Seq("id", "part"),
      segments = Map.empty, retain = 2)
    val (tail1, files1) = CommittedTable.rootLayout(m, refs, "nonce111")
    val expectGroups =
      math.ceil(nShards.toDouble / CommittedTable.ShardIdxTarget).toInt
    assert(tail1.forall(_.startsWith("shardidx=")))
    assert(tail1.size === expectGroups) // 31 root lines for 1M partitions
    assert(files1.size === expectGroups)
    // aggregates survive the grouping exactly
    def parseIdx(l: String): CommittedTable.IndexRef = {
      val a = l.stripPrefix("shardidx=").split('\t')
      CommittedTable.IndexRef(a(0), a(1), a(2), a(3).toInt, a(4).toInt,
        a(5).toLong, if (a(6) == "-") None else Some(a(6).toLong))
    }
    val idxRefs = tail1.map(parseIdx)
    assert(idxRefs.map(_.shardsN).sum === nShards)
    assert(idxRefs.map(_.parts).sum === 64 * nShards)
    assert(idxRefs.flatMap(_.rows).sum === 192L * nShards)
    // publish #2: ONE shard rewritten — 30 groups carry by reference,
    // exactly one index file is written, the root stays 31 lines
    val m2 = m.copy(gen = 2L, shardIdx = idxRefs,
      shardIdxBodies = files1.toMap)
    val refs2 = refs.updated(7777,
      refs(7777).copy(file = "_ms-g2-00000-bbbbbbbb", bytes = 65000L))
    val (tail2, files2) = CommittedTable.rootLayout(m2, refs2, "nonce222")
    assert(files2.size === 1,
      s"one dirty shard ⇒ one rewritten index group, wrote ${files2.size}")
    assert(tail2.size === expectGroups)
    assert(tail2.toSet.intersect(tail1.toSet).size === expectGroups - 1,
      "all untouched index groups must carry by reference")
  }

  test("two-level root end to end over a REAL table: >512 shards from " +
      "real data files; a one-partition publish writes 1 shard + 1 " +
      "index group; reads route through the index path") {
    // 33,024 partitions (1 row each) ⇒ 516 shards > RootInlineMaxShards
    // ⇒ the root is born two-level — the smallest REAL table at the
    // rung the synthetic 1M-partition cases exercise metadata-only
    val n = 33024
    val dir = freshDir("real2lvl")
    val t0 = System.nanoTime()
    CommittedTable.write(
      spark.range(n).select(
        col("id"),
        format_string("p%05d", col("id")).as("part"),
        (col("id") * 10).cast("double").as("value")),
      dir, "part")
    val writeSec = (System.nanoTime() - t0) / 1e9
    val nShards = math.ceil(n.toDouble / CommittedTable.ShardTargetParts).toInt
    assert(nShards > CommittedTable.RootInlineMaxShards)
    val root1 = rootLines(dir)
    assert(!root1.exists(_.startsWith("shard=")),
      "a two-level root must not inline shard refs")
    assert(root1.count(_.startsWith("shardidx=")) ===
      math.ceil(nShards.toDouble / CommittedTable.ShardIdxTarget).toInt)
    val fs = fsOf(dir)
    val shards1 = shardFiles(dir)
    assert(shards1.size === nShards)
    val idx1 = idxFiles(dir)
    val totalShardBytes = shards1.map(f =>
      fs.getFileStatus(new Path(dir, f)).getLen).sum

    // a REAL one-partition publish: data + metadata both O(touched)
    val touched = "p00777"
    CommittedTable.overwritePartitions(
      Seq((777L, touched, 9999.0)).toDF("id", "part", "value"), dir)
    val freshShards = shardFiles(dir).toSet -- shards1.toSet
    val freshIdx = idxFiles(dir).toSet -- idx1.toSet
    assert(freshShards.size === 1,
      s"one touched partition ⇒ one rewritten shard, got $freshShards")
    assert(freshIdx.size === 1,
      s"one dirty shard ⇒ one rewritten index group, got $freshIdx")
    val publishMetaBytes = (freshShards ++ freshIdx).toSeq.map(f =>
      fs.getFileStatus(new Path(dir, f)).getLen).sum +
      3 * fs.getFileStatus(new Path(dir, "_commit")).getLen
    assert(publishMetaBytes < totalShardBytes / 20,
      s"publish wrote $publishMetaBytes metadata bytes; " +
        s"full manifest is $totalShardBytes")
    info(f"write $writeSec%.1f s; full shard metadata $totalShardBytes " +
      f"bytes; one-partition publish metadata $publishMetaBytes bytes " +
      f"(${100.0 * publishMetaBytes / totalShardBytes}%.2f%%)")

    // reads route through the index: a one-value probe resolves its
    // index group, hydrates ONE shard, and serves the updated row
    val pruned = CommittedTable.readManifestPruned(fs, new Path(dir),
      Set(touched)).get
    assert(pruned.partial)
    assert(pruned.segments.size <= CommittedTable.ShardTargetParts)
    assert(CommittedTable.read(spark, dir, Some(Seq(touched)))
      .select("id", "value").as[(Long, Double)].collect().toSet ===
      Set((777L, 9999.0)))
    // root-only totals answer the whole-table count with zero shard reads
    assert(CommittedTable.count(spark, dir) === n.toLong)
    assert(spark.sql(s"SELECT COUNT(*) FROM graft.`$dir`")
      .collect().head.getLong(0) === n.toLong)
  }

  test("small tables stay inline — byte-compatible with the pre-sharding " +
      "format; GC collects unreferenced aged shards, keeps referenced ones") {
    val dir = freshDir("inline")
    val df = Seq((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L))
      .toDF("id", "part", "value", "version")
    CommittedTable.write(df, dir, "part", keyCol = Some("id"),
      versionCol = Some("version"))
    assert(!rootLines(dir).exists(_.startsWith("shard=")))
    assert(shardFiles(dir).isEmpty)

    // GC: age an obsolete shard file of a sharded table and vacuum
    val dir2 = freshDir("gc")
    CommittedTable.write(wide(100), dir2, "part", retainGenerations = 1,
      keyCol = Some("id"), versionCol = Some("version"))
    val before = shardFiles(dir2)
    CommittedTable.merge(spark, dir2,
      Seq((5L, "p005", 5.5, 2L)).toDF("id", "part", "value", "version"),
      "id", "version", "part")
    val after = shardFiles(dir2)
    val fs = fsOf(dir2)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    after.foreach(f => fs.setTimes(new Path(dir2, f), old, -1))
    CommittedTable.vacuum(spark, dir2)
    val survivors = shardFiles(dir2)
    // every shard the LIVE root references survives (even aged); the
    // superseded shard of the touched partition eventually collects —
    // prev-manifest grace may hold it one extra cycle, so assert from
    // the root's reference list, not file counts
    val referenced = rootLines(dir2).filter(_.startsWith("shard="))
      .map(_.stripPrefix("shard=").split('\t').head).toSet
    assert(referenced.subsetOf(survivors.toSet))
    // a second publish + vacuum retires the prev grace: the obsolete
    // gen-1 shard of the touched partition is gone
    CommittedTable.merge(spark, dir2,
      Seq((6L, "p006", 6.6, 3L)).toDF("id", "part", "value", "version"),
      "id", "version", "part")
    shardFiles(dir2).foreach(f => fs.setTimes(new Path(dir2, f), old, -1))
    CommittedTable.vacuum(spark, dir2)
    val refs2 = rootLines(dir2).filter(_.startsWith("shard="))
      .map(_.stripPrefix("shard=").split('\t').head).toSet
    // _commit.prev (the one-cycle reader grace) also pins its shards
    val prevRefs = {
      val in = fs.open(new Path(dir2, "_commit.prev"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
        .filter(_.startsWith("shard="))
        .map(_.stripPrefix("shard=").split('\t').head).toSet
      finally in.close()
    }
    assert(shardFiles(dir2).toSet === (refs2 ++ prevRefs),
      "after grace expiry, exactly the live- and prev-referenced shards remain")
    // content still exact (both merges upserted EXISTING keys)
    assert(CommittedTable.read(spark, dir2).count() === 300L)
    assert(CommittedTable.read(spark, dir2, Some(Seq("p006")))
      .filter(col("id") === 6L).select("value").as[Double].head() === 6.6)
  }

  test("a legacy inline manifest above the threshold re-shards on its " +
      "next publish; content identical across the transition") {
    val dir = freshDir("legacy")
    // force the pre-sharding layout for a 100-partition table by
    // publishing a hand-built inline manifest: write small, then grow
    CommittedTable.write(wide(100), dir, "part", keyCol = Some("id"),
      versionCol = Some("version"))
    // (written sharded — simulate legacy by collapsing to inline bytes)
    val fs = fsOf(dir)
    val table = new Path(dir)
    val full = CommittedTable.readManifest(fs, table).get
    val inline = full.copy(shards = Nil, shardBodies = Map.empty,
      partial = false)
    // bypass swapManifest's sharding by writing the inline body directly
    val body = {
      val mtd = classOf[CommittedTable.type]
        .getDeclaredMethods.find(_.getName == "manifestBody").get
      mtd.setAccessible(true)
      mtd.invoke(CommittedTable, inline).asInstanceOf[String]
    }
    // legacy tables carried inline anchors too — rewrite both before
    // dropping the shard files
    Seq("_commit", "_commit.g1").foreach { name =>
      val out = fs.create(new Path(table, name), true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    shardFiles(dir).foreach(f => fs.delete(new Path(dir, f), false))
    assert(!rootLines(dir).exists(_.startsWith("shard=")))
    assert(CommittedTable.read(spark, dir).count() === 300L)
    // next publish re-shards the whole manifest once
    CommittedTable.merge(spark, dir,
      Seq((5L, "p005", 5.5, 2L)).toDF("id", "part", "value", "version"),
      "id", "version", "part")
    assert(rootLines(dir).exists(_.startsWith("shard=")))
    assert(CommittedTable.read(spark, dir).count() === 300L)
    assert(CommittedTable.read(spark, dir, Some(Seq("p005")))
      .filter(col("id") === 5L).select("value").as[Double].head() === 5.5)
  }
}
