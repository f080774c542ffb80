package graft

import java.io.File
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 (r9 verdict item 5): stale fingerprinted warehouse
  * artifacts are garbage-collected. Every artifact now carries a
  * `_graft_meta` provenance sidecar (corpus dir, base tables, hash
  * salt); a build MISS triggers a sweep that drops any artifact
  * whose recorded corpus no longer fingerprints to the hash in its
  * name — the regenerate-the-corpus-forever leak (r9: 341 MB of
  * dead `graft_*` variants from prior corpus generations).
  */
class WarehouseGcSpec extends AnyFunSuite {
  import TestSpark._

  private def warehouseDir: File = {
    val raw = spark.conf.get("spark.sql.warehouse.dir")
    new File(new java.net.URI(raw).getPath)
  }

  private def artifacts(prefix: String): Set[String] =
    Option(warehouseDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .map(_.getName).toSet

  private def rmTree(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree); f.delete()
  }

  test("regenerating the corpus collects the stale artifact on re-stage") {
    // start clean: a PREVIOUS session's run of this test leaves its
    // temp corpus alive in /tmp, so its artifact is legitimately
    // non-stale and would make the size-1 asserts below read 2
    // (observed when the suite ran twice in one sandbox)
    artifacts("graft_gcspec_").foreach(n => rmTree(new File(warehouseDir, n)))
    val corpusDir = Files.createTempDirectory("graft_gc_corpus").toFile
    val corpus = corpusDir.getAbsolutePath
    try {
      spark.range(10).toDF("x").write.parquet(s"$corpus/t.parquet")
      def stage() = graft.sources.Warehouse
        .staged(spark, corpus, "gcspec", Seq("t.parquet")) {
          spark.read.parquet(s"$corpus/t.parquet")
        }
      assert(stage().count() === 10)
      val a1 = artifacts("graft_gcspec_")
      assert(a1.size === 1, s"expected one artifact, saw $a1")
      // the sidecar provenance must exist (it is what makes GC possible)
      assert(new File(warehouseDir, s"${a1.head}/_graft_meta").exists())
      // regenerate the corpus in place: size changes => new fingerprint
      Thread.sleep(1100) // mtime granularity guard
      spark.range(25).toDF("x").write.mode("overwrite").parquet(s"$corpus/t.parquet")
      assert(stage().count() === 25)
      val a2 = artifacts("graft_gcspec_")
      assert(a2.size === 1 && a2 != a1,
        s"stale artifact survived the rebuild sweep: $a1 -> $a2")
    } finally rmTree(corpusDir)
    // with the corpus gone the surviving artifact is stale; leave the
    // warehouse as we found it (and prove deleted-corpus staleness
    // again on the way out)
    graft.sources.Warehouse.gcStale(spark)
    assert(artifacts("graft_gcspec_").isEmpty)
  }

  test("metaless complete artifacts (pre-provenance) are collected") {
    val legacy = new File(warehouseDir, "graft_gclegacy_deadbeef")
    legacy.mkdirs()
    Files.writeString(new File(legacy, "_SUCCESS").toPath, "")
    graft.sources.Warehouse.gcStale(spark)
    assert(!legacy.exists(), "metaless complete artifact must be dropped")
  }

  test("half-built artifacts (no _SUCCESS) are left for their builder") {
    val half = new File(warehouseDir, "graft_gchalf_deadbeef")
    half.mkdirs()
    Files.writeString(new File(half, "part-0.parquet").toPath, "x")
    graft.sources.Warehouse.gcStale(spark)
    assert(half.exists(), "in-flight build must not be swept")
    // cleanup so reruns start clean
    new File(half, "part-0.parquet").delete(); half.delete()
  }

  test("an artifact whose corpus dir is gone is stale") {
    val corpus = Files.createTempDirectory("graft_gc_gone").toFile.getAbsolutePath
    spark.range(5).toDF("x").write.parquet(s"$corpus/t.parquet")
    graft.sources.Warehouse
      .staged(spark, corpus, "gcgone", Seq("t.parquet")) {
        spark.read.parquet(s"$corpus/t.parquet")
      }.count()
    assert(artifacts("graft_gcgone_").size === 1)
    // delete the corpus, then sweep
    def rm(f: File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete()
    }
    rm(new File(corpus))
    graft.sources.Warehouse.gcStale(spark)
    assert(artifacts("graft_gcgone_").isEmpty,
      "artifact of a deleted corpus must be collected")
  }
}
