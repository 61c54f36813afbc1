package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Randomized end-to-end soak of the load pipeline: a seeded sequence of
  * loads and force-reloads over a small cohort (mixed genotyped /
  * sample-less / --normalize / annotated files) must keep the ledger,
  * the store, and both covering projections reconciled after EVERY
  * operation — per-file store counts equal to the ledger's per-batch
  * counts equal to an independent parse count, `validate` clean, and a
  * final compact changing nothing. The concurrency in the load verb
  * (genotype thread + variants parse, three concurrent table writes)
  * makes sequence-level invariants worth soaking beyond the per-feature
  * specs: any lost/duplicated batch, stale projection, or orphaned
  * genotype from an unlucky interleaving shows up here as a count or
  * validate mismatch. */
class LoadSoakSpec extends SparkSpec {
  import spark.implicits._

  test("randomized load/force-reload sequences stay reconciled (seeded)") {
    val rng = new scala.util.Random(20260814L)
    val db = Files.createTempDirectory("soakdb").toString
    val dir = Files.createTempDirectory("soakvcf")
    // four files spanning the load shapes: genotyped, sample-less,
    // annotated, normalized-on-load
    val files = (0 until 4).map { i =>
      val p = dir.resolve(s"f$i.vcf").toString
      graft.vcf.SyntheticVcf.write(p, 500 + 100 * i,
        samples = if (i == 1) Seq.empty else Seq("S1", "S2"),
        seed = 500L + i, annFrac = if (i % 2 == 0) 0.4 else 0.0)
      p
    }
    // independent expectation: the decomposed row count per file (the
    // parse surface is itself oracle-checked; here it anchors the verb)
    val expected = files.map(p =>
      p -> graft.vcf.VcfReader.variants(spark, p).count()).toMap
    val loaded = scala.collection.mutable.Set[String]()

    def reconcile(): Unit = {
      if (loaded.isEmpty) return
      val ledger = spark.read.parquet(s"$db/ledger")
        .filter($"status" === "completed")
        .orderBy($"completed_at".desc)
        .select($"file_path", $"load_batch_id", $"n_variants")
        .collect()
      // latest completed batch per file is the live one
      val live = ledger.groupBy(_.getString(0)).map { case (f, rows) =>
        f -> ((rows.head.getString(1), rows.head.getLong(2)))
      }
      assert(live.keySet == loaded.toSet,
        s"ledger files ${live.keySet} != loaded $loaded")
      val storeCounts = spark.read.parquet(s"$db/variants")
        .groupBy($"load_batch_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      live.foreach { case (f, (batch, n)) =>
        assert(n == expected(f), s"$f: ledger $n != parse ${expected(f)}")
        assert(storeCounts.getOrElse(batch, 0L) == expected(f),
          s"$f: store ${storeCounts.get(batch)} != parse ${expected(f)}")
      }
      // no rows from dead (force-reloaded) batches survive
      assert(storeCounts.keySet == live.values.map(_._1).toSet,
        s"store batches ${storeCounts.keySet} != live ${live.values.map(_._1)}")
      // whole-db reconciliation must be clean
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        Graft.run(spark, Array("validate", "--db", db))
      }
      val s = out.toString
      assert(!s.contains("MISMATCH") && !s.contains("STALE"), s)
    }

    (0 until 8).foreach { _ =>
      val f = files(rng.nextInt(files.length))
      val flags = scala.collection.mutable.ArrayBuffer[String]()
      if (loaded.contains(f)) flags += "--force-reload"
      if (rng.nextBoolean()) flags += "--no-normalize"
      // mixed genotype storage across batches (and across force-reloads
      // of the SAME file — the drop-without-restore arm) is the
      // realistic cohort shape now that storage is opt-in
      if (rng.nextBoolean()) flags += "--store-genotypes"
      Graft.run(spark, Array("load", f, "--db", db) ++ flags)
      loaded += f
      // matview refreshes interleave with loads in real operation; a
      // refresh must neither corrupt the store nor leave an unreadable
      // view directory on a store whose QC/flag columns are young
      if (rng.nextDouble() < 0.3) {
        Graft.run(spark, Array("refresh-views", "--db", db))
        val vd = new java.io.File(s"$db/views")
        if (vd.isDirectory)
          vd.listFiles().filter(_.isDirectory).foreach { v =>
            spark.read.parquet(v.getPath).count() // readable, any count
          }
      }
      reconcile()
    }
    // compaction folds fragmentation without changing content
    val before = spark.read.parquet(s"$db/variants").count()
    Graft.run(spark, Array("compact", "--db", db,
      "--tables", "variants,genotypes,rsid_idx,gene_idx"))
    assert(spark.read.parquet(s"$db/variants").count() == before)
    reconcile()
  }

  test("driver-side probes never lose committed rows while loads append concurrently") {
    // the serving face's listing cache promotes only SETTLED listings
    // (two identical observations) and same-JVM writers invalidate it —
    // this soak drives both from different threads at once: a reader
    // hammering point/genotype probes on batch-1 keys while a writer
    // thread appends three more cohort files and force-reloads one.
    // Committed batch-1 rows must be present in EVERY probe answer —
    // a stale or half-settled listing that DROPS previously-committed
    // files would surface here as a missing row, and any probe
    // exception (listed-then-dropped file, torn footer cache) fails the
    // test via the recorded error.
    val db = Files.createTempDirectory("probedb").toString
    val dir = Files.createTempDirectory("probevcf")
    val base = dir.resolve("base.vcf").toString
    graft.vcf.SyntheticVcf.write(base, 800, seed = 900L)
    Graft.run(spark, Array("load", base, "--db", db, "--store-genotypes"))

    val probeRows = spark.read.parquet(s"$db/variants")
      .filter($"chrom" === "chr1")
      .select($"pos").orderBy($"pos").limit(5)
      .collect().map(_.getLong(0))
    val batch1 = spark.read.parquet(s"$db/variants")
      .select($"load_batch_id").head().getString(0)
    val genoProbe = spark.read.parquet(s"$db/genotypes")
      .filter($"chrom" === "chr1").select($"pos").head().getLong(0)

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val probes = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          probeRows.foreach { p =>
            val hit = graft.query.PointLookup.byPosition(
              spark, s"$db/variants", "chr1", p)
            assert(hit.exists(_.get("load_batch_id").contains(batch1)),
              s"probe chr1:$p lost its batch-1 row mid-append: $hit")
          }
          val g = graft.query.PointLookup.genotypesAt(
            spark, s"$db/genotypes", "chr1", genoProbe, genoProbe)
          assert(g.nonEmpty, s"genotype probe chr1:$genoProbe went empty")
          probes.addAndGet(probeRows.length + 1)
        }
      } catch { case t: Throwable => err.set(t) }
    })
    reader.start()
    try {
      (0 until 3).foreach { i =>
        val p = dir.resolve(s"c$i.vcf").toString
        graft.vcf.SyntheticVcf.write(p, 600, seed = 910L + i)
        Graft.run(spark, Array("load", p, "--db", db, "--store-genotypes"))
      }
      // a force-reload of a NON-probed file exercises the drop path
      // (surgical file unlinks) under the reader's nose
      Graft.run(spark, Array("load", dir.resolve("c0.vcf").toString,
        "--db", db, "--force-reload"))
    } finally {
      stop.set(true)
      reader.join(30000)
    }
    if (err.get() != null) throw err.get()
    assert(probes.get() > 0, "reader thread never completed a probe round")
    // final state: all four files' batches live, probes still green
    val hit = graft.query.PointLookup.byPosition(
      spark, s"$db/variants", "chr1", probeRows.head)
    assert(hit.exists(_.get("load_batch_id").contains(batch1)))
  }
}
