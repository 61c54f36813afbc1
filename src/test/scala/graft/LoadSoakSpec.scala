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
      if (rng.nextBoolean()) flags += "--normalize"
      Graft.run(spark, Array("load", f, "--db", db) ++ flags)
      loaded += f
      reconcile()
    }
    // compaction folds fragmentation without changing content
    val before = spark.read.parquet(s"$db/variants").count()
    Graft.run(spark, Array("compact", "--db", db,
      "--tables", "variants,genotypes,rsid_idx,gene_idx"))
    assert(spark.read.parquet(s"$db/variants").count() == before)
    reconcile()
  }
}
