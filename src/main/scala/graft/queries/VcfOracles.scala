package graft.queries

/** DuckDB oracle SQL for the VCF-domain queries (+ p09_lang_id).
  *
  * Each file under resources/oracles/ is a standalone DuckDB statement
  * that re-derives the query's expected output relationally from the SAME
  * public inputs the Spark query reads — the reference fixtures under
  * /root/reference/tests/fixtures (read with a line-mode `read_csv` +
  * `string_split` on tabs, since header lines start with '#') or the
  * deterministic /tmp fixtures the queries write. The interesting
  * operators are reproduced in pure SQL: multi-allelic decomposition
  * (`unnest`), Number=A/G INFO slicing, FORMAT genotype parsing, the HWE
  * exact test (lgamma closed form over `generate_series` — same
  * distribution the Wigginton recursion computes), vt normalization
  * (recursive CTE), SnpEff ANN worst-consequence ranking, priority
  * variant matching, the md5-derived surrogate ids, and the SHA-256 audit
  * chain.
  */
object VcfOracles {

  val names: Seq[String] = Seq(
    "vcf_scan_decompose", "vcf_gz_scan", "vcf_filter_expression",
    "vcf_validate_dups", "vcf_genotypes", "vcf_variant_qc", "vcf_sample_qc",
    "vcf_denovo_antijoin", "vcf_qc_summary", "vcf_inheritance",
    "vcf_prs_score", "vcf_hapmap3_flag", "vcf_pgs_match", "vcf_export_plink",
    "vcf_ld_blocks", "vcf_ld_blocks_binned", "vcf_popmax",
    "vcf_worst_consequence", "vcf_audit_chain",
    "vcf_normalize", "vcf_annotation_join", "vcf_compound_het_impact",
    "vcf_header_info", "vcf_gwas_match", "vcf_imputation", "vcf_clinvar",
    "vcf_dosage", "vcf_csq_scan", "vcf_sv_scan",
    "vcf_partition_stats", "vcf_genotype_stats", "vcf_pgs_listing",
    "vcf_prs_candidates", "vcf_file_hash", "vcf_info_score_filter",
    "vcf_upsert", "vcf_reload_ledger", "vcf_multi_file_cohort",
    "vcf_import_replace",
    "vcf_export_ldpred2",
    "vcf_filter_split", "vcf_toml_config", "vcf_synthetic_scan",
    "vcf_store_roundtrip", "vcf_tsv_roundtrip", "vcf_sample_join",
    "vcf_gene_index", "vcf_rsid_index",
    "p09_lang_id", "p07_minhash_pairs", "p08_simhash_pairs",
    "p10_doc_fingerprint", "p11_media_features", "p12_embedding_neardup",
    "p13_lsh_topk", "p14_ivf_topk", "p15_dedup_clusters", "p16_dedup_keep",
    "p17_minhash_pairs_staged", "p18_embedding_neardup_capped",
    "p19_simhash_pairs_capped", "p20_minhash_pairs_capped",
    "p21_embedding_keep", "p22_embedding_neardup_banded",
    "p23_embedding_neardup_staged")

  private def readResource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing oracle resource: $path")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  lazy val oracle: Map[String, String] =
    names.map(n => n -> readResource(s"/oracles/$n.sql")).toMap
}
