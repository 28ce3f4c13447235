package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** C-series registry: training-data pipeline operators (SURVEY.md §2.C)
  * with their DuckDB oracles. C3 shares C2's oracle (the LSH path must
  * reproduce the exact near-dup pair set); C4/C7/C11 are rows-only
  * (non-SQL-expressible hashes) and spec-tested in graft.ops.*Spec. */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (Dedup.dedupMinhashLsh _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_embedding" -> (Dedup.dedupEmbedding _),
    "ann_bruteforce" -> (Ann.annBruteforce _),
    "ann_lsh" -> (Ann.annLsh _),
    "ann_ivf" -> (Ann.annIvf _),
    "text_langid" -> (TextOps.textLangid _),
    "text_quality" -> (TextOps.textQuality _),
    "text_tokens" -> (TextOps.textTokens _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_scrub" -> (TextOps.textScrub _),
    "mm_manifest" -> (Multimodal.mmManifest _),
    "mm_frames" -> (Multimodal.mmFrames _))

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash_lsh" -> Dedup.dedupNgramJaccardSql,
    "dedup_embedding" -> Dedup.dedupEmbeddingSql,
    "ann_bruteforce" -> Ann.annBruteforceSql,
    "text_langid" -> TextOps.textLangidSql,
    "text_quality" -> TextOps.textQualitySql,
    "text_tokens" -> TextOps.textTokensSql,
    "text_scrub" -> TextOps.textScrubSql,
    "mm_manifest" -> Multimodal.mmManifestSql,
    "mm_frames" -> Multimodal.mmFramesSql)
}
