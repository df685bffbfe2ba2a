package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Properties of the round-4 curation / quantization / audio operators. The
  * hash-vs-DuckDB gate is the driver's; these pin the pipeline invariants.
  */
class Curation2Spec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dd_paragraph keeps exactly the distinct sentences corpus-wide") {
    val df = q("dd_paragraph").cache()
    try {
      // every doc's sentence count is what its word count implies
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"),
          ((size(split(col("text"), " ")) - 1).cast("long") / 10 + 1)
            .cast("long").as("want"))
      assert(df.join(docs, "doc_id")
        .filter(col("n_sents") =!= col("want")).count() == 0)
      // total kept across the corpus == number of distinct sentences
      val kept = df.agg(sum("n_kept")).collect()(0).getLong(0)
      val distinctSents = spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("words", split(col("text"), " "))
        .select(explode(expr(
          """transform(sequence(0, (size(words) - 1) div 10),
             s -> concat_ws(' ', slice(words, s * 10 + 1, 10)))""")).as("s"))
        .distinct().count()
      assert(kept == distinctSents, s"kept=$kept distinct=$distinctSents")
      assert(df.filter(col("n_kept") > col("n_sents")).count() == 0)
    } finally df.unpersist()
  }

  test("tx_decontam only pairs train with eval, with positive overlap") {
    val rows = q("tx_decontam").collect()
    assert(rows.forall(r => r.getLong(1) % 100 == 0), "eval_id stratum")
    assert(rows.forall(r => r.getLong(0) % 100 != 0), "train stratum")
    assert(rows.forall(r => r.getLong(2) >= 1), "n_shared positive")
  }

  test("tx_pii_scrub: injected docs detected, scrub leaves no residue") {
    val df = q("tx_pii_scrub").cache()
    try {
      assert(df.filter(col("doc_id") % 7 === 0 && col("n_emails") < 1)
        .count() == 0, "every injected email detected")
      assert(df.filter(col("doc_id") % 11 === 0 && col("n_phones") < 1)
        .count() == 0, "every injected phone detected")
      // re-run the scrub pipeline and verify zero remaining matches
      val emailPat = "[a-z0-9]+@[a-z]+\\.[a-z]+"
      val phonePat = "[0-9]{3}-[0-9]{4}"
      val residue = spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("text2", concat(col("text"),
          when(col("doc_id") % 7 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example now"))).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            concat(lit(" call 555-"),
              (col("doc_id") % 9000 + 1000).cast("string"),
              lit(" today"))).otherwise(lit(""))))
        .withColumn("scrubbed", regexp_replace(
          regexp_replace(col("text2"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>"))
        .filter(regexp_count(col("scrubbed"), lit(emailPat)) > 0 ||
          regexp_count(col("scrubbed"), lit(phonePat)) > 0)
      assert(residue.count() == 0)
    } finally df.unpersist()
  }

  test("vec_int8_quant: codes bounded, reconstruction error within bound") {
    val df = q("vec_int8_quant").cache()
    try {
      // |q| <= 127 implies qnorm2 <= 127^2 * 64 for 64-dim vectors
      assert(df.filter(col("qnorm2") > 127L * 127L * 64L).count() == 0)
      // per-dim |127 v - q maxabs| <= maxabs (round-to-nearest), so
      // err2 <= 64 * maxabs^2
      assert(df.filter(
        col("err2") > lit(64L) * col("maxabs") * col("maxabs")).count() == 0)
      assert(df.count() ==
        spark.read.parquet(s"$sf/embeddings.parquet").count())
    } finally df.unpersist()
  }

  test("tx_bm25 ranks 5 terms per doc by strictly ordered score") {
    val df = q("tx_bm25").cache()
    try {
      assert(df.filter(col("rn") < 1 || col("rn") > 5).count() == 0)
      assert(df.filter(col("bm25") <= 0.0).count() == 0)
      // within a doc, rn order must agree with (bm25 DESC, term ASC)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id")
        .orderBy(col("bm25").desc, col("term").asc)
      assert(df.withColumn("rn2", row_number().over(w).cast("long"))
        .filter(col("rn") =!= col("rn2")).count() == 0)
    } finally df.unpersist()
  }

  test("tx_repetition ratios are the exact integer quotients") {
    val df = q("tx_repetition").cache()
    try {
      val bad = df.filter(
        col("top_word_ratio") =!=
          col("max_tf").cast("double") / col("n_words").cast("double") ||
        col("dup_bigram_ratio") =!=
          col("dup_bigrams").cast("double") / col("n_bigrams").cast("double"))
      assert(bad.count() == 0)
      assert(df.filter(col("max_tf") > col("n_words")).count() == 0)
      assert(df.filter(col("dup_bigrams") >= col("n_bigrams")).count() == 0)
    } finally df.unpersist()
  }

  test("st_mm_audio equals the batch mm_audio_meta result") {
    val batch = q("mm_audio_meta").collect().toSet
    val stream = q("st_mm_audio").collect().toSet
    assert(batch == stream)
  }

  test("dd_semantic removes exactly the planted twins, witnessed by source") {
    val rows = q("dd_semantic").collect()
    // every removed vector is a planted jittered twin (id >= 100000) whose
    // lowest-id witness is its own source vector
    assert(rows.forall(_.getLong(0) >= 100000), "only twins removed")
    assert(rows.forall(r => r.getLong(2) == r.getLong(0) - 100000),
      "witness is the twin's source")
    val planted = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 20 === 0).count()
    assert(rows.length == planted, s"all $planted twins caught, got ${rows.length}")
  }

  test("dd_substring: gram counts match doc lengths, flag is the exact test") {
    val df = q("dd_substring").cache()
    try {
      val want = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"),
          greatest(size(split(col("text"), " ")) - 7, lit(0))
            .cast("long").as("want"))
      assert(df.join(want, "doc_id")
        .filter(col("n_grams") =!= col("want")).count() == 0,
        "n_grams = max(words - 7, 0) occurrences per doc")
      assert(df.filter(col("n_dup") > col("n_grams")).count() == 0)
      assert(df.filter(
        col("flagged") =!= (col("n_dup") * 5 >= greatest(col("n_grams"), lit(1L)))
          .cast("long")).count() == 0, "flag is the scaled-integer threshold")
      // the corpus has real cross-doc boilerplate: some dup grams exist
      assert(df.agg(sum("n_dup")).collect()(0).getLong(0) > 0)
    } finally df.unpersist()
  }

  test("tx_decontam_fuzzy recovers exactly the planted near-twin contamination") {
    val rows = q("tx_decontam_fuzzy").collect()
    // every flagged pair passes the Jaccard >= 0.5 threshold it claims
    assert(rows.forall(r => r.getLong(2) * 2 >= r.getLong(3)))
    // the planted contamination: each eval doc (id % 100 == 0) has a mutated
    // twin at id + 1000000 in the train stratum; at threshold 0.5 those are
    // exactly the pairs that survive
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val evalIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 100 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val want = evalIds.map(id => (id + 1000000L, id))
    assert(want.subsetOf(got), s"got=$got want=$want")
    // any further pair is still train x eval (organic near-dups in the
    // synthetic corpus are legitimate hits, e.g. two short docs colliding)
    assert(got.forall { case (t, e) =>
      t >= 1000000L && e < 1000000L && e % 100 == 0 })
  }

  test("dd_lsh_recall: bands catch nearly all true pairs without all-pairs") {
    val r = q("dd_lsh_recall").collect()(0)
    val (truth, caught, cand) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(caught <= truth, "caught pairs are a subset of truth")
    assert(caught <= cand, "caught pairs are a subset of the candidates")
    assert(truth > 0, "the near corpus has planted true pairs")
    // 4x2 bands at J>=0.5: expected candidate probability 1-(1-0.5^2)^4
    // ~ 0.68 per band-independent model, much higher on the planted twins;
    // anything under half caught would mean the banding broke
    assert(caught * 2 >= truth, s"recall collapsed: $caught/$truth")
  }

  test("tx_curate_full verdicts partition the train stratum") {
    val df = q("tx_curate_full").cache()
    try {
      val train = spark.read.parquet(s"$sf/documents.parquet")
        .filter(col("doc_id") % 100 =!= 0)
      assert(df.count() == train.count(), "one verdict per train doc")
      assert(df.select("doc_id").distinct().count() == df.count())
      val verdicts = df.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(verdicts.keySet.subsetOf(Set(
        "kept", "lang", "quality", "dup_exact", "dup_fuzzy", "contaminated")))
      assert(verdicts.getOrElse("kept", 0L) > 0)
      assert(verdicts.getOrElse("lang", 0L) > 0, "zh docs must fail the gate")
      // stage precedence: every non-en/es/de/fr doc is labeled lang, never
      // a later stage
      val langs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "lang")
      assert(df.join(langs, "doc_id")
        .filter(!col("lang").isin("en", "es", "de", "fr") &&
          col("verdict") =!= "lang").count() == 0)
    } finally df.unpersist()
  }

  test("tx_dsir up-weights the target domain") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val df = q("tx_dsir").join(docs, "doc_id").cache()
    try {
      // per-gram-occurrence importance: target-language docs must average
      // strictly higher than the rest (that is the point of DSIR)
      def meanRate(f: org.apache.spark.sql.Column) = df.filter(f)
        .agg((sum("score") / sum("n_grams")).as("r"))
        .collect()(0).getDouble(0)
      val en = meanRate(col("lang") === "en")
      val rest = meanRate(col("lang") =!= "en")
      assert(en > rest, s"en=$en rest=$rest")
      // every doc with >= 2 tokens carries grams; scores are non-negative
      assert(df.filter(col("score") < 0).count() == 0)
    } finally df.unpersist()
  }
}
