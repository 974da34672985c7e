package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{OpQuery, Tables}
import graft.OpQuery.{rowsOnly, sql}

/** Deduplication operators for LLM training corpora (builder-prompt
  * north-star; SURVEY.md §2.10): exact (hash), MinHash+LSH near-dup,
  * SimHash near-dup. Design for 100 TB:
  *  - exact dedup shuffles once on the content hash (not the text);
  *  - MinHash/SimHash candidate generation is a *bucketed* self-join —
  *    only rows sharing an LSH band key ever meet, and oversized buckets
  *    (degenerate shingles) are dropped by a frequency cap, so the join
  *    can't go quadratic;
  *  - signatures are fixed-width arrays computed scan-side in one pass
  *    (Catalyst HOFs, no UDFs).
  */
object Dedup {

  /** Content hash for exact dedup: SHA-256 of the raw text. */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Distinct word 3-gram shingles of a text column. */
  def shingles(text: Column): Column =
    expr("""array_distinct(transform(
      sequence(1, greatest(size(split(trim(text), '\\s+')) - 2, 1)),
      i -> array_join(slice(split(trim(text), '\\s+'), i, 3), ' ')))""")

  /** Hashed word-3-gram shingles as ROWS (doc_id, sh): tokens explode with
    * position, `lead` windows supply the next two tokens, and the shingle
    * is hashed directly from the triple — fully codegen'd, no per-doc
    * array or string building (the HOF string formulation evaluated
    * interpreted and was re-run per consumer). Shingle-set Jaccard over
    * hashes equals the string version (64-bit collisions are negligible).
    * Docs shorter than 3 tokens keep one partial-gram shingle, like the
    * string form.
    */
  def shingleHashRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "t")))
      .withColumn("t1", lead(col("t"), 1).over(w))
      .withColumn("t2", lead(col("t"), 2).over(w))
      .filter(col("t2").isNotNull || col("pos") === 0)
      .select(col("doc_id"),
        xxhash64(col("t"), coalesce(col("t1"), lit("")), coalesce(col("t2"), lit(""))).as("sh"))
      .dropDuplicates("doc_id", "sh")
  }

  /** 64-hash MinHash signatures over hashed shingle rows (seeded xxhash64
    * family): 64 codegen'd `min` aggregates, one shuffle keyed by doc_id.
    * (A nested-HOF formulation ran interpreted and was ~100× slower.)
    */
  def minhashSignatures(shingleRows: DataFrame): DataFrame = {
    val mins = (0 until 64).map(k => min(xxhash64(lit(k), col("sh"))).as(s"m$k"))
    shingleRows
      .groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until 64).map(k => col(s"m$k")): _*).as("sig"))
  }

  /** LSH band keys for a 64-wide signature: 16 bands × 4 rows. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(15)),
      b => struct(b.as("band"), xxhash64(slice(sig, b * lit(4) + lit(1), lit(4))).as("bandkey")))

  /** 64-bit SimHash per doc over whitespace tokens: explode token hashes →
    * 64 codegen'd bit-count aggregates → reassemble the sign word.
    * Bit i is set iff more than half the token hashes have bit i set
    * (weight = 2·ones − n > 0). Returns (doc_id, sh64).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val hashes = docs.select(col("doc_id"),
      explode(expr("transform(split(trim(text), '\\\\s+'), t -> xxhash64(t))")).as("h"))
    val aggs = count(lit(1)).as("n") +:
      (0 until 64).map(i => sum(shiftright(col("h"), i).bitwiseAND(lit(1L))).as(s"o$i"))
    val sh64 = (0 until 64)
      .map(i => when(col(s"o$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    hashes
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), sh64.as("sh64"))
  }

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * @param maxBucket LSH buckets larger than this are dropped (degenerate
    *                  content, e.g. boilerplate shingles) — the skew guard
    *                  that keeps the self-join from going quadratic.
    */
  def minhashPairs(docs: DataFrame, minJaccard: Double = 0.5,
      maxBucket: Int = 50): DataFrame = {
    // Shingle hash rows feed three consumers (signatures + both sides of
    // the verification join) and are deliberately RECOMPUTED per consumer:
    // at 100 TB caching per-doc shingle sets on executors is a memory
    // liability — recompute-from-scan is the spill-free posture.
    val shingleRows = shingleHashRows(docs)
    val shingleDf = shingleRows.groupBy(col("doc_id")).agg(collect_set(col("sh")).as("sh"))
    val sigs = minhashSignatures(shingleRows)
    // Bucket on band keys; ids only through the self-join — the shingle
    // arrays (the heavy payload) are re-attached per-side AFTER the
    // candidate set is known, so the shuffle moves keys, not content.
    val buckets = sigs
      .select(col("doc_id"), explode(bandKeys(col("sig"))).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bandkey").as("bandkey"))
    val sized = buckets
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("band"), col("bandkey"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    val candidates = sized.select(col("band"), col("bandkey"), col("doc_id").as("doc_id_a"))
      .join(sized.select(col("band"), col("bandkey"), col("doc_id").as("doc_id_b")),
        Seq("band", "bandkey"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"))
      .dropDuplicates("doc_id_a", "doc_id_b")
    candidates
      .join(shingleDf.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a")), Seq("doc_id_a"))
      .join(shingleDf.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b")), Seq("doc_id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 4×16-bit band blocking, Hamming ≤ maxHamming. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("sh64"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, shiftright(sh64, b * 16) & 65535L AS key))")).as("bk"))
      .select(col("doc_id"), col("sh64"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_id_a"), col("sh64").as("ha"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_id_b"), col("sh64").as("hb"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .dropDuplicates("doc_id_a", "doc_id_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_id_a"), col("doc_id_b"), col("hamming"))
  }

  def registry: Seq[OpQuery] = Seq(

    // ---- exact dedup: first-wins survivor per content hash ---------------
    sql("d1_exact_dedup",
      """SELECT doc_id, content_hash FROM (
        |  SELECT doc_id, sha256(text) AS content_hash,
        |    ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents) t WHERE rn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), contentHash(col("text")).as("content_hash"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("content_hash"))
    },

    // ---- duplicate-group report on a prefix key (non-trivial in this
    //      corpus: generated docs share 80-char prefixes) -------------------
    sql("d2_dup_groups",
      """SELECT prefix_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS keeper_doc_id
        |FROM (SELECT doc_id, sha256(substr(text, 1, 80)) AS prefix_hash FROM documents) t
        |GROUP BY prefix_hash HAVING count(*) > 1""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), sha2(substring(col("text"), 1, 80), 256).as("prefix_hash"))
        .groupBy(col("prefix_hash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))
        .filter(col("n_docs") > 1)
    },

    // ---- normalized-text dedup: case/punct/whitespace-insensitive --------
    // The canonicalization step every LLM corpus dedup runs before exact
    // hashing: lowercase, strip punctuation, collapse whitespace.
    sql("d6_normalized_dedup",
      """SELECT doc_id, norm_hash FROM (
        |  SELECT doc_id,
        |    sha256(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?"]', '', 'g'),
        |                               '\s+', ' ', 'g'))) AS norm_hash,
        |    ROW_NUMBER() OVER (PARTITION BY
        |      sha256(trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?"]', '', 'g'),
        |                                 '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM documents) t WHERE rn = 1""".stripMargin) { (s, d) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[.,;:!?\"]", ""), "\\s+", " "))
      val w = Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), sha2(norm, 256).as("norm_hash"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("norm_hash"))
    },

    // ---- MinHash+LSH near-dup pairs (rows-only: xxhash64 not in DuckDB;
    //      exactness covered by DedupSpec against brute-force Jaccard) -----
    rowsOnly("d3_minhash_pairs") { (s, d) =>
      minhashPairs(Tables.documents(s, d))
    },

    // ---- SimHash near-dup pairs (rows-only; DedupSpec) -------------------
    rowsOnly("d4_simhash_pairs") { (s, d) =>
      simhashPairs(Tables.documents(s, d))
    },

    // ---- n-gram Jaccard similarity for adjacent same-source docs ---------
    // The standalone exact-similarity op (no LSH): pairs within a bounded
    // blocking key (source), similarity = |∩|/|∪| of word 3-gram sets.
    sql("d5_ngram_jaccard",
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
        |    list_distinct([array_to_string(toks[i:i+2], ' ')
        |      FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)]) AS grams
        |  FROM (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS toks
        |        FROM documents) t
        |)
        |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |  CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |    / len(list_distinct(a.grams || b.grams)) AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.source = b.source AND b.rk = a.rk + 1""".stripMargin) { (s, d) =>
      // Spark side works on hashed shingle sets (identical Jaccard values,
      // no string building); the oracle builds the string grams — set
      // sizes are equal barring 64-bit collisions.
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val docs = Tables.documents(s, d)
      val sh = shingleHashRows(docs)
        .groupBy(col("doc_id")).agg(collect_set(col("sh")).as("grams"))
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .withColumn("rk", row_number().over(w))
      val a = sh.select(col("source"), col("rk"), col("doc_id").as("doc_id_a"), col("grams").as("ga"))
      val b = sh.select(col("source"), (col("rk") - 1).as("rk"),
        col("doc_id").as("doc_id_b"), col("grams").as("gb"))
      a.join(b, Seq("source", "rk"))
        .select(col("doc_id_a"), col("doc_id_b"),
          (size(array_intersect(col("ga"), col("gb"))).cast("double") /
            size(array_union(col("ga"), col("gb")))).as("jaccard"))
    }
  )
}
