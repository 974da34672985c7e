package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{OpQuery, Tables}
import graft.OpQuery.{rowsOnly, sql}

/** Scalar/array/map/datetime function coverage (SURVEY.md §2.8 + the
  * engine's declared built-in surface). Per-row expressions are pure
  * projections — fully codegen'd, zero shuffle, scan-bound at 100 TB.
  */
object Functions {

  /** Right-to-be-forgotten purge ACTION (q77 is the audit, q80 the proof
    * artifact): rewrite `df` minus the tombstoned ids — an anti-join
    * against the tombstone list on `key`. No broadcast HINT: tombstone
    * lists are usually small (deletion requests), but they are
    * CORPUS-DERIVED — a bulk-deletion campaign (the q80 fixture's
    * `doc_id % 97` is exactly that shape) scales with the corpus, and a
    * forced broadcast of ~1% of all ids at 100 TB is a driver/executor
    * memory hazard. Catalyst's size threshold (plus AQE's runtime
    * promotion) picks broadcast when the list really is small and a
    * shuffled anti-join when it isn't; the anti-join is correct either
    * way. OperatorInvariantsSpec proves a written round-trip carries
    * zero tombstoned rows and that q80's manifests reconcile.
    */
  def purgeTombstones(df: DataFrame, tombIds: DataFrame, key: String): DataFrame = {
    val t = tombIds.select(tombIds.columns.head).toDF(key).distinct()
    df.join(t, Seq(key), "left_anti")
  }

  private val ManifestMod63 = new java.math.BigDecimal("9223372036854775808")

  /** The q78 manifest statistics for one document set — per (source,
    * split): count, char volume, id range, mod-2^63 content checksum
    * (exact DECIMAL accumulation; see the q78 registry notes). Every
    * statistic is ALGEBRAIC, which is what makes [[mergeManifests]] and
    * the q81/streaming incremental-maintenance forms possible.
    */
  def partManifest(docs: DataFrame): DataFrame = {
    val h32 = conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long")
    docs
      .select(col("source"), col("n_chars"), col("doc_id"),
        (h32 % 100).as("b"), h32.as("h32"))
      .select(col("source"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"),
        col("n_chars"), col("doc_id"), col("h32"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        (sum(col("h32").cast("decimal(38,0)")) % lit(ManifestMod63)).cast("long")
          .as("checksum"))
  }

  /** Merge algebraic part-manifests (the q81 law): counts/chars add, id
    * ranges combine by min/max, mod-2^63 checksums add — so
    * `mergeManifests(partManifest(A) ∪ partManifest(B))` equals
    * `partManifest(A ∪ B)` exactly (q81's oracle is that identity).
    */
  def mergeManifests(parts: DataFrame): DataFrame =
    parts.groupBy(col("source"), col("split"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"),
        min(col("min_id")).as("min_id"),
        max(col("max_id")).as("max_id"),
        (sum(col("checksum").cast("decimal(38,0)")) % lit(ManifestMod63))
          .cast("long").as("checksum"))

  def registry: Seq[OpQuery] = Seq(

    // ---- union / union all (SURVEY §2.5 set-like ops) --------------------
    sql("q31_union_all",
      """SELECT nationkey, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) t GROUP BY nationkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .unionAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- array functions over tokenized text -----------------------------
    sql("q32_array_funcs",
      """SELECT doc_id,
        |  CAST(len(toks) AS BIGINT) AS n_toks,
        |  list_contains(toks, 'the') AS has_the,
        |  list_sort(toks)[1] AS first_sorted,
        |  toks[3] AS third_token,
        |  array_to_string(toks[1:3], '|') AS head3
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).cast("long").as("n_toks"),
          array_contains(col("toks"), "the").as("has_the"),
          element_at(sort_array(col("toks")), 1).as("first_sorted"),
          element_at(col("toks"), 3).as("third_token"),
          array_join(slice(col("toks"), 1, 3), "|").as("head3"))
    },

    // ---- map functions over parsed JSON ----------------------------------
    sql("q33_map_funcs",
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS prop_keys,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  CAST(coalesce(json_extract_string(props, '$.missing'), '-1') AS BIGINT) AS missing_val
        |FROM events""".stripMargin) { (s, d) =>
      val m = from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
      Tables.events(s, d).select(
        col("event_id"),
        array_join(map_keys(m), ",").as("prop_keys"),
        element_at(m, "k").as("k_val"),
        coalesce(element_at(m, "missing"), lit(-1L)).as("missing_val"))
    },

    // ---- conditional functions (SURVEY §2.8 C9) --------------------------
    sql("q34_conditional_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  greatest(l_tax, l_discount) AS max_rate,
        |  least(l_tax, l_discount) AS min_rate,
        |  nullif(l_quantity, 1.0) AS qty_or_null,
        |  coalesce(nullif(l_quantity, 1.0), -1.0) AS qty_defaulted,
        |  CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 40 THEN 'mid'
        |       ELSE 'high' END AS qty_band,
        |  (l_returnflag = 'R') AS returned
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"),
        nullif(col("l_quantity"), lit(1.0)).as("qty_or_null"),
        coalesce(nullif(col("l_quantity"), lit(1.0)), lit(-1.0)).as("qty_defaulted"),
        when(col("l_quantity") < 10, "low").when(col("l_quantity") < 40, "mid")
          .otherwise("high").as("qty_band"),
        (col("l_returnflag") === "R").as("returned"))
    },

    // ---- math functions (ulp-safe subset: no libm transcendentals) -------
    sql("q35_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_discount - l_tax) AS rate_gap,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  power(l_discount, 2) AS disc_sq,
        |  CAST(sign(l_discount - l_tax) AS DOUBLE) AS gap_sign,
        |  CAST(l_orderkey % 7 AS BIGINT) AS key_mod
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - col("l_tax")).as("rate_gap"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        pow(col("l_discount"), 2).as("disc_sq"),
        signum(col("l_discount") - col("l_tax")).as("gap_sign"),
        (col("l_orderkey") % 7).cast("long").as("key_mod"))
    },

    // ---- datetime arithmetic ---------------------------------------------
    sql("q36_datetime_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")).cast("long").as("days_since_95"))
    },

    // ---- string functions round 2 ----------------------------------------
    sql("q37_string_funcs2",
      """SELECT c_custkey,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
        |  reverse(c_name) AS name_rev,
        |  repeat(c_mktsegment, 2) AS seg_twice,
        |  split_part(c_name, '#', 1) AS name_stem,
        |  CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lowvowel,
        |  lower(c_mktsegment) AS seg_lower
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
        reverse(col("c_name")).as("name_rev"),
        repeat(col("c_mktsegment"), 2).as("seg_twice"),
        split_part(col("c_name"), lit("#"), lit(1)).as("name_stem"),
        instr(col("c_name"), "#").cast("long").as("hash_pos"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_lowvowel"),
        lower(col("c_mktsegment")).as("seg_lower"))
    },

    // ---- exact percentiles (sort-based, deterministic interpolation) -----
    sql("q38_percentiles",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("p50_qty"),
          percentile(col("l_quantity"), lit(0.9)).as("p90_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
    },

    // ---- sketch aggregates (approx_count_distinct: engine-specific
    //      estimates → rows-only; DedupSpec-style tolerance in FunctionsSpec)
    // rows-only (the GK sketch is engine-specific), with the q39-style
    // in-harness criterion: approx vs exact median per group, raise_error
    // above 1% relative error. The sketch is THE 100 TB percentile path —
    // mergeable, bounded memory — where exact percentile must shuffle and
    // sort every value. The raw sketch estimate is deliberately NOT an
    // output column: GK merge results vary with the partition layout
    // (measured: 5th significant digit across local[4/16/32]), so the
    // query exposes the deterministic exact value plus the accuracy
    // verdict, and the layout-sensitive estimate stays internal to the
    // gate. (approx_count_distinct has no such problem — HLL register
    // maxima are order- and partition-insensitive.)
    rowsOnly("q64_approx_percentile") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("approx_p50"),
          percentile(col("l_extendedprice"), lit(0.5)).as("exact_p50"))
        .withColumn("rel_err_2dp", {
          // 2-dp rounding keeps the emitted column deterministic: the
          // layout wobble is ~1e-4 relative while the nearest rounding
          // boundary is 0.005 — 1.5 orders of magnitude of margin
          val err = abs(col("approx_p50") - col("exact_p50")) / col("exact_p50")
          when(err > 0.01,
            raise_error(concat(lit("approx_percentile error above 1%: "),
              err.cast("string"))))
            .otherwise(round(err, 2))
        })
        .drop("approx_p50")
    },

    // rows-only (the HLL sketch is engine-specific), but the query carries
    // its own quantitative criterion: relative error vs the exact count is
    // emitted as a column and raise_errors above 10% (2× the default 5%
    // rsd) — the gate's evidence lives in the harness, not only in a spec.
    rowsOnly("q39_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .withColumn("rel_err", {
          // gate on the RAW error, round only the emitted column (the q64
          // pattern) — rounding first would let errors in (0.10, 0.10005]
          // slip past the threshold
          val err = abs(col("approx_parts") - col("exact_parts"))
            .cast("double") / col("exact_parts")
          when(err > 0.10,
            raise_error(concat(lit("approx_count_distinct error above 10%: "),
              err.cast("string"))))
            .otherwise(round(err, 4))
        })
    },

    // ---- S2/S8: permissive parse + dead-letter split ---------------------
    // 1% of props are corrupted in-flight (drop the leading '{'); the
    // pipeline routes parse failures to a dead-letter count instead of
    // failing the job — the 100 TB rule (SURVEY §2.1 S8).
    sql("q40_dead_letter",
      """SELECT event_type,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
        |  CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_dead
        |FROM (
        |  SELECT event_type,
        |    json_valid(CASE WHEN event_id % 100 = 0 THEN substr(props, 2) ELSE props END) AS ok
        |  FROM events) t
        |GROUP BY event_type""".stripMargin) { (s, d) =>
      val corrupted = when(col("event_id") % 100 === 0, expr("substr(props, 2)"))
        .otherwise(col("props"))
      val parsed = from_json(corrupted,
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
      Tables.events(s, d)
        .select(col("event_type"), parsed.isNotNull.as("ok"))
        .groupBy(col("event_type"))
        .agg(sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("n_dead"))
    },

    // ---- S8 on documents: ingest router with typed dead-letter reasons ---
    // The q40 split single-tracked the error-sink family on the events
    // table (round-7 verdict stretch). This is the same 100 TB rule on the
    // documents ingest path: deterministic in-flight corruption (blanked
    // text / unknown lang / drifted char count), then a FIRST-FAILURE
    // routing CASE — every row lands in exactly one route, bad rows carry
    // a typed reason instead of failing the job. One scan, one hash agg.
    sql("q75_doc_dead_letter",
      """WITH raw AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 23 = 0 THEN '' ELSE text END AS text,
        |    CASE WHEN doc_id % 29 = 0 THEN 'xx' ELSE lang END AS lang,
        |    CASE WHEN doc_id % 31 = 0 THEN n_chars + 7 ELSE n_chars END AS n_chars
        |  FROM documents),
        |routed AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN 'empty_text'
        |         WHEN lang NOT IN ('en','de','fr','es','zh') THEN 'unknown_lang'
        |         WHEN n_chars <> length(text) THEN 'length_mismatch'
        |         ELSE 'ok' END AS route
        |  FROM raw)
        |SELECT source, route, CAST(count(*) AS BIGINT) AS n
        |FROM routed GROUP BY source, route""".stripMargin) { (s, d) =>
      val corrupted = Tables.documents(s, d).select(
        col("source"),
        when(col("doc_id") % 23 === 0, lit("")).otherwise(col("text")).as("text"),
        when(col("doc_id") % 29 === 0, lit("xx")).otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 31 === 0, col("n_chars") + 7)
          .otherwise(col("n_chars")).as("n_chars"))
      corrupted.select(col("source"),
          when(length(trim(col("text"))) === 0, lit("empty_text"))
            .when(!col("lang").isin("en", "de", "fr", "es", "zh"), lit("unknown_lang"))
            .when(col("n_chars") =!= length(col("text")), lit("length_mismatch"))
            .otherwise(lit("ok")).as("route"))
        .groupBy(col("source"), col("route"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- deterministic train/val/test split by content hash --------------
    // The dataset-versioning primitive: split membership must be a pure
    // function of CONTENT (not row order, not partition layout) so that
    // re-ingesting, re-partitioning, or growing the corpus never moves an
    // old document across the train/test boundary — the leakage rule for
    // training pipelines. bucket = first 32 bits of sha256(text) mod 100;
    // 80/10/10. Embarrassingly parallel scan-side projection, no shuffle
    // at all (.explain: single WholeStageCodegen over the scan). Both
    // engines compute the identical standard SHA-256, so this is fully
    // oracle-checked, not a rows-only sketch.
    sql("q76_hash_split",
      """SELECT doc_id, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |    CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT) % 100
        |      AS BIGINT) AS bucket
        |  FROM documents) t""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          (conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long") % 100)
            .as("bucket"))
        .select(col("doc_id"), col("bucket"),
          when(col("bucket") < 80, lit("train"))
            .when(col("bucket") < 90, lit("val"))
            .otherwise(lit("test")).as("split"))
    },

    // ---- delete propagation audit (right-to-be-forgotten) ----------------
    // The governance tick: a small tombstone list (deletion requests,
    // here doc_id % 97 = 0) must purge every derived dataset — raw docs,
    // the embedding store, each training split. This is the audit plan
    // that precedes the write: per (dataset, partition) purge/remain
    // counts. Scale shape: the tombstone side is tiny and broadcasts;
    // each derived table is scanned once with a semi/anti split — no
    // derived table ever joins another.
    sql("q77_delete_propagation",
      """WITH tomb AS (
        |  SELECT doc_id FROM documents WHERE doc_id % 97 = 0
        |), doc_c AS (
        |  SELECT 'documents' AS dataset, 'all' AS part,
        |    CAST(count(CASE WHEN doc_id % 97 = 0 THEN 1 END) AS BIGINT) AS n_purged,
        |    CAST(count(CASE WHEN doc_id % 97 <> 0 THEN 1 END) AS BIGINT) AS n_remaining
        |  FROM documents
        |), emb_c AS (
        |  SELECT 'embeddings' AS dataset, 'all' AS part,
        |    CAST(count(CASE WHEN vec_id IN (SELECT doc_id FROM tomb) THEN 1 END) AS BIGINT),
        |    CAST(count(CASE WHEN vec_id NOT IN (SELECT doc_id FROM tomb) THEN 1 END) AS BIGINT)
        |  FROM embeddings
        |), split_c AS (
        |  SELECT 'splits' AS dataset,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS part,
        |    CAST(count(CASE WHEN doc_id % 97 = 0 THEN 1 END) AS BIGINT),
        |    CAST(count(CASE WHEN doc_id % 97 <> 0 THEN 1 END) AS BIGINT)
        |  FROM (SELECT doc_id,
        |          CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT) % 100
        |            AS BIGINT) AS b
        |        FROM documents) t
        |  GROUP BY 2
        |)
        |SELECT * FROM doc_c UNION ALL SELECT * FROM emb_c
        |UNION ALL SELECT * FROM split_c""".stripMargin) { (s, d) =>
      val tombPred = col("doc_id") % 97 === 0
      val docs = Tables.documents(s, d)
      val docC = docs.select(tombPred.as("__t"))
        .agg(count(when(col("__t"), 1)).as("n_purged"),
          count(when(!col("__t"), 1)).as("n_remaining"))
        .select(lit("documents").as("dataset"), lit("all").as("part"),
          col("n_purged"), col("n_remaining"))
      val tomb = docs.filter(tombPred).select(col("doc_id"))
      val embC = Tables.embeddings(s, d)
        .join(broadcast(tomb.withColumn("__t", lit(true))),
          col("vec_id") === col("doc_id"), "left")
        .agg(count(when(col("__t").isNotNull, 1)).as("n_purged"),
          count(when(col("__t").isNull, 1)).as("n_remaining"))
        .select(lit("embeddings").as("dataset"), lit("all").as("part"),
          col("n_purged"), col("n_remaining"))
      val splitC = docs
        .select(tombPred.as("__t"),
          (conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long") % 100)
            .as("b"))
        .select(col("__t"),
          when(col("b") < 80, "train").when(col("b") < 90, "val")
            .otherwise("test").as("part"))
        .groupBy(col("part"))
        .agg(count(when(col("__t"), 1)).as("n_purged"),
          count(when(!col("__t"), 1)).as("n_remaining"))
        .select(lit("splits").as("dataset"), col("part"),
          col("n_purged"), col("n_remaining"))
      docC.unionByName(embC).unionByName(splitC)
    },

    // ---- dataset manifest: reproducibility checksums ---------------------
    // The versioning record a training run pins: per (source, split) row
    // count, char volume, id range, and an ORDER-INDEPENDENT content
    // checksum: sum of each doc's 32-bit sha256 prefix, accumulated
    // EXACTLY (Spark DECIMAL(38,0) / DuckDB HUGEINT — a plain BIGINT sum
    // would silently wrap in Spark around 2^31 docs per group while
    // DuckDB errors, breaking cross-engine identity exactly at scale)
    // and reduced mod 2^63 so the published value is one BIGINT.
    // Commutative, so partitioning/arrival order can't change it, and
    // multiplicity-sensitive (unlike an XOR fold, where two copies of a
    // doc cancel out). Two runs that produce different manifests trained
    // on different data, full stop. One scan, one small shuffle.
    sql("q78_dataset_manifest",
      """SELECT source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id,
        |  CAST(sum(h32) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |    AS checksum
        |FROM (SELECT source, n_chars, doc_id,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT) % 100
        |          AS BIGINT) AS b,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT)
        |          AS BIGINT) AS h32
        |      FROM documents) t
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val h32 = conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long")
      val mod63 = lit(new java.math.BigDecimal("9223372036854775808"))
      Tables.documents(s, d)
        .select(col("source"), col("n_chars"), col("doc_id"),
          (h32 % 100).as("b"), h32.as("h32"))
        .select(col("source"),
          when(col("b") < 80, "train").when(col("b") < 90, "val")
            .otherwise("test").as("split"),
          col("n_chars"), col("doc_id"), col("h32"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          (sum(col("h32").cast("decimal(38,0)")) % mod63).cast("long")
            .as("checksum"))
    },

    // ---- incremental manifest maintenance (q66's MV law ⊗ q78) -----------
    // At 100 TB nobody recomputes the dataset manifest by rescanning the
    // corpus per append: every q78 statistic is ALGEBRAIC (counts/chars
    // add, id ranges combine by min/max, and the mod-2^63 checksum adds
    // because (a%M + b%M) % M = (a+b) % M), so the manifest of
    // base ∪ delta is a pure MERGE of the two part-manifests. Here the
    // corpus is split into a "base" (doc_id % 5 ≠ 0) and an "append
    // batch" (doc_id % 5 = 0), each side builds its own part-manifest,
    // and ONLY the merge is emitted. The oracle is q78's FULL manifest
    // over all documents — the hash-match IS the proof the merge loses
    // nothing (the q66 incremental-MV law applied to governance).
    sql("q81_manifest_merge",
      """SELECT source,
        |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_id,
        |  CAST(max(doc_id) AS BIGINT) AS max_id,
        |  CAST(sum(h32) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |    AS checksum
        |FROM (SELECT source, n_chars, doc_id,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT) % 100
        |          AS BIGINT) AS b,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT)
        |          AS BIGINT) AS h32
        |      FROM documents) t
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      mergeManifests(
        partManifest(docs.filter(col("doc_id") % 5 =!= 0))
          .unionByName(partManifest(docs.filter(col("doc_id") % 5 === 0))))
    },

    // ---- join-cardinality estimate vs actual (the CBO diagnostic) --------
    // What ANALYZE feeds the planner, and how wrong it is here: the
    // textbook uniform-NDV estimate |A|·|B| / max(ndv_a, ndv_b) for the
    // orders⋈lineitem equi join, against the EXACT output cardinality
    // (Σ over matched keys of c_a·c_b — computed from the two per-key
    // count tables joined on the key, never by materializing the join).
    // The error ratio is the number you read before trusting a plan's
    // join order at 100 TB. Shape: two keyed count aggs + one keyed join
    // of the (small) count tables + a 1-row reduce.
    sql("q79_join_cardinality",
      """WITH a AS (
        |  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM orders GROUP BY 1
        |), b AS (
        |  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c FROM lineitem GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM a) AS rows_a,
        |         (SELECT CAST(count(*) AS BIGINT) FROM a) AS ndv_a,
        |         (SELECT CAST(sum(c) AS BIGINT) FROM b) AS rows_b,
        |         (SELECT CAST(count(*) AS BIGINT) FROM b) AS ndv_b,
        |         (SELECT CAST(coalesce(sum(a.c * b.c), 0) AS BIGINT)
        |          FROM a JOIN b USING (k)) AS actual_rows
        |)
        |SELECT rows_a, ndv_a, rows_b, ndv_b,
        |  CAST(floor(rows_a * rows_b / greatest(ndv_a, ndv_b)) AS BIGINT) AS est_uniform,
        |  actual_rows,
        |  round(actual_rows * 1.0
        |    / (rows_a * rows_b / greatest(ndv_a, ndv_b)), 6) AS err_ratio
        |FROM tot""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).groupBy(col("o_orderkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val b = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("k"))
        .agg(count(lit(1)).as("c"))
      val statsA = a.agg(sum(col("c")).as("rows_a"), count(lit(1)).as("ndv_a"))
      val statsB = b.agg(sum(col("c")).as("rows_b"), count(lit(1)).as("ndv_b"))
      val actual = a.select(col("k"), col("c").as("ca"))
        .join(b.select(col("k"), col("c").as("cb")), Seq("k"))
        .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual_rows"))
      statsA.crossJoin(statsB).crossJoin(actual)
        .select(col("rows_a"), col("ndv_a"), col("rows_b"), col("ndv_b"),
          floor(col("rows_a") * col("rows_b") /
            greatest(col("ndv_a"), col("ndv_b"))).cast("long").as("est_uniform"),
          col("actual_rows"),
          round(col("actual_rows") * lit(1.0) /
            (col("rows_a") * col("rows_b") / greatest(col("ndv_a"), col("ndv_b"))),
            6).as("err_ratio"))
    },

    // ---- right-to-be-forgotten purge: the ACTION q77 only audits ---------
    // q77 reports what a purge WOULD touch; this runs it: every derived
    // dataset (docs, embedding store, each content-hash split) is
    // rewritten minus the broadcast tombstone list via [[purgeTombstones]]
    // (anti-join — one scan per table, tombstones broadcast, no
    // derived-to-derived joins), and the output is the PROOF artifact a
    // compliance review wants: per dataset, before/purged/after counts,
    // a post-purge tombstone audit measured ON THE PURGED FRAME (must be
    // zero — the "q77 shows zero remaining" check), and q78-style
    // mod-2^63 content checksums whose reconciliation
    // (purged + after ≡ before) proves no non-tombstoned row was lost.
    sql("q80_forgotten_purge",
      """WITH tomb AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
        |d AS (SELECT doc_id, text,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT)
        |          AS BIGINT) AS h32,
        |        CAST(CAST(concat('0x', substr(sha256(text), 1, 8)) AS UBIGINT) % 100
        |          AS BIGINT) AS b,
        |        doc_id IN (SELECT doc_id FROM tomb) AS t
        |      FROM documents),
        |e AS (SELECT vec_id, vec_id IN (SELECT doc_id FROM tomb) AS t
        |      FROM embeddings),
        |doc_b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_before,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        |    CAST(sum(h32) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |      AS checksum_before,
        |    CAST(sum(CASE WHEN t THEN h32 ELSE 0 END)
        |      % CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS checksum_purged
        |  FROM d),
        |doc_a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(coalesce(sum(h32), 0) % CAST('9223372036854775808' AS HUGEINT)
        |      AS BIGINT) AS checksum_after,
        |    CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM tomb) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tomb_remaining
        |  FROM d WHERE NOT t),
        |emb_b AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_before,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        |    CAST(sum(vec_id) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |      AS checksum_before,
        |    CAST(sum(CASE WHEN t THEN vec_id ELSE 0 END)
        |      % CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS checksum_purged
        |  FROM e),
        |emb_a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(coalesce(sum(vec_id), 0) % CAST('9223372036854775808' AS HUGEINT)
        |      AS BIGINT) AS checksum_after,
        |    CAST(sum(CASE WHEN vec_id IN (SELECT doc_id FROM tomb) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tomb_remaining
        |  FROM e WHERE NOT t),
        |spl AS (SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |                 ELSE 'test' END AS part, h32, t, doc_id FROM d),
        |spl_b AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS n_before,
        |    CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
        |    CAST(sum(h32) % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |      AS checksum_before,
        |    CAST(sum(CASE WHEN t THEN h32 ELSE 0 END)
        |      % CAST('9223372036854775808' AS HUGEINT) AS BIGINT) AS checksum_purged
        |  FROM spl GROUP BY part),
        |spl_a AS (
        |  SELECT part, CAST(count(*) AS BIGINT) AS n_after,
        |    CAST(coalesce(sum(h32), 0) % CAST('9223372036854775808' AS HUGEINT)
        |      AS BIGINT) AS checksum_after,
        |    CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM tomb) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tomb_remaining
        |  FROM spl WHERE NOT t GROUP BY part),
        |rows_ AS (
        |  SELECT 'documents' AS dataset, 'all' AS part, doc_b.*, doc_a.*
        |  FROM doc_b CROSS JOIN doc_a
        |  UNION ALL
        |  SELECT 'embeddings', 'all', emb_b.*, emb_a.* FROM emb_b CROSS JOIN emb_a
        |  UNION ALL
        |  SELECT 'splits', b.part, b.n_before, b.n_purged, b.checksum_before,
        |    b.checksum_purged, coalesce(a.n_after, 0), coalesce(a.checksum_after, 0),
        |    coalesce(a.tomb_remaining, 0)
        |  FROM spl_b b LEFT JOIN spl_a a USING (part)
        |)
        |SELECT dataset, part, n_before, n_purged, n_after, tomb_remaining,
        |  checksum_before, checksum_purged, checksum_after,
        |  ((CAST(checksum_purged AS HUGEINT) + checksum_after - checksum_before)
        |    % CAST('9223372036854775808' AS HUGEINT)) = 0 AS reconciles
        |FROM rows_""".stripMargin) { (s, d) =>
      val mod63 = lit(new java.math.BigDecimal("9223372036854775808"))
      def cks(c: Column): Column = (sum(c.cast("decimal(38,0)")) % mod63).cast("long")
      val docs = Tables.documents(s, d)
      val tomb = docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"))
      val h32 = conv(substring(sha2(col("text"), 256), 1, 8), 16, 10).cast("long")

      // one audited (dataset, part-grouped) pair of scans: the original
      // flagged scan for before/purged stats, and the ANTI-JOIN OUTPUT
      // (the actual purge result) re-flagged for after stats + the
      // zero-remaining audit — measured on the rewrite, never inferred
      def flag(df: DataFrame, key: String): DataFrame =
        df.join(broadcast(tomb.select(col("doc_id").as(key))
          .withColumn("__t", lit(true))), Seq(key), "left")
          .withColumn("__t", col("__t").isNotNull)
      def audit(df: DataFrame, key: String, metric: Column,
          grp: Option[Column]): DataFrame = {
        val before = flag(df, key)
        val after = flag(purgeTombstones(df, tomb, key), key)
        val gb = grp.toSeq
        val b = before.groupBy(gb.map(_.as("part")): _*).agg(
          count(lit(1)).as("n_before"),
          sum(when(col("__t"), 1L).otherwise(0L)).as("n_purged"),
          cks(metric).as("checksum_before"),
          cks(when(col("__t"), metric).otherwise(lit(0L))).as("checksum_purged"))
        val a = after.groupBy(gb.map(_.as("part")): _*).agg(
          count(lit(1)).as("n_after"),
          cks(metric).as("checksum_after"),
          sum(when(col("__t"), 1L).otherwise(0L)).as("tomb_remaining"))
        if (grp.isEmpty) b.crossJoin(a)
        else b.join(a, Seq("part"), "left")
          .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
          .withColumn("checksum_after", coalesce(col("checksum_after"), lit(0L)))
          .withColumn("tomb_remaining", coalesce(col("tomb_remaining"), lit(0L)))
      }
      val split = when(h32 % 100 < 80, "train")
        .when(h32 % 100 < 90, "val").otherwise("test")
      val docRow = audit(docs, "doc_id", h32, None)
        .select(lit("documents").as("dataset"), lit("all").as("part"), col("*"))
      val embRow = audit(Tables.embeddings(s, d).select(col("vec_id")),
          "vec_id", col("vec_id"), None)
        .select(lit("embeddings").as("dataset"), lit("all").as("part"), col("*"))
      val splitRows = audit(docs, "doc_id", h32, Some(split))
        .select(lit("splits").as("dataset"), col("part"), col("n_before"),
          col("n_purged"), col("checksum_before"), col("checksum_purged"),
          col("n_after"), col("checksum_after"), col("tomb_remaining"))
      docRow.unionByName(embRow).unionByName(splitRows)
        .select(col("dataset"), col("part"), col("n_before"), col("n_purged"),
          col("n_after"), col("tomb_remaining"), col("checksum_before"),
          col("checksum_purged"), col("checksum_after"),
          (((col("checksum_purged").cast("decimal(38,0)") +
            col("checksum_after").cast("decimal(38,0)") -
            col("checksum_before").cast("decimal(38,0)")) % mod63) === 0)
            .as("reconciles"))
    },

    // ---- as-of join (self): latest prior purchase per event --------------
    // Spark-first: the reference preference order says compose built-ins
    // when semantics allow — a sorted window with last(_, ignoreNulls)
    // IS the as-of join for same-key streams, with no join at all (one
    // shuffle on the key, no range explosion).
    sql("q42_asof_self",
      """SELECT event_id, user_id, ts, last_purchase_ts FROM (
        |  SELECT event_id, user_id, ts,
        |    max(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
        |  FROM events) t""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("ts"),
        max(when(col("event_type") === "purchase", col("ts"))).over(w)
          .as("last_purchase_ts"))
    },

    // ---- interval (time-range) join --------------------------------------
    // Events within 30 minutes AFTER a purchase by the same user. Equi key
    // (user_id) + range predicate: Spark plans an equi shuffle join with
    // the range as residual — no cartesian. Count aggregated per purchase.
    sql("q43_interval_join",
      """SELECT p.event_id AS purchase_id, CAST(count(e.event_id) AS BIGINT) AS n_follow
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN events e
        |  ON e.user_id = p.user_id
        |  AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL '30 minutes'
        |GROUP BY p.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val e = ev.select(col("user_id"), col("ts").as("ets"), col("event_id").as("eid"))
      p.join(e,
          p("user_id") === e("user_id") &&
            col("ets") > col("pts") &&
            col("ets") <= col("pts") + expr("INTERVAL 30 MINUTES"),
          "left")
        .groupBy(col("purchase_id"))
        .agg(count(col("eid")).as("n_follow"))
    },

    // ---- salted two-phase aggregation (skew guard) -----------------------
    // The skew pattern for hot keys at 100 TB: pre-aggregate on
    // (key, salt) so one hot key spreads over 16 reducers, then combine.
    // Result is provably identical to the direct groupBy — the oracle IS
    // the plain GROUP BY.
    sql("q44_salted_agg",
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY l_suppkey""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"),
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)).as("__salt"))
        .agg(sum(col("l_quantity")).as("__sq"), count(lit(1)).as("__n"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("__sq")).as("sum_qty"), sum(col("__n")).as("n_lines"))
    },

    // ---- window navigation: first/last/nth/lead --------------------------
    sql("q45_window_nav",
      """SELECT event_id, user_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
        |  nth_value(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_type,
        |  lead(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        first(col("event_type")).over(ord).as("first_type"),
        last(col("event_type")).over(full).as("last_type"),
        nth_value(col("event_type"), 2).over(full).as("second_type"),
        lead(col("event_type"), 1).over(ord).as("next_type"))
    },

    // ---- distribution ranks: ntile / percent_rank / cume_dist ------------
    sql("q46_window_distribution",
      """SELECT o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(dense_rank() OVER w AS BIGINT) AS dr
        |FROM orders
        |WINDOW w AS (ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, d) =>
      // Two-pass distributed global ranking (no single-partition Window):
      // Relational.globalRowNumber carries the range backbone + offset
      // shift. (o_totalprice, o_orderkey) is a unique total order, so
      // row_number == rank == dense_rank and ntile/percent_rank/cume_dist
      // are closed forms of (rn, n). n comes from a count() — a driver
      // scalar, the same sanctioned round-trip class as the offsets.
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice"))
      val n = base.count()
      val ranked = graft.operators.Relational.globalRowNumber(
        base, Seq(col("o_totalprice"), col("o_orderkey")), "__rn")
      // ntile(4): the first n%4 buckets take floor(n/4)+1 rows each
      val q = n / 4
      val r = n % 4
      val rn = col("__rn")
      val quartile =
        if (q == 0) rn // degenerate n<4: one row per bucket
        else when(rn <= lit(r * (q + 1)), floor((rn - 1) / lit(q + 1)) + 1)
          .otherwise(lit(r) + floor((rn - lit(r * (q + 1)) - 1) / lit(q)) + 1)
      ranked.select(
        col("o_orderkey"),
        quartile.cast("long").as("price_quartile"),
        ((rn - 1).cast("double") / lit((n - 1).max(1L).toDouble)).as("pr"),
        (rn.cast("double") / lit(n.toDouble)).as("cd"),
        rn.cast("long").as("dr"))
    },

    // ---- ordered string aggregation --------------------------------------
    sql("q47_string_agg",
      """SELECT n_regionkey AS regionkey,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey").as("regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
    },

    // ---- statistical aggregates from exact sums --------------------------
    // Variance/correlation computed from exact-decimal/integral sums with
    // the same closed-form on both engines — deterministic regardless of
    // aggregation order (built-in stddev/corr use engine-specific moment
    // recurrences that differ in the last ulp across engines).
    sql("q48_stats",
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  (sum(l_quantity * l_quantity) - sum(l_quantity) * sum(l_quantity) / count(*))
        |    / (count(*) - 1) AS qty_var,
        |  sqrt((sum(l_quantity * l_quantity) - sum(l_quantity) * sum(l_quantity) / count(*))
        |    / (count(*) - 1)) AS qty_stddev
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      val q = col("l_quantity")
      val n = count(lit(1))
      val varExpr = (sum(q * q) - sum(q) * sum(q) / n) / (n - lit(1))
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(n.as("n"), varExpr.as("qty_var"), sqrt(varExpr).as("qty_stddev"))
    },

    // ---- date-spine gap fill ---------------------------------------------
    // The missing-period problem: a day with zero orders must appear with
    // n = 0. Generate the calendar spine with sequence() (no driver loop),
    // left-join the per-day aggregate back onto it.
    sql("q49_date_spine",
      """WITH bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
        |  FROM orders
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1
        |)
        |SELECT s.day, coalesce(d.n, 0) AS n_orders
        |FROM spine s LEFT JOIN daily d ON d.day = s.day""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val bounds = o.agg(min(col("o_orderdate").cast("date")).as("lo"),
        max(col("o_orderdate").cast("date")).as("hi"))
      val spine = bounds
        .select(explode(sequence(col("lo"), col("hi"),
          expr("INTERVAL 1 DAY"))).as("day"))
      val daily = o.groupBy(col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_orders"))
    },

    // ---- width_bucket histogram ------------------------------------------
    sql("q50_histogram",
      // width_bucket spelled out arithmetically (absent in DuckDB 1.0):
      // 12 equal buckets over [0, 600000), underflow→0, overflow→13
      """SELECT CASE WHEN o_totalprice < 0 THEN CAST(0 AS BIGINT)
        |            WHEN o_totalprice >= 600000 THEN CAST(13 AS BIGINT)
        |            ELSE CAST(floor(o_totalprice / 50000) AS BIGINT) + 1 END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(width_bucket(col("o_totalprice"), lit(0), lit(600000), lit(12))
          .cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- regexp capture groups -------------------------------------------
    sql("q51_regexp_extract",
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS BIGINT) AS vowel_runs
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_tail"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0)))
          .cast("long").as("vowel_runs"))
    },

    // ---- unpivot: wide counters → long (station, qty) rows ---------------
    // The inverse of the A2 pivot — the melt every ledger-shaped table
    // needs before delta processing.
    sql("q52_unpivot",
      """SELECT c_custkey, metric, value FROM (
        |  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value
        |  FROM customer) t""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal").as("acctbal"),
          col("c_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("c_custkey")), Array(col("acctbal"), col("nationkey")),
          "metric", "value")
    },

    // ---- fuzzy matching: edit distance between brand-adjacent part names -
    sql("q53_levenshtein",
      """WITH ranked AS (
        |  SELECT p_partkey, p_brand, p_name,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rk
        |  FROM part
        |)
        |SELECT a.p_partkey, CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS name_dist
        |FROM ranked a JOIN ranked b
        |  ON a.p_brand = b.p_brand AND b.rk = a.rk + 1""".stripMargin) { (s, d) =>
      // p_brand is a ~25-value dim key: a Window.partitionBy(p_brand)
      // sorts N/25 part rows in one task at scale — the bounded
      // two-pass rank spreads each brand across range partitions
      val ranked = graft.operators.Relational.groupedRowNumber(
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_name")),
        Seq("p_brand"), Seq(col("p_partkey")), "rk")
      val a = ranked.select(col("p_brand"), col("rk"),
        col("p_partkey"), col("p_name").as("na"))
      val b = ranked.select(col("p_brand"), (col("rk") - 1).as("rk"),
        col("p_name").as("nb"))
      a.join(b, Seq("p_brand", "rk"))
        .select(col("p_partkey"),
          levenshtein(col("na"), col("nb")).cast("long").as("name_dist"))
    },

    // ---- salted join (hot-key skew guard for shuffle joins) --------------
    // The fact side's key is salted into 8 shards; the dim side is
    // replicated once per shard (explode over the salt range), so one hot
    // key's rows spread across 8 reducers instead of one. The fact side
    // partial-aggregates per (key, salt) BEFORE the join — algebraic
    // aggregates commute with the join, so the join sees one row per
    // (key, salt) instead of one per fact row, and the hot key's partial
    // rows are exactly what the salt spreads. Result provably identical
    // to the plain join — the oracle IS the plain join.
    sql("q54_salted_join",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      val salted = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_quantity"),
          pmod(xxhash64(col("l_linenumber"), col("l_partkey")), lit(8)).as("__salt"))
        .groupBy(col("l_orderkey"), col("__salt"))
        .agg(count(lit(1)).as("__n"), sum(col("l_quantity")).as("__qty"))
      val dimReplicated = Tables.orders(s, d)
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        .withColumn("__salt", explode(sequence(lit(0L), lit(7L))))
      salted.join(dimReplicated, Seq("l_orderkey", "__salt"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("__n")).as("n_lines"), sum(col("__qty")).as("sum_qty"))
    },

    // ---- bounded ROWS frame: conditional stat over the trailing 5 events -
    sql("q55_rows_frame",
      """SELECT event_id, user_id,
        |  CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS purchases_last5
        |FROM events""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        count(when(col("event_type") === "purchase", 1)).over(w).as("purchases_last5"))
    },

    // ---- RANGE frame over event time: trailing 1-hour window -------------
    // Range frames bound by VALUE distance (here: epoch seconds), not row
    // count — the hourly-trailing-aggregate shape.
    sql("q56_range_frame",
      // integer seconds on BOTH sides: DuckDB epoch() keeps fractional
      // seconds, Spark unix_timestamp floors — un-floored, frame
      // boundaries disagree for events at sub-second offsets
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS events_last_hour
        |FROM events""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-3600, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("events_last_hour"))
    },

    // ---- bitwise aggregates ----------------------------------------------
    sql("q57_bit_aggs",
      """SELECT l_returnflag,
        |  CAST(bit_and(l_linenumber) AS BIGINT) AS all_bits,
        |  CAST(bit_or(l_linenumber) AS BIGINT) AS any_bits,
        |  CAST(bit_xor(l_linenumber) AS BIGINT) AS xor_bits
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("CAST(bit_and(l_linenumber) AS BIGINT)").as("all_bits"),
          expr("CAST(bit_or(l_linenumber) AS BIGINT)").as("any_bits"),
          expr("CAST(bit_xor(l_linenumber) AS BIGINT)").as("xor_bits"))
    },

    // ---- cast edges: try-semantics string→number -------------------------
    sql("q41_cast_edges",
      """SELECT c_custkey,
        |  TRY_CAST(c_name AS INTEGER) AS name_as_int,
        |  TRY_CAST(split_part(c_name, '#', 2) AS BIGINT) AS key_from_name,
        |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str,
        |  CAST(c_nationkey AS DOUBLE) AS nation_dbl
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).select(
        col("c_custkey"),
        // ANSI mode (Spark 4 default) makes plain cast THROW on malformed
        // input — try_cast is the tolerant form, matching DuckDB TRY_CAST
        expr("try_cast(c_name AS INT)").as("name_as_int"),
        expr("try_cast(split_part(c_name, '#', 2) AS BIGINT)").as("key_from_name"),
        col("c_acctbal").cast("decimal(12,2)").cast("string").as("bal_str"),
        col("c_nationkey").cast("double").as("nation_dbl"))
    },

    // ---- correlated scalar subquery (per outer row) ----------------------
    // Exercises Catalyst's subquery decorrelation (rewritten to an
    // aggregate + left join under the hood — no per-row re-execution, so
    // it scales like the join it becomes).
    sql("q58_correlated_subquery",
      """SELECT o_orderkey,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 25) AS n_heavy_lines
        |FROM orders o""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q58_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("q58_lineitem")
      s.sql(
        """SELECT o_orderkey,
          |  (SELECT CAST(count(*) AS BIGINT) FROM q58_lineitem l
          |   WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 25) AS n_heavy_lines
          |FROM q58_orders o""".stripMargin)
    },

    // ---- LATERAL join: per-order top-1 line item -------------------------
    // The "top-N per key via dependent subquery" shape; Spark plans it as
    // a decorrelated window/aggregate, not a per-row loop. Ordering is
    // TOTAL through the tiebreak chain; the projected columns are
    // identical for any rows that still tie, so the result is
    // deterministic either way.
    sql("q59_lateral_topn",
      """SELECT o.o_orderkey, t.top_partkey, t.top_qty
        |FROM orders o, LATERAL (
        |  SELECT l_partkey AS top_partkey, CAST(l_quantity AS BIGINT) AS top_qty
        |  FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |  ORDER BY l_quantity DESC, l_partkey, l_suppkey, l_extendedprice, l_linenumber
        |  LIMIT 1) t""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("q59_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("q59_lineitem")
      s.sql(
        """SELECT o.o_orderkey, t.top_partkey, t.top_qty
          |FROM q59_orders o, LATERAL (
          |  SELECT l_partkey AS top_partkey, CAST(l_quantity AS BIGINT) AS top_qty
          |  FROM q59_lineitem l WHERE l.l_orderkey = o.o_orderkey
          |  ORDER BY l_quantity DESC, l_partkey, l_suppkey, l_extendedprice, l_linenumber
          |  LIMIT 1) t""".stripMargin)
    },

    // ---- deterministic hash sample ---------------------------------------
    // Reproducible ~5% sample keyed by a content hash — unlike
    // TABLESAMPLE/rand(), the same rows are selected on every run, every
    // engine, every partition layout (the property training-data holdouts
    // and A/B slices need). Cross-engine via the sha256-prefix hash60.
    sql("q61_deterministic_sample", {
      val h = "CAST(list_sum([CAST(strpos('0123456789abcdef', substr(substr(sha256(CAST(o_orderkey AS VARCHAR)), 1, 15), j+1, 1)) - 1 AS BIGINT) << (4*(14-j)) FOR j IN range(15)]) AS BIGINT)"
      s"""SELECT o_orderkey, o_custkey, o_totalprice
         |FROM orders WHERE $h % 20 = 0""".stripMargin
    }) { (s, d) =>
      Tables.orders(s, d)
        .filter(graft.llm.Dedup.hash60(col("o_orderkey").cast("string")) % 20 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },

    // ---- stratified deterministic sample ---------------------------------
    // Per-stratum rates over the documents corpus — the language-mix
    // rebalancing step of a training-data pipeline (keep all scarce
    // languages, downsample the dominant one), with the same
    // reproducibility guarantee as q61: membership is a pure function of
    // (doc_id, stratum), not of run or partition layout.
    sql("q62_stratified_sample", {
      val h = "CAST(list_sum([CAST(strpos('0123456789abcdef', substr(substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15), j+1, 1)) - 1 AS BIGINT) << (4*(14-j)) FOR j IN range(15)]) AS BIGINT)"
      s"""SELECT doc_id, lang FROM documents
         |WHERE $h % 100 < (CASE WHEN lang = 'en' THEN 20 ELSE 80 END)""".stripMargin
    }) { (s, d) =>
      Tables.documents(s, d)
        .filter(graft.llm.Dedup.hash60(col("doc_id").cast("string")) % 100 <
          when(col("lang") === "en", lit(20)).otherwise(lit(80)))
        .select(col("doc_id"), col("lang"))
    },

    // ---- SCD type-2 merge: dimension history maintenance -----------------
    // Apply a change set to a dimension WITHOUT losing history: superseded
    // rows survive with is_current=false, new versions append — the
    // "slowly changing dimension" upsert (vs the ledger's in-place S4
    // merge). Change set here: a deterministic price bump on every 7th
    // part. Scale shape: one keyed left join (broadcastable change set)
    // plus a union — no full-table rewrite beyond the touched partition
    // files in a real lakehouse sink.
    sql("q63_scd2_merge",
      """WITH upd AS (
        |  SELECT p_partkey, p_retailprice + 1.0 AS new_price
        |  FROM part WHERE p_partkey % 7 = 0
        |)
        |SELECT p.p_partkey, p.p_retailprice AS price,
        |  CAST(0 AS BIGINT) AS version, (u.p_partkey IS NULL) AS is_current
        |FROM part p LEFT JOIN upd u ON u.p_partkey = p.p_partkey
        |UNION ALL
        |SELECT p_partkey, new_price AS price, CAST(1 AS BIGINT) AS version,
        |  true AS is_current
        |FROM upd""".stripMargin) { (s, d) =>
      val part = Tables.part(s, d)
      val upd = part.filter(col("p_partkey") % 7 === 0)
        .select(col("p_partkey"), (col("p_retailprice") + lit(1.0)).as("new_price"))
      // upd is a fixed fraction of part — SF-scaling: no broadcast hint
      val closed = part
        .join(upd.select(col("p_partkey"), lit(true).as("__u")),
          Seq("p_partkey"), "left")
        .select(col("p_partkey"), col("p_retailprice").as("price"),
          lit(0L).as("version"), col("__u").isNull.as("is_current"))
      val fresh = upd.select(col("p_partkey"), col("new_price").as("price"),
        lit(1L).as("version"), lit(true).as("is_current"))
      closed.unionByName(fresh)
    },

    // ---- batch sessionization (gap-based) --------------------------------
    // The batch twin of st3's session_window: per user, a >30-min silence
    // starts a new session; session ids are a running sum of boundary
    // flags. Timestamps compared as MICROSECOND LONGS (unix_micros /
    // epoch_us) so the boundary test is exact integer math on both
    // engines — no float epoch, no truncation skew. Scale shape: ONE
    // shuffle on user_id serves both window passes (lag and the running
    // sum share the same partitioning) and the final groupBy is
    // partial-aggregated within the already-hashed partitions. Per-user
    // event counts are human-scale (thousands), so no skew path needed.
    sql("q65_sessionize",
      """WITH e AS (
        |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |), g AS (
        |  SELECT user_id, event_id, value, us,
        |    CASE WHEN us - lag(us) OVER w > 1800000000 OR lag(us) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        |), s AS (
        |  SELECT user_id, value, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g
        |)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(us) AS start_us, max(us) - min(us) AS duration_us,
        |  round(sum(value), 6) AS total_value
        |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(w) > 1800000000L ||
            lag(col("us"), 1).over(w).isNull, lit(1)).otherwise(lit(0)))
        .withColumn("session_id",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          (max(col("us")) - min(col("us"))).as("duration_us"),
          round(sum(col("value")), 6).as("total_value"))
    },

    // ---- incremental aggregation (materialized-view maintenance) ---------
    // The refresh tick of a 100 TB rollup: the base partition (event_id %
    // 10 <= 7, standing in for "already materialized") and the delta
    // batch are aggregated SEPARATELY, then merged ALGEBRAICALLY —
    // counts add, sums add, min/max fold — so a real refresh touches only
    // the delta and the affected (event_type, day) rows, never rescanning
    // the base fact table. avg is derived from the merged (sum, count)
    // pair, never averaged-of-averages. The ORACLE is the full recompute
    // over all events: equality proves the merge is lossless. Scale
    // shape: two partial aggs keyed the same way + one merge agg on the
    // (tiny) rollup key space.
    sql("q66_incremental_agg",
      """SELECT event_type,
        |  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS total,
        |  min(value) AS vmin, max(value) AS vmax,
        |  round(sum(value) / count(*), 6) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          date_trunc("day", col("ts")).as("day"), col("value"))
      def partial(df: DataFrame): DataFrame = df
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      val base = partial(ev.filter(col("event_id") % 10 <= 7))
      val delta = partial(ev.filter(col("event_id") % 10 > 7))
      base.unionByName(delta)
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n")).as("n"), round(sum(col("total")), 6).as("total"),
          min(col("vmin")).as("vmin"), max(col("vmax")).as("vmax"),
          round(sum(col("total")) / sum(col("n")), 6).as("avg_value"))
    },

    // ---- gap fill with last observation carried forward (LOCF) -----------
    // Time-series densification: every (user, day) cell of a fixed spine
    // gets the user's last observed daily purchase total — the as-of/
    // backfill primitive feature stores need (q42 is the join form; this
    // is the grid form). Scale shape: the day spine is PARAMETER-bounded
    // (30 rows — broadcast is correct); the user dim scales, so the grid
    // is users × days built by broadcasting the SPINE, never the users;
    // the fill itself is one window keyed by user_id (same shuffle as
    // the grid's groupBy). NULLs before a user's first observation stay
    // NULL by LOCF's definition.
    sql("q67_locf_fill",
      """WITH days AS (
        |  SELECT CAST(unnest(generate_series(TIMESTAMP '2024-01-01',
        |    TIMESTAMP '2024-01-30', INTERVAL 1 DAY)) AS TIMESTAMP) AS day
        |), u AS (SELECT DISTINCT user_id FROM events),
        |obs AS (
        |  SELECT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
        |    round(sum(value), 6) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        |), grid AS (
        |  SELECT u.user_id, d.day, o.v
        |  FROM u CROSS JOIN days d
        |  LEFT JOIN obs o ON o.user_id = u.user_id AND o.day = d.day
        |)
        |SELECT user_id, day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS v_filled,
        |  v IS NOT NULL AS observed
        |FROM grid""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val days = s.range(0, 30)
        .select(expr("timestampadd(DAY, id, timestamp'2024-01-01')").as("day"))
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
      val obs = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value")), 6).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(obs, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          last(col("v"), ignoreNulls = true).over(w).as("v_filled"),
          col("v").isNotNull.as("observed"))
    },

    // ---- cumulative distinct count (growth curve) ------------------------
    // "Distinct users ever seen, per event type, by day" — the DAU/
    // retention growth primitive. Naive cumulative COUNT(DISTINCT) over
    // an expanding window re-scans history per day; this is the
    // scale form: distinct-ness is resolved ONCE by the (event_type,
    // user) first-seen aggregation (the only big shuffle), then the
    // curve is a running sum over the tiny (type, day) rollup, windowed
    // per event_type — no expanding-window rescan, no global sort.
    sql("q68_cumulative_distinct",
      """WITH f AS (
        |  SELECT event_type, user_id,
        |    min(CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)) AS day
        |  FROM events GROUP BY 1, 2
        |), per AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM f GROUP BY 1, 2
        |)
        |SELECT event_type, day, new_users,
        |  CAST(sum(new_users) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
        |FROM per""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(min(date_trunc("day", col("ts"))).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("new_users"))
        .select(col("event_type"), col("day"), col("new_users"),
          sum(col("new_users")).over(w).cast("long").as("cum_users"))
    },

    // ---- ordered event funnel (view → click → purchase) ------------------
    // Per user, the furthest stage reached under a 24h conversion window
    // per hop: first view, first click within 24h AFTER it, first
    // purchase within 24h after THAT — order matters (a purchase before
    // the click doesn't count), which is what separates a funnel from
    // three independent filters. Timestamps compared as microsecond
    // longs (exact integer math, the q65 rule). Scale shape: three
    // per-user min-aggregations and left joins, ALL keyed on user_id —
    // one shuffle partitioning serves every stage; no window over the
    // raw event stream, no cross-user state.
    sql("q69_event_funnel",
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events
        |), fv AS (
        |  SELECT user_id, min(us) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY user_id
        |), fc AS (
        |  SELECT e.user_id, min(e.us) AS t2
        |  FROM e JOIN fv ON fv.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.us > fv.t1
        |    AND e.us <= fv.t1 + 86400000000
        |  GROUP BY e.user_id
        |), fp AS (
        |  SELECT e.user_id, min(e.us) AS t3
        |  FROM e JOIN fc ON fc.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us > fc.t2
        |    AND e.us <= fc.t2 + 86400000000
        |  GROUP BY e.user_id
        |)
        |SELECT u.user_id,
        |  CAST(CASE WHEN fp.user_id IS NOT NULL THEN 3
        |            WHEN fc.user_id IS NOT NULL THEN 2
        |            WHEN fv.user_id IS NOT NULL THEN 1
        |            ELSE 0 END AS BIGINT) AS stage
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN fv ON fv.user_id = u.user_id
        |LEFT JOIN fc ON fc.user_id = u.user_id
        |LEFT JOIN fp ON fp.user_id = u.user_id""".stripMargin) { (s, d) =>
      // Spark plan: NOT the oracle's four-scan form — the corpus is read
      // ONCE, shuffled ONCE on user_id, and the funnel folds through the
      // BOUNDED FunnelAggregator (min view + bottom-K clicks/purchases,
      // ≤ 2K+3 longs per user even mid-merge). The earlier collect_list
      // fold was equivalent but materialized every event of a user in one
      // aggregation buffer — an executor OOM for a single bot key at
      // 100 TB. The sketch answers the funnel's "smallest event after t"
      // questions exactly (kept = K smallest) and raises a loud in-query
      // error in the one undeterminable configuration instead of
      // guessing. No event_type pre-filter: a user whose only events are
      // OTHER types must still surface at stage 0 (the aggregator keeps
      // presence for those rows).
      val funnel = udaf(new graft.functions.FunnelAggregator(86400000000L, 1000))
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(funnel(unix_micros(col("ts")), col("event_type")).as("stage"))
    },

    // ---- cohort retention matrix -----------------------------------------
    // Users cohorted by first-seen day; retention = fraction of the
    // cohort active again exactly N days later (N ∈ {1, 7, 14}). Scale
    // shape: activity distinct-ness resolved ONCE by the (user, day)
    // dedup (the q68 rule), cohorts by one user-keyed min-agg, then the
    // offset membership is a keyed join back on (user, day) — the offset
    // list is 3 literal rows (bounded broadcast). The output is a tiny
    // (cohort × offset) matrix; no per-day corpus re-scan.
    sql("q70_retention_cohorts",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
        |  FROM events
        |), cohort AS (
        |  SELECT user_id, min(day) AS c0 FROM ud GROUP BY user_id
        |), offs AS (SELECT unnest([1, 7, 14]) AS off),
        |ret AS (
        |  SELECT c.c0, o.off,
        |    CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_active
        |  FROM cohort c
        |  JOIN offs o ON true
        |  JOIN ud ON ud.user_id = c.user_id
        |    AND ud.day = c.c0 + to_days(CAST(o.off AS INTEGER))
        |  GROUP BY 1, 2
        |), sizes AS (
        |  SELECT c0, CAST(count(*) AS BIGINT) AS n_cohort FROM cohort GROUP BY c0
        |)
        |SELECT s.c0 AS cohort_day, CAST(o.off AS BIGINT) AS retention_day,
        |  s.n_cohort, coalesce(r.n_active, 0) AS n_active,
        |  round(coalesce(r.n_active, 0) * 1.0 / s.n_cohort, 6) AS rate
        |FROM sizes s CROSS JOIN offs o
        |LEFT JOIN ret r ON r.c0 = s.c0 AND r.off = o.off""".stripMargin) { (s, d) =>
      import s.implicits._
      val ud = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
      val cohort = ud.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
      val offs = Seq(1, 7, 14).toDF("off")
      val ret = cohort.crossJoin(broadcast(offs))
        .withColumn("rday", expr("timestampadd(DAY, off, c0)"))
        .join(ud.withColumnRenamed("day", "rday"), Seq("user_id", "rday"))
        .groupBy(col("c0"), col("off"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = cohort.groupBy(col("c0")).agg(count(lit(1)).as("n_cohort"))
      sizes.crossJoin(broadcast(offs))
        .join(ret, Seq("c0", "off"), "left")
        .select(col("c0").as("cohort_day"), col("off").cast("long").as("retention_day"),
          col("n_cohort"), coalesce(col("n_active"), lit(0L)).as("n_active"),
          round(coalesce(col("n_active"), lit(0L)) * lit(1.0) / col("n_cohort"), 6)
            .as("rate"))
    },

    // ---- mode aggregation (most frequent value per group) ----------------
    // "Dominant action per user": the mode of event_type, tie-broken
    // deterministically (higher count wins, then lexicographic value) —
    // Spark has no mode() aggregate; the scale form is this two-phase
    // count-then-rank: ONE keyed shuffle for the (user, value) counts (a
    // partial agg halves it map-side) and a per-user window over ≤
    // |value domain| rows — never a per-group sort of raw events.
    sql("q71_mode_per_group",
      """SELECT user_id, event_type AS mode_event, n FROM (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY count(*) DESC, event_type) AS rn
        |  FROM events GROUP BY user_id, event_type) t
        |WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("n").desc, col("mode_event"))
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type").as("mode_event"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("mode_event"), col("n"))
    },

    // ---- rolling 7-day active users (trailing-window distinct) -----------
    // Exact trailing-7-day DAU per day. The oracle states it as a range
    // join (day-6 … day]; the Spark plan is the SCALE form: each (user,
    // activity-day) row map-side EXPLODES to the ≤7 report days it
    // covers, then one keyed distinct-count per day — no non-equi join,
    // no per-day history rescan, shuffle keyed on (report day, user).
    // Report days are clamped to days that exist in the corpus via a
    // semi-join against the (bounded, calendar-sized) day set. At
    // larger windows the remedy is bitmap/HLL state per day — the q39
    // posture — this is the exact form DuckDB can replay.
    sql("q72_rolling_dau",
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day
        |  FROM events
        |), days AS (SELECT DISTINCT day FROM ud)
        |SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS dau7
        |FROM days d JOIN ud u
        |  ON u.day <= d.day AND u.day > d.day - INTERVAL 7 DAY
        |GROUP BY d.day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("aday")).distinct()
      val days = ud.select(col("aday").as("day")).distinct()
      val covered = ud
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("i"), col("aday"))
        .select(col("user_id"),
          expr("timestampadd(DAY, i, aday)").as("day"))
      covered
        .join(days, Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau7"))
    },

    // ---- Pareto coverage (top-p mass selection) --------------------------
    // Which users make up the first 80% of purchase value — the Pareto
    // cut that powers "focus on the head" sampling and abuse triage, and
    // the same top-p primitive nucleus sampling uses over token mass.
    // The running total is EXACT DECIMAL over the 6-dp per-user values
    // and the 80% test is a decimal cross-multiply ((cum−v)·10 < t·8),
    // so the boundary row cannot flip on double summation order — both
    // engines fold identical decimals in the identical window order.
    // The cumulative window runs over the AGGREGATED user domain (one
    // row per user), not raw events; its global order uses the value-
    // descending sort the output needs anyway.
    sql("q73_pareto_coverage",
      """WITH uv AS (
        |  SELECT user_id, CAST(round(sum(value), 6) AS DECIMAL(18,6)) AS v
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id
        |), tot AS (SELECT sum(v) AS t FROM uv),
        |c AS (
        |  SELECT user_id, v,
        |    sum(v) OVER (ORDER BY v DESC, user_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM uv
        |)
        |SELECT user_id, CAST(v AS DOUBLE) AS value,
        |  round(CAST(cum AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS cum_share,
        |  (cum - v) * 10 < t.t * 8 AS in_top80
        |FROM c, tot t""".stripMargin) { (s, d) =>
      // two-pass distributed prefix sum (Relational.globalRunningSum,
      // exact-decimal accumulation): no single-partition Window even
      // though the domain is already aggregated — exact decimal folds
      // make the result independent of the partitioning
      val uv = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(col("value")), 6).cast("decimal(18,6)").as("v"))
      val tot = uv.agg(sum(col("v")).as("t"))
      graft.operators.Relational
        .globalRunningSum(uv, Seq(col("v").desc, col("user_id")), col("v"), "cum")
        .crossJoin(broadcast(tot))
        .select(col("user_id"), col("v").cast("double").as("value"),
          round(col("cum").cast("double") / col("t").cast("double"), 6).as("cum_share"),
          ((col("cum") - col("v")) * 10 < col("t") * 8).as("in_top80"))
    },

    // ---- robust outliers: median absolute deviation per group ------------
    // The robust alternative to z-scores (q48's mean/stddev family):
    // median and MAD shrug off the very outliers they're hunting. Two
    // exact-percentile passes (the q38 contract; approx_percentile /
    // q64's sketch is the 100 TB path — exact percentile buffers a
    // group's values), a keyed join back on event_type, flags scan-side.
    // The flag compares 6-dp ROUNDED deviation against the 6-dp ROUNDED
    // threshold in both engines — no raw-float boundary. 4.4478 =
    // 3·1.4826 (the Gaussian-consistency constant), interpolated from
    // one Scala literal into both engines.
    sql("q74_mad_outliers", {
      s"""WITH med AS (
         |  SELECT event_type, quantile_cont(value, 0.5) AS med
         |  FROM events GROUP BY event_type
         |), dev AS (
         |  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS adev
         |  FROM events e JOIN med m USING (event_type)
         |), mad AS (
         |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
         |  FROM dev GROUP BY event_type
         |)
         |SELECT d.event_id, d.event_type, d.value,
         |  round(d.adev, 6) AS abs_dev,
         |  round($MadScale * m2.mad, 6) AS threshold,
         |  round(d.adev, 6) > round($MadScale * m2.mad, 6) AS is_outlier
         |FROM dev d JOIN mad m2 USING (event_type)""".stripMargin
    }) { (s, d) =>
      madOutliers(Tables.events(s, d))
    }
  )

  /** 3·1.4826 — the MAD-to-sigma consistency constant times the 3σ cut;
    * interpolated into the q74 oracle.
    */
  val MadScale = 4.4478

  /** See the `q74` registry notes. `ev` needs (event_id, event_type, value). */
  def madOutliers(ev: DataFrame): DataFrame = {
    val e = ev.select(col("event_id"), col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = e.join(med, Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    dev.join(mad, Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("adev"), 6).as("abs_dev"),
        round(lit(MadScale) * col("mad"), 6).as("threshold"),
        (round(col("adev"), 6) > round(lit(MadScale) * col("mad"), 6))
          .as("is_outlier"))
  }
}
