package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Scalar-function inventory (SURVEY.md §2b "Scalar functions"): string,
  * math, datetime, conditional, JSON and array functions. All are Spark
  * built-ins (whole-stage-codegen'd); no UDFs anywhere — a deliberate
  * 100 TB choice (UDFs break codegen and, for non-JVM ones, add per-row
  * serialization).
  *
  * Cross-engine notes baked into the oracle twins:
  *  - Spark `ceil`/`floor` return LONG, DuckDB's return DOUBLE → oracle casts.
  *  - Spark `dayofweek` is 1=Sunday..7=Saturday; DuckDB `dayofweek` is
  *    0=Sunday..6 → oracle adds 1.
  *  - `ln`/transcendentals may differ in the last ulp between libm
  *    implementations → rounded to 6 decimals on both sides.
  */
object Scalars {

  /** String functions over part. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        expr("split_part(p_type, ' ', 1)").as("type_first_word"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        expr("replace(p_name, ' ', '_')").as("name_snake"),
        trim(col("p_name")).as("name_trim"))
      .orderBy(col("p_partkey"))
  }

  val stringFuncsSql: String =
    """SELECT p_partkey,
      |  lower(p_name) AS name_lower,
      |  upper(p_brand) AS brand_upper,
      |  CAST(length(p_name) AS INTEGER) AS name_len,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  split_part(p_type, ' ', 1) AS type_first_word,
      |  concat_ws('-', p_brand, p_type) AS brand_type,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  replace(p_name, ' ', '_') AS name_snake,
      |  trim(p_name) AS name_trim
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Math functions over customer balances. */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("bal_abs"),
        round(col("c_acctbal"), 1).as("bal_round1"),
        ceil(col("c_acctbal")).as("bal_ceil"),
        floor(col("c_acctbal")).as("bal_floor"),
        round(sqrt(abs(col("c_acctbal"))), 6).as("bal_sqrt"),
        round(log(abs(col("c_acctbal")) + lit(1.0)), 6).as("bal_ln"),
        pmod(col("c_custkey"), lit(7L)).as("key_mod7"),
        (col("c_acctbal") * 2.0 + 1.0).as("bal_affine"))
      .orderBy(col("c_custkey"))
  }

  val mathFuncsSql: String =
    """SELECT c_custkey,
      |  abs(c_acctbal) AS bal_abs,
      |  round(c_acctbal, 1) AS bal_round1,
      |  CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
      |  CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
      |  round(sqrt(abs(c_acctbal)), 6) AS bal_sqrt,
      |  round(ln(abs(c_acctbal) + 1.0), 6) AS bal_ln,
      |  c_custkey % 7 AS key_mod7,
      |  c_acctbal * 2.0 + 1.0 AS bal_affine
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Datetime functions over orders. */
  def datetimeFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date")).as("days_to_1998"))
      .orderBy(col("o_orderkey"))
  }

  val datetimeFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INTEGER) AS yr,
      |  CAST(month(o_orderdate) AS INTEGER) AS mo,
      |  CAST(day(o_orderdate) AS INTEGER) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
      |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
      |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  CAST(DATE '1998-12-31' - CAST(o_orderdate AS DATE) AS INTEGER) AS days_to_1998
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** CASE WHEN / coalesce / nullif over orders. */
  def conditionalFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 300000.0, "large")
          .when(col("o_totalprice") >= 100000.0, "medium")
          .otherwise("small").as("size_tier"),
        nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_label"),
        (col("o_orderstatus") === "F").cast(IntegerType).as("is_finished"))
      .orderBy(col("o_orderkey"))
  }

  val conditionalFuncsSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 300000.0 THEN 'large'
      |       WHEN o_totalprice >= 100000.0 THEN 'medium'
      |       ELSE 'small' END AS size_tier,
      |  NULLIF(o_orderstatus, 'O') AS status_or_null,
      |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_label,
      |  CAST(o_orderstatus = 'F' AS INTEGER) AS is_finished
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** JSON extraction from the events.props payload. */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
        get_json_object(col("props"), "$.missing").as("missing_val"))
      .orderBy(col("event_id"))
  }

  val jsonFuncsSql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
      |  json_extract_string(props, '$.missing') AS missing_val
      |FROM events ORDER BY event_id""".stripMargin

  /** Struct and map construction + field access (nested types as per-row
    * scalars, so the output stays oracle-comparable). */
  def structMapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val st = struct(col("p_brand").as("brand"), col("p_size").as("sz"))
    val m = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
    p.select(
        col("p_partkey"),
        st.getField("sz").as("struct_size"),
        st.getField("brand").as("struct_brand"),
        element_at(m, "brand").as("map_brand"),
        element_at(m, "type").as("map_type"),
        size(map_keys(m)).as("n_keys"))
      .orderBy(col("p_partkey"))
  }

  val structMapFuncsSql: String =
    """SELECT p_partkey,
      |  struct_pack(brand := p_brand, sz := p_size).sz AS struct_size,
      |  struct_pack(brand := p_brand, sz := p_size).brand AS struct_brand,
      |  (MAP {'brand': p_brand, 'type': p_type})['brand'][1] AS map_brand,
      |  (MAP {'brand': p_brand, 'type': p_type})['type'][1] AS map_type,
      |  CAST(cardinality(MAP {'brand': p_brand, 'type': p_type}) AS INTEGER) AS n_keys
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Array (higher-order) functions over the embedding vectors: size,
    * element access, element-wise transform + fold. Sums run left-to-right
    * over doubles in both engines; rounded to 6 decimals anyway. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val em = Tables.embeddings(spark, dir)
    em.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("e0"),
        round(aggregate(
          transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x), 6).as("sq_norm"),
        round(sqrt(aggregate(
          transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x)), 6).as("l2_norm"))
      .orderBy(col("vec_id"))
  }

  val arrayFuncsSql: String =
    """SELECT vec_id,
      |  CAST(len(embedding) AS INTEGER) AS dim,
      |  CAST(embedding[1] AS DOUBLE) AS e0,
      |  round(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
      |  round(sqrt(list_sum(list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** Bitwise scalar family census: AND / OR / XOR, shifts, and popcount
    * over the integer keys — per-row codegen folded into one
    * map-side-combined aggregate (the bit ops family the other scalar
    * queries do not touch; `bit_count` is also the simhash hot path,
    * here exercised as a first-class scalar). */
  def bitwiseFuncs(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(col("l_linestatus"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("band"),
        col("l_orderkey").bitwiseOR(col("l_suppkey")).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("bxor"),
        expr("cast(bit_count(l_orderkey) as bigint)").as("pop"),
        shiftleft(col("l_orderkey"), 2).as("shl"),
        shiftright(col("l_partkey"), 1).as("shr"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("band")).cast("long").as("sum_and"),
        sum(col("bor")).cast("long").as("sum_or"),
        sum(col("bxor")).cast("long").as("sum_xor"),
        sum(col("pop")).cast("long").as("sum_popcount"),
        sum(col("shl")).cast("long").as("sum_shl"),
        sum(col("shr")).cast("long").as("sum_shr"))
      .orderBy(col("l_linestatus"))
  }

  val bitwiseFuncsSql: String =
    """SELECT l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(l_orderkey & l_partkey) AS BIGINT) AS sum_and,
      |  CAST(SUM(l_orderkey | l_suppkey) AS BIGINT) AS sum_or,
      |  CAST(SUM(xor(l_orderkey, l_partkey)) AS BIGINT) AS sum_xor,
      |  CAST(SUM(bit_count(l_orderkey)) AS BIGINT) AS sum_popcount,
      |  CAST(SUM(l_orderkey << 2) AS BIGINT) AS sum_shl,
      |  CAST(SUM(l_partkey >> 1) AS BIGINT) AS sum_shr
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** URL parsing — the web-corpus canonicalization staple (host for
    * per-domain dedup/quotas, path for routing, query params for
    * tracking-strip). URLs are synthesized from document columns (the
    * testdata has no URL column), then decomposed with Spark's builtin
    * `parse_url` (codegen'd, java.net.URI semantics). The DuckDB twin has
    * no parse_url, so it re-derives each component with anchored regexes
    * — an independent cross-check of the parse, not a reimplementation.
    * Per-row expression work only; at 100 TB this runs inside the scan. */
  def urlFuncs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val url = concat(lit("https://"), col("source"),
      lit(".example.com/docs/"), col("lang"), lit("/"), col("doc_id"),
      lit("?q="), col("n_chars"), lit("&page=2"))
    d.select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        expr("parse_url(url, 'PROTOCOL')").as("scheme"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'q')").as("q_param"),
        expr("split_part(parse_url(url, 'HOST'), '.', 1)").as("subdomain"))
      .orderBy(col("doc_id"))
  }

  val urlFuncsSql: String =
    """WITH u AS (
      |  SELECT doc_id,
      |    'https://' || source || '.example.com/docs/' || lang || '/' ||
      |      CAST(doc_id AS VARCHAR) || '?q=' || CAST(n_chars AS VARCHAR) ||
      |      '&page=2' AS url
      |  FROM documents)
      |SELECT doc_id, url,
      |  regexp_extract(url, '^([a-z]+)://', 1) AS scheme,
      |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
      |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
      |  regexp_extract(url, '[?&]q=([^&#]*)', 1) AS q_param,
      |  split_part(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1), '.', 1)
      |    AS subdomain
      |FROM u ORDER BY doc_id""".stripMargin
}
