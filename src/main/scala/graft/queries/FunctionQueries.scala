package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function families (SURVEY §2.b): string, date/time, math,
  * conditional, array, map/JSON, cast. All codegen'd builtins — no UDFs.
  */
object FunctionQueries {
  import Tables.load

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q_string_funcs",
      (s, dir) => {
        load(s, dir, "part")
          .filter(col("p_partkey") < 500)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("uname"),
            lower(col("p_brand")).as("lbrand"),
            substring(col("p_name"), 1, 4).as("prefix"),
            length(col("p_name")).as("name_len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
            trim(col("p_name")).as("tname"),
            size(split(col("p_name"), " ")).as("n_words"),
            regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
            col("p_type").like("%ECO%").as("is_eco"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  upper(p_name) AS uname,
             |  lower(p_brand) AS lbrand,
             |  substring(p_name, 1, 4) AS prefix,
             |  length(p_name) AS name_len,
             |  concat_ws('-', p_brand, p_type) AS brand_type,
             |  trim(p_name) AS tname,
             |  len(string_split(p_name, ' ')) AS n_words,
             |  coalesce(regexp_extract(p_brand, '[0-9]+', 0), '') AS brand_num,
             |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
             |  p_type LIKE '%ECO%' AS is_eco
             |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin)),

    QueryDef(
      "q_date_funcs",
      (s, dir) => {
        load(s, dir, "orders")
          .filter(col("o_orderkey") < 1000)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("y"),
            month(col("o_orderdate")).as("m"),
            dayofmonth(col("o_orderdate")).as("d"),
            // every date-valued result rides as INTEGER epoch days (the
            // r15 output contract: no temporal types in registered
            // outputs) — the trunc/add/diff functions stay fully
            // exercised, only the final representation is integral
            datediff(date_trunc("month", col("o_orderdate")).cast(DateType),
              lit("1970-01-01").cast(DateType)).as("month_start_epoch"),
            datediff(date_add(col("o_orderdate").cast(DateType), 30),
              lit("1970-01-01").cast(DateType)).as("plus30_epoch"),
            datediff(lit("1998-01-01").cast(DateType),
              col("o_orderdate").cast(DateType)).as("days_to_98"),
            datediff(col("o_orderdate").cast(DateType),
              lit("1970-01-01").cast(DateType)).as("odate_epoch"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(day(o_orderdate) AS INT) AS d,
             |  CAST(date_diff('day', DATE '1970-01-01',
             |    CAST(date_trunc('month', o_orderdate) AS DATE)) AS INT)
             |    AS month_start_epoch,
             |  CAST(date_diff('day', DATE '1970-01-01',
             |    CAST(o_orderdate AS DATE) + 30) AS INT) AS plus30_epoch,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
             |    DATE '1998-01-01') AS INT) AS days_to_98,
             |  CAST(date_diff('day', DATE '1970-01-01',
             |    CAST(o_orderdate AS DATE)) AS INT) AS odate_epoch
             |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin)),

    QueryDef(
      "q_math_funcs",
      (s, dir) => {
        load(s, dir, "lineitem")
          .filter(col("l_orderkey") < 300)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            round(col("l_extendedprice"), 1).as("r1"),
            abs(col("l_discount") - lit(0.05)).as("absd"),
            floor(col("l_quantity")).as("flr"),
            ceil(col("l_quantity")).as("cl"),
            round(pow(col("l_quantity"), 2), 2).as("sq"),
            round(log(col("l_extendedprice")), 4).as("lnp"),
            round(log10(col("l_extendedprice")), 4).as("log10p"),
            round(sqrt(col("l_quantity")), 4).as("sqrtq"))
          // no unique key on lineitem rows → total order over output columns
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("r1"), col("absd"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  round(l_extendedprice, 1) AS r1,
             |  abs(l_discount - 0.05) AS absd,
             |  CAST(floor(l_quantity) AS BIGINT) AS flr,
             |  CAST(ceil(l_quantity) AS BIGINT) AS cl,
             |  round(pow(l_quantity, 2), 2) AS sq,
             |  round(ln(l_extendedprice), 4) AS lnp,
             |  round(log10(l_extendedprice), 4) AS log10p,
             |  round(sqrt(l_quantity), 4) AS sqrtq
             |FROM lineitem WHERE l_orderkey < 300
             |ORDER BY l_orderkey, l_linenumber, r1, absd""".stripMargin)),

    QueryDef(
      "q_cond_funcs",
      (s, dir) => {
        load(s, dir, "customer")
          .select(
            col("c_custkey"),
            when(col("c_acctbal") > 5000, "high")
              .when(col("c_acctbal") > 0, "mid")
              .otherwise("low").as("bal_class"),
            coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("NONE"))
              .as("seg_or_none"),
            greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
            least(col("c_acctbal"), lit(1000.0)).as("capped_bal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN c_acctbal > 5000 THEN 'high'
             |       WHEN c_acctbal > 0 THEN 'mid' ELSE 'low' END AS bal_class,
             |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'NONE') AS seg_or_none,
             |  greatest(c_acctbal, 0.0) AS pos_bal,
             |  least(c_acctbal, 1000.0) AS capped_bal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // JSON: props is a JSON string {"k": <int>} — parse both ways
    // (from_json with schema, and direct path extraction).
    QueryDef(
      "q_json_funcs",
      (s, dir) => {
        load(s, dir, "events")
          .withColumn("k1",
            from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
              .getField("k"))
          .withColumn("k2", get_json_object(col("props"), "$.k").cast(IntegerType))
          .groupBy((col("k1") % 10).as("k_mod"))
          .agg(count(lit(1)).as("cnt"),
            sum(when(col("k1") === col("k2"), 1).otherwise(0)).as("n_consistent"))
          .orderBy(col("k_mod"))
      },
      Some("""SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
             |  count(*) AS cnt, count(*) AS n_consistent
             |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin)),

    // VARIANT (Spark 4 semi-structured type): parse_json into the binary
    // variant encoding once, then typed path access via variant_get —
    // the schema-on-read path for ragged JSON, cheaper than re-parsing
    // strings per extraction and open where from_json's fixed schema is
    // closed. Aggregation semantics identical to the string-JSON query,
    // so DuckDB's json_extract is a valid oracle.
    QueryDef(
      "q_variant_json",
      (s, dir) => {
        load(s, dir, "events")
          .select(parse_json(col("props")).as("v"))
          .select(variant_get(col("v"), "$.k", "int").as("k"))
          .groupBy((col("k") % 10).as("k_mod"))
          .agg(count(lit(1)).as("cnt"), min(col("k")).as("min_k"),
            max(col("k")).as("max_k"))
          .orderBy(col("k_mod"))
      },
      Some("""SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_mod,
             |  count(*) AS cnt,
             |  min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
             |  max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
             |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin)),

    // Map functions: build a map from columns, read it back via
    // map_keys / map_values / element_at.
    QueryDef(
      "q_map_funcs",
      (s, dir) => {
        load(s, dir, "part")
          .filter(col("p_partkey") < 100)
          .withColumn("m", map(lit("brand"), col("p_brand"),
            lit("type"), col("p_type")))
          .select(
            col("p_partkey"),
            array_join(sort_array(map_keys(col("m"))), ",").as("keys_csv"),
            size(map_values(col("m"))).as("n_vals"),
            element_at(col("m"), "brand").as("brand_via_map"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, 'brand,type' AS keys_csv, 2 AS n_vals,
             |       p_brand AS brand_via_map
             |FROM part WHERE p_partkey < 100 ORDER BY p_partkey""".stripMargin)),

    // Explode of a map (1 row → one row per entry).
    QueryDef(
      "q_map_explode",
      (s, dir) => {
        load(s, dir, "part")
          .withColumn("m", map(lit("brand"), col("p_brand"),
            lit("type"), col("p_type")))
          .select(explode(col("m")))
          .groupBy(col("key"), col("value"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("key"), col("value"))
      },
      Some("""SELECT key, value, count(*) AS cnt FROM (
             |  SELECT 'brand' AS key, p_brand AS value FROM part
             |  UNION ALL SELECT 'type', p_type FROM part)
             |GROUP BY key, value ORDER BY key, value""".stripMargin)),

    // Decimal exactness: money math in DECIMAL(18,2) on both sides. The
    // aggregation is exact decimal arithmetic end-to-end; the OUTPUT is
    // integer cents (BIGINT) because a DECIMAL output column's string form
    // is ambiguous across compare harnesses ("1251869314.00" survives
    // pyarrow but becomes "1251869314.0" through a pandas/float hop) —
    // integer cents hash identically on every conversion path.
    QueryDef(
      "q_cast_decimal",
      (s, dir) => {
        load(s, dir, "orders")
          .select(col("o_orderstatus"),
            col("o_totalprice").cast(DecimalType(18, 2)).as("price_dec"))
          .groupBy(col("o_orderstatus"))
          .agg((sum(col("price_dec")) * lit(100)).cast(LongType).as("total_cents"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Array functions over the embeddings table (64-dim float vectors):
    // size/slice/element access, and vector math via transform+aggregate —
    // the sequential fold keeps float summation order identical to DuckDB's
    // list_sum, so values match exactly before rounding.
    QueryDef(
      "q_array_funcs",
      (s, dir) => {
        load(s, dir, "embeddings")
          .filter(col("vec_id") < 100)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(element_at(col("embedding"), 1).cast(DoubleType), 5).as("first_el"),
            round(expr(
              "aggregate(slice(embedding, 1, 8), 0D, (acc, x) -> acc + CAST(x AS DOUBLE))"),
              5).as("head_sum"),
            round(sqrt(expr(
              "aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))")),
              5).as("l2_norm"))
          .orderBy(col("vec_id"))
      },
      Some("""SELECT vec_id,
             |  len(embedding) AS dim,
             |  round(CAST(embedding[1] AS DOUBLE), 5) AS first_el,
             |  round(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))), 5) AS head_sum,
             |  round(sqrt(list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2_norm
             |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin)),

    // Array set operations + containment.
    QueryDef(
      "q_array_setops",
      (s, dir) => {
        load(s, dir, "part")
          .filter(col("p_partkey") < 50)
          .withColumn("words", split(col("p_name"), " "))
          .withColumn("brand_words", split(lower(col("p_brand")), "#"))
          .select(
            col("p_partkey"),
            array_join(array_sort(array_distinct(col("words"))), ",").as("uniq"),
            array_join(array_sort(array_intersect(col("words"),
              array(lit("lace"), lit("blue"), lit("green")))), ",").as("common"),
            array_join(array_sort(array_except(
              array(lit("lace"), lit("blue")), col("words"))), ",").as("missing"),
            array_contains(col("words"), "blue").as("has_blue"),
            size(array_union(col("words"), col("brand_words"))).as("n_union"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
             |  array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS uniq,
             |  coalesce(array_to_string(list_sort(list_intersect(string_split(p_name, ' '),
             |      ['lace', 'blue', 'green'])), ','), '') AS common,
             |  array_to_string(list_sort(list_filter(['lace', 'blue'],
             |      w -> NOT list_contains(string_split(p_name, ' '), w))), ',') AS missing,
             |  list_contains(string_split(p_name, ' '), 'blue') AS has_blue,
             |  len(list_distinct(list_concat(string_split(p_name, ' '),
             |      string_split(lower(p_brand), '#')))) AS n_union
             |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin)),

    // Struct construction and field access.
    QueryDef(
      "q_struct_funcs",
      (s, dir) => {
        load(s, dir, "customer")
          .filter(col("c_custkey") < 100)
          .withColumn("info", struct(col("c_name").as("name"),
            col("c_acctbal").as("bal")))
          .select(
            col("c_custkey"),
            col("info.name").as("name"),
            (col("info.bal") > 0).as("positive"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
             |  struct_extract({'name': c_name, 'bal': c_acctbal}, 'name') AS name,
             |  struct_extract({'name': c_name, 'bal': c_acctbal}, 'bal') > 0 AS positive
             |FROM customer WHERE c_custkey < 100 ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_explode",
      (s, dir) => {
        load(s, dir, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("word"))
      },
      Some("""SELECT word, count(*) AS cnt
             |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
             |GROUP BY word ORDER BY word""".stripMargin)),

    QueryDef(
      "q_posexplode",
      (s, dir) => {
        load(s, dir, "part")
          .filter(col("p_partkey") < 20)
          .select(col("p_partkey"),
            posexplode(split(col("p_name"), " ")))
          .withColumnRenamed("pos", "word_pos")
          .withColumnRenamed("col", "word")
          .orderBy(col("p_partkey"), col("word_pos"))
      },
      Some("""SELECT p_partkey, CAST(pos - 1 AS INT) AS word_pos, word
             |FROM (SELECT p_partkey,
             |        unnest(string_split(p_name, ' ')) AS word,
             |        generate_subscripts(string_split(p_name, ' '), 1) AS pos
             |      FROM part WHERE p_partkey < 20)
             |ORDER BY p_partkey, word_pos""".stripMargin)),

    // Null-preserving explode: rows with an empty (or null) array survive
    // with a NULL element instead of vanishing — the outer-generator
    // semantics a LEFT JOIN LATERAL gives in SQL. DuckDB mirror: rewrite
    // empty lists to [NULL] before unnest (exactly explode_outer's
    // contract).
    QueryDef(
      "q_explode_outer",
      (s, dir) => {
        load(s, dir, "part")
          .filter(col("p_partkey") < 200)
          .withColumn("toks",
            when(col("p_size") % 5 === 0, array().cast("array<string>"))
              .otherwise(split(col("p_type"), " ")))
          .select(col("p_partkey"), explode_outer(col("toks")).as("tok"))
          .orderBy(col("p_partkey"), col("tok"))
      },
      Some("""SELECT p_partkey, unnest(
             |    CASE WHEN p_size % 5 = 0 THEN [NULL]
             |         ELSE string_split(p_type, ' ') END) AS tok
             |FROM part WHERE p_partkey < 200
             |ORDER BY p_partkey, tok NULLS FIRST""".stripMargin)),

    // ANSI-safe arithmetic: the try_* family returns NULL instead of
    // raising on division by zero, failed casts, overflow, and
    // out-of-range element access — the semantics that keep a 100 TB job
    // from dying on one malformed row. Overflow: try_add against
    // Long.MaxValue nulls for every positive key (DuckDB mirrors with a
    // literal NULL since its BIGINT overflow always raises).
    QueryDef(
      "q_try_funcs",
      (s, dir) => {
        load(s, dir, "orders")
          .filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"),
            round(expr("try_divide(o_totalprice, o_custkey % 7)"), 4)
              .as("div_or_null"),
            expr("try_cast(o_orderpriority AS INT)").as("cast_or_null"),
            expr("try_add(o_orderkey + 1, 9223372036854775807L)")
              .as("overflow_null"),
            expr("try_element_at(split(o_orderpriority, '-'), 99)")
              .as("oob_null"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey,
             |  round(o_totalprice / nullif(o_custkey % 7, 0), 4)
             |    AS div_or_null,
             |  TRY_CAST(o_orderpriority AS INT) AS cast_or_null,
             |  CAST(NULL AS BIGINT) AS overflow_null,
             |  string_split(o_orderpriority, '-')[99] AS oob_null
             |FROM orders WHERE o_orderkey < 500
             |ORDER BY o_orderkey""".stripMargin)),
  )
}
