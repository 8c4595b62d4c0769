package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans, projection/filter, distinct, joins, set ops, sort/limit/top-k.
  *
  * Reference anchor: repype has no relational operators — all transforms live
  * in user `Stage.process` bodies (`repype/stage.py:324-351`); this module is
  * the built-in operator surface per SURVEY.md §2.b, each a thin declarative
  * DataFrame plan so Catalyst handles pushdown/pruning/join selection.
  */
object RelationalQueries {
  import Tables.load

  private def tmpDir(sub: String): String = {
    val d = s"/root/repo/target/tmp/$sub"
    new java.io.File(d).mkdirs()
    d
  }

  val queries: Seq[QueryDef] = Seq(

    // ---- sources / sinks -------------------------------------------------
    QueryDef(
      "q_scan_project",
      (s, dir) => {
        // (l_orderkey, l_linenumber) is NOT unique in this synthetic data —
        // order by every output column for a deterministic total order.
        load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // CSV scan: write the (tiny) region table to CSV, read it back with a
    // pinned schema; oracle is the original parquet → verifies lossless scan.
    QueryDef(
      "q_scan_csv",
      (s, dir) => {
        val region = load(s, dir, "region")
        val out = tmpDir("csv_region")
        region.coalesce(1).write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true").schema(region.schema).csv(out)
          .orderBy(col("r_regionkey"))
      },
      Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")),

    // PERMISSIVE malformed-row handling — the ingest-robustness contract
    // real pipelines rely on (a 100 TB CSV/JSONL drop ALWAYS contains
    // bad rows; failing the job or silently dropping them are both
    // wrong): type-mismatch, under-length, and over-length rows keep
    // their parseable fields, and the RAW line lands in the corrupt
    // column for the dead-letter flow. The closed-form fixture plants
    // one of each malformation; the oracle restates the expected
    // salvage verbatim.
    QueryDef(
      "q_scan_csv_corrupt",
      (s, _) => {
        import org.apache.spark.sql.types._
        val out = tmpDir("csv_corrupt")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "rows.csv"),
          Seq("id,name,val", "1,alpha,10",
            "2,beta,twenty", // type mismatch: val unparseable
            "3,gamma,30",
            "4,delta", // under-length
            "5,eps,50,junk", // over-length
            "6,zeta,60").mkString("\n").getBytes("UTF-8"))
        val schema = new StructType().add("id", IntegerType)
          .add("name", StringType).add("val", IntegerType)
          .add("_corrupt_record", StringType)
        s.read.option("header", "true").option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(schema).csv(out)
          .select(col("id"), col("name"), col("val"),
            col("_corrupt_record").isNotNull.as("corrupt"))
          .orderBy(col("id"))
      },
      Some("""SELECT * FROM (VALUES
             |  (1, 'alpha', 10, false),
             |  (2, 'beta', CAST(NULL AS INT), true),
             |  (3, 'gamma', 30, false),
             |  (4, 'delta', CAST(NULL AS INT), true),
             |  (5, 'eps', 50, true),
             |  (6, 'zeta', 60, false))
             |  AS t(id, name, val, corrupt)
             |ORDER BY id""".stripMargin)),

    // Schema evolution under mergeSchema — the long-lived-dataset
    // contract (a corpus written over months gains columns; old files
    // must keep reading): two parquet file sets with DIFFERENT schemas
    // read as one table, the missing column null-filled for old files.
    QueryDef(
      "q_scan_parquet_evolved",
      (s, dir) => {
        val out = tmpDir("pq_evolved")
        val docs = load(s, dir, "documents")
        docs.filter(col("doc_id") < 10).select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$out/v1")
        docs.filter(col("doc_id") >= 10 && col("doc_id") < 20)
          .select(col("doc_id"), col("lang"), col("source"))
          .write.mode("overwrite").parquet(s"$out/v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$out/v1", s"$out/v2")
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN doc_id < 10 THEN NULL ELSE source END AS source
             |FROM documents WHERE doc_id < 20
             |ORDER BY doc_id""".stripMargin)),

    // JSONL malformed-row salvage — the SAME dead-letter contract for
    // the corpus interchange format LLM pipelines actually ship
    // (.jsonl): a type-mismatched field keeps the row's other fields
    // and records the raw line; a syntactically broken line yields an
    // all-null row with the raw line; a missing field is just null
    // (NOT corrupt); unknown extra fields are ignored. All pinned by
    // the closed-form fixture + restated oracle.
    QueryDef(
      "q_scan_jsonl_corrupt",
      (s, _) => {
        import org.apache.spark.sql.types._
        val out = tmpDir("jsonl_corrupt")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(out, "rows.jsonl"),
          Seq("""{"id":1,"name":"alpha","val":10}""",
            """{"id":2,"name":"beta","val":"twenty"}""", // type mismatch
            """{"id":3,"name":"gamma"}""", // missing field: NOT corrupt
            """{"id":4,"name":"delta","val":40,"extra":true}""", // extra ok
            """{broken json line""", // syntax: all-null + corrupt
            """{"id":6,"name":"zeta","val":60}""").mkString("\n")
            .getBytes("UTF-8"))
        val schema = new StructType().add("id", IntegerType)
          .add("name", StringType).add("val", IntegerType)
          .add("_corrupt_record", StringType)
        s.read.option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(schema).json(out)
          .select(col("id"), col("name"), col("val"),
            col("_corrupt_record").isNotNull.as("corrupt"))
          .orderBy(coalesce(col("id"), lit(-1)))
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(NULL AS INT), CAST(NULL AS VARCHAR),
             |    CAST(NULL AS INT), true),
             |  (1, 'alpha', 10, false),
             |  (2, 'beta', CAST(NULL AS INT), true),
             |  (3, 'gamma', CAST(NULL AS INT), false),
             |  (4, 'delta', 40, false),
             |  (6, 'zeta', 60, false))
             |  AS t(id, name, val, corrupt)
             |ORDER BY coalesce(id, -1)""".stripMargin)),

    QueryDef(
      "q_scan_json",
      (s, dir) => {
        val nation = load(s, dir, "nation")
        val out = tmpDir("json_nation")
        nation.coalesce(1).write.mode("overwrite").json(out)
        s.read.schema(nation.schema).json(out).orderBy(col("n_nationkey"))
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey")),

    // Raw text-lines source — the .txt/.jsonl shape every LLM corpus
    // ingest starts from: stage the documents' text as line files, read
    // them back with spark.read.text, aggregate corpus stats. (Oracle sums
    // are CAST to BIGINT: DuckDB widens sum(int) to HUGEINT, which the
    // hash compare distinguishes from int64.)
    QueryDef(
      "q_scan_text",
      (s, dir) => {
        val docs = load(s, dir, "documents").select(col("text"))
        val out = tmpDir("text_documents")
        docs.coalesce(1).write.mode("overwrite").text(out)
        s.read.text(out)
          .agg(count(lit(1)).as("n_lines"),
            min(length(col("value"))).as("min_len"),
            max(length(col("value"))).as("max_len"),
            sum(length(col("value"))).cast("long").as("total_chars"))
      },
      Some("""SELECT count(*) AS n_lines, min(length(text)) AS min_len,
             |  max(length(text)) AS max_len,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars
             |FROM documents""".stripMargin)),

    // ---- projection / filter / predicates --------------------------------
    QueryDef(
      "q_filter_pred",
      (s, dir) => {
        load(s, dir, "lineitem")
          .filter(col("l_shipdate").between("1997-01-01", "1997-12-31")
            && col("l_returnflag").isin("A", "R")
            && col("l_quantity") > 30)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            // raw double, no rounding: the op order is identical in both
            // engines so the IEEE result is bit-exact — rounding would
            // ADD flakiness at .005 boundaries
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       l_extendedprice * (1 - l_discount) AS revenue
             |FROM lineitem
             |WHERE l_shipdate BETWEEN '1997-01-01' AND '1997-12-31'
             |  AND l_returnflag IN ('A','R') AND l_quantity > 30
             |ORDER BY l_orderkey, l_linenumber, revenue""".stripMargin)),

    QueryDef(
      "q_filter_like_null",
      (s, dir) => {
        load(s, dir, "customer")
          .filter(col("c_name").like("Customer#00000011%")
            || (col("c_acctbal").isNotNull && col("c_acctbal") < -900))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE c_name LIKE 'Customer#00000011%'
             |   OR (c_acctbal IS NOT NULL AND c_acctbal < -900)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_distinct",
      (s, dir) => {
        load(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- joins -----------------------------------------------------------
    QueryDef(
      "q_join_inner",
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val customer = load(s, dir, "customer")
        orders.join(customer, orders("o_custkey") === customer("c_custkey"), "inner")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 2).as("total_price"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       round(sum(o_totalprice), 2) AS total_price
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // TPC-H Q5 shape: 5-way join; dims are broadcast so the only shuffle is
    // the lineitem⨝orders sort-merge/hash on orderkey + the final group-by.
    QueryDef(
      "q_join_multi",
      (s, dir) => {
        val lineitem = load(s, dir, "lineitem")
        val orders = load(s, dir, "orders")
        val customer = load(s, dir, "customer")
        val nation = load(s, dir, "nation")
        val region = load(s, dir, "region")
        lineitem
          .join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
          .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
          .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    QueryDef(
      "q_join_left",
      (s, dir) => {
        val customer = load(s, dir, "customer")
        val orders = load(s, dir, "orders")
        customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_join_right",
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val customer = load(s, dir, "customer")
        orders.join(customer, orders("o_custkey") === customer("c_custkey"), "right_outer")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_orders"),
            countDistinct(col("c_custkey")).as("n_cust"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(o_orderkey) AS n_orders,
             |       count(DISTINCT c_custkey) AS n_cust
             |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    QueryDef(
      "q_join_full",
      (s, dir) => {
        val left = load(s, dir, "customer").filter(col("c_custkey") < 500)
          .select(col("c_custkey"))
        val right = load(s, dir, "orders").filter(col("o_custkey") >= 300)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        left.join(right, left("c_custkey") === right("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("k"),
            col("c_custkey").isNotNull.as("has_cust"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS k,
             |       c_custkey IS NOT NULL AS has_cust,
             |       coalesce(n_orders, 0) AS n_orders
             |FROM (SELECT c_custkey FROM customer WHERE c_custkey < 500) l
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
             |                 FROM orders WHERE o_custkey >= 300
             |                 GROUP BY o_custkey) r
             |ON l.c_custkey = r.o_custkey
             |ORDER BY k""".stripMargin)),

    QueryDef(
      "q_join_semi",
      (s, dir) => {
        val customer = load(s, dir, "customer")
        val orders = load(s, dir, "orders").filter(col("o_totalprice") > 400000)
        customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
             |ORDER BY c_custkey""".stripMargin)),

    QueryDef(
      "q_join_anti",
      (s, dir) => {
        val customer = load(s, dir, "customer")
        val orders = load(s, dir, "orders")
        customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // Explicit broadcast of the dimension side (SURVEY §2.b Joins).
    QueryDef(
      "q_join_broadcast",
      (s, dir) => {
        val customer = load(s, dir, "customer")
        val nation = load(s, dir, "nation")
        customer.join(broadcast(nation),
            customer("c_nationkey") === nation("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
            round(avg(col("c_acctbal")), 2).as("avg_bal"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n_cust, round(avg(c_acctbal), 2) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // Theta (non-equi) join → BroadcastNestedLoopJoin on the tiny side.
    QueryDef(
      "q_join_theta",
      (s, dir) => {
        val region = load(s, dir, "region")
        val nation = load(s, dir, "nation")
        region.join(nation, region("r_regionkey") < nation("n_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_nations_above"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name, count(*) AS n_nations_above
             |FROM region JOIN nation ON r_regionkey < n_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    QueryDef(
      "q_join_cross",
      (s, dir) => {
        val r1 = load(s, dir, "region").select(col("r_name").as("r1"))
        val r2 = load(s, dir, "region").select(col("r_name").as("r2"))
        r1.crossJoin(r2).orderBy(col("r1"), col("r2"))
      },
      Some("""SELECT a.r_name AS r1, b.r_name AS r2
             |FROM region a CROSS JOIN region b ORDER BY r1, r2""".stripMargin)),

    // Interval/point-in-range join: price bands (broadcast) × orders.
    QueryDef(
      "q_join_range",
      (s, dir) => {
        val bands = s.createDataFrame(Seq(
          ("low", 0.0, 100000.0), ("mid", 100000.0, 300000.0),
          ("high", 300000.0, 1e9))).toDF("band", "lo", "hi")
        val orders = load(s, dir, "orders")
        orders.join(broadcast(bands),
            orders("o_totalprice") >= bands("lo") && orders("o_totalprice") < bands("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("band"))
      },
      Some("""SELECT band, count(*) AS n_orders
             |FROM orders JOIN (VALUES ('low', 0.0, 100000.0),
             |                         ('mid', 100000.0, 300000.0),
             |                         ('high', 300000.0, 1e9)) AS bands(band, lo, hi)
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    // each other — the semantics plain equality silently drops (NULL = NULL
    // is NULL, so those rows vanish from an inner join). Keys are nulled
    // deterministically (every 7th region slot) on both sides so the
    // null-match branch is actually exercised. Still a hash-equi-join:
    // Spark plans <=> as an EqualNullSafe key, no nested loop.
    QueryDef(
      "q_join_nullsafe",
      (s, dir) => {
        val a = load(s, dir, "supplier")
          .select(col("s_suppkey"),
            when(col("s_suppkey") % 7 === 0, lit(null))
              .otherwise(col("s_nationkey") % 5).as("ka"))
        val b = load(s, dir, "nation")
          .select(col("n_nationkey"),
            when(col("n_nationkey") % 7 === 0, lit(null))
              .otherwise(col("n_nationkey") % 5).as("kb"))
        a.join(b, a("ka") <=> b("kb"))
          .groupBy(col("ka"))
          .agg(count(lit(1)).as("n_pairs"),
            countDistinct(col("n_nationkey")).as("n_nations"))
          .orderBy(col("ka").asc_nulls_first)
      },
      Some("""WITH a AS (
             |  SELECT s_suppkey,
             |    CASE WHEN s_suppkey % 7 = 0 THEN NULL
             |         ELSE s_nationkey % 5 END AS ka
             |  FROM supplier),
             |b AS (
             |  SELECT n_nationkey,
             |    CASE WHEN n_nationkey % 7 = 0 THEN NULL
             |         ELSE n_nationkey % 5 END AS kb
             |  FROM nation)
             |SELECT ka, count(*) AS n_pairs,
             |  count(DISTINCT n_nationkey) AS n_nations
             |FROM a JOIN b ON ka IS NOT DISTINCT FROM kb
             |GROUP BY ka ORDER BY ka NULLS FIRST""".stripMargin)),

    // Binned interval join — the 100 TB shape for q_join_range's problem.
    // 25 OVERLAPPING price bands (one per nation key, stride 20k < span
    // 50k, so a price can match up to 3 bands) joined to orders without a
    // nested loop: ScaleJoins.binnedRangeJoin replicates each band to the
    // ~3 bins it overlaps and equi-joins on the bin (PlanSpec asserts no
    // BroadcastNestedLoopJoin). Oracle is the plain theta join — identical
    // semantics, different physical plan. Money sums in exact integer
    // cents (q_merge_upsert precedent).
    QueryDef(
      "q_join_range_binned",
      (s, dir) => {
        val bands = load(s, dir, "nation")
          .select(col("n_nationkey").as("band_id"),
            (col("n_nationkey") * 20000.0).as("lo"),
            (col("n_nationkey") * 20000.0 + 50000.0).as("hi"))
        val orders = load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        graft.plans.ScaleJoins
          .binnedRangeJoin(orders, bands, "o_totalprice", "lo", "hi",
            binWidth = 25000.0)
          .groupBy(col("band_id"))
          .agg(count(lit(1)).as("n_orders"),
            sum(Tables.cents(col("o_totalprice"))).as("sum_cents"))
          .orderBy(col("band_id"))
      },
      Some("""SELECT n_nationkey AS band_id, count(*) AS n_orders,
             |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |    AS BIGINT) AS sum_cents
             |FROM orders JOIN nation
             |  ON o_totalprice >= n_nationkey * 20000.0
             | AND o_totalprice < n_nationkey * 20000.0 + 50000.0
             |GROUP BY band_id ORDER BY band_id""".stripMargin)),

    // Interval × interval OVERLAP join (ScaleJoins.intervalOverlapJoin):
    // two sets of order-validity windows ([date, date+20d) vs
    // [date, date+15d), disjoint customer slices) joined where they
    // overlap in time — the temporal/genomic overlap-join shape. The
    // engine explodes both sides to 32-day bins and equi-joins on the
    // bin (overlap verified as a residual; each pair emitted only from
    // its first shared bin — no distinct), while the oracle states the
    // plain loA < hiB AND loB < hiA theta join: identical pair sets or
    // the hash fails.
    QueryDef(
      "q_join_interval",
      (s, dir) => {
        def slice(rem: Int, span: Int, p: String) =
          load(s, dir, "orders")
            .filter(col("o_custkey") % 100 === rem)
            .select(col("o_orderkey").as(s"${p}_id"),
              expr("unix_micros(o_orderdate) div 86400000000")
                .as(s"${p}_lo"))
            .withColumn(s"${p}_hi", col(s"${p}_lo") + span)
        graft.plans.ScaleJoins
          .intervalOverlapJoin(slice(0, 20, "a"), slice(1, 15, "b"),
            "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 32L)
          .select(col("a_id"), col("b_id"),
            (greatest(col("a_lo"), col("b_lo"))).as("ov_from"),
            (least(col("a_hi"), col("b_hi"))).as("ov_to"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH a AS (
             |  SELECT o_orderkey AS a_id,
             |    epoch_us(o_orderdate) // 86400000000 AS a_lo,
             |    epoch_us(o_orderdate) // 86400000000 + 20 AS a_hi
             |  FROM orders WHERE o_custkey % 100 = 0),
             |b AS (
             |  SELECT o_orderkey AS b_id,
             |    epoch_us(o_orderdate) // 86400000000 AS b_lo,
             |    epoch_us(o_orderdate) // 86400000000 + 15 AS b_hi
             |  FROM orders WHERE o_custkey % 100 = 1)
             |SELECT a_id, b_id,
             |  greatest(a_lo, b_lo) AS ov_from,
             |  least(a_hi, b_hi) AS ov_to
             |FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi
             |ORDER BY a_id, b_id""".stripMargin)),

    // ---- sort / limit / top-k -------------------------------------------
    QueryDef(
      "q_sort_multikey",
      (s, dir) => {
        load(s, dir, "supplier")
          .orderBy(col("s_nationkey").asc_nulls_first, col("s_acctbal").desc,
            col("s_suppkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      },
      Some("""SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
             |ORDER BY s_nationkey ASC NULLS FIRST, s_acctbal DESC, s_suppkey""".stripMargin)),

    // Global top-N: planner should use TakeOrderedAndProject (no full sort).
    QueryDef(
      "q_topn_global",
      (s, dir) => {
        load(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    QueryDef(
      "q_topk_per_group",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey"))
        load(s, dir, "part")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
          .orderBy(col("p_brand"), col("rn"))
      },
      Some("""SELECT p_brand, rn, p_partkey, p_retailprice FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |         row_number() OVER (PARTITION BY p_brand
             |                            ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) WHERE rn <= 3
             |ORDER BY p_brand, rn""".stripMargin)),

    // Deterministic hash-mod sampling — the reproducible corpus-subsample
    // staple: hashing the key is engine-portable and rerun-stable (unlike
    // RNG `df.sample`), per-row and shuffle-free, so the same 1/8 sample
    // comes back on any cluster size at any data scale. First md5 hex
    // digit in {0,1} = 2/16 of the keyspace.
    QueryDef(
      "q_sample_hash",
      (s, dir) => {
        load(s, dir, "orders")
          .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
            .isin("0", "1"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
             |ORDER BY o_orderkey""".stripMargin)),

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES in
    // its exponential-clock form): each row draws a deterministic uniform
    // u from a Knuth multiplicative hash of its key — plain BIGINT
    // arithmetic, bit-identical in any engine, unlike RNG sampling — and
    // races with priority key weight_cents · u: the k LARGEST keys are
    // the sample, inclusion monotone in weight (a heavier row beats a
    // lighter one at equal hash draw). PURE-INTEGER ranking: weight in
    // exact cents × the 32-bit hash draw stays a BIGINT product
    // (~6e7·4.3e9 ≈ 2.6e17 < 2^63), so rank-50 membership is a BIGINT
    // compare with an o_orderkey tie-break — no libm anywhere, nothing
    // for engines to disagree on in the last ulp. (The classic A-ES
    // exponential clock -ln(u)/w gives exactly-∝-weight marginals but
    // rides libm ln, whose 1-ulp cross-engine drift at the rank boundary
    // was this query's one documented oracle flake risk — retired round
    // 6.) Distributed shape: per-row arithmetic + TakeOrderedAndProject
    // top-k (per-partition heaps, no global sort), the same at any scale.
    // The hash input is masked to 2^31 BEFORE the multiply:
    // (2^31-1)·2654435761 ≈ 5.7e18 stays inside int64, where the
    // unmasked product overflows once keys pass ~3.5e9.
    QueryDef(
      "q_sample_weighted",
      (s, dir) => {
        val u = ((col("o_orderkey") % lit(2147483648L)) * lit(2654435761L)) %
          lit(4294967296L)
        load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            (Tables.cents(col("o_totalprice")) * u).as("_key"))
          .orderBy(col("_key").desc, col("o_orderkey"))
          .limit(50)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_totalprice FROM (
             |  SELECT o_orderkey, o_totalprice,
             |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             |      * (((o_orderkey % 2147483648) * 2654435761) % 4294967296)
             |      AS key
             |  FROM orders ORDER BY key DESC, o_orderkey LIMIT 50)
             |ORDER BY o_orderkey""".stripMargin)),

    // Stratified sampling: per-stratum fractions via the deterministic
    // Knuth hash (the q_sample_weighted/q_split_assign machinery) against
    // per-stratum integer thresholds — single pass, no shuffle, per-row
    // (the class-rebalancing primitive), and unlike RNG `sampleBy`
    // (still covered by SamplingSpec) rerun-stable and oracle-exact:
    // thresholds are floor(fraction·2^32), pure BIGINT compares.
    QueryDef(
      "q_sample_stratified",
      (s, dir) => {
        val u = ((col("o_orderkey") % lit(2147483648L)) * lit(2654435761L)) %
          lit(4294967296L)
        val threshold = when(col("o_orderstatus") === "O", 429496729L)   // 0.1
          .when(col("o_orderstatus") === "F", 2147483648L)               // 0.5
          .otherwise(4294967296L)                                        // 1.0
        load(s, dir, "orders")
          .filter(u < threshold)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("sampled"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus, count(*) AS sampled FROM orders
             |WHERE ((o_orderkey % 2147483648) * 2654435761) % 4294967296
             |  < CASE o_orderstatus WHEN 'O' THEN 429496729
             |                       WHEN 'F' THEN 2147483648
             |                       ELSE 4294967296 END
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ---- set operations --------------------------------------------------
    QueryDef(
      "q_union_all",
      (s, dir) => {
        val a = load(s, dir, "customer").filter(col("c_custkey") < 50)
          .select(col("c_custkey").as("k"))
        val b = load(s, dir, "supplier").select(col("s_suppkey").as("k"))
        a.unionByName(b).groupBy(col("k")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("k"))
      },
      Some("""SELECT k, count(*) AS cnt FROM (
             |  SELECT c_custkey AS k FROM customer WHERE c_custkey < 50
             |  UNION ALL SELECT s_suppkey FROM supplier)
             |GROUP BY k ORDER BY k""".stripMargin)),

    QueryDef(
      "q_union_distinct",
      (s, dir) => {
        val a = load(s, dir, "customer").filter(col("c_custkey") < 50)
          .select(col("c_custkey").as("k"))
        val b = load(s, dir, "supplier").select(col("s_suppkey").as("k"))
        a.union(b).distinct().orderBy(col("k"))
      },
      Some("""SELECT c_custkey AS k FROM customer WHERE c_custkey < 50
             |UNION SELECT s_suppkey FROM supplier ORDER BY k""".stripMargin)),

    QueryDef(
      "q_intersect",
      (s, dir) => {
        val a = load(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val b = load(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        a.intersect(b).orderBy(col("nk"))
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    QueryDef(
      "q_except",
      (s, dir) => {
        val a = load(s, dir, "customer").select(col("c_nationkey").as("nk"))
        val b = load(s, dir, "supplier").select(col("s_nationkey").as("nk"))
        a.except(b).orderBy(col("nk"))
      },
      Some("""SELECT c_nationkey AS nk FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    QueryDef(
      "q_intersect_all",
      (s, dir) => {
        val a = load(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_nationkey").as("nk"))
        val b = load(s, dir, "customer").filter(col("c_custkey") >= 100)
          .select(col("c_nationkey").as("nk"))
        a.intersectAll(b).groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("nk"))
      },
      Some("""SELECT nk, count(*) AS cnt FROM (
             |  SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 200
             |  INTERSECT ALL
             |  SELECT c_nationkey FROM customer WHERE c_custkey >= 100)
             |GROUP BY nk ORDER BY nk""".stripMargin)),

    QueryDef(
      "q_except_all",
      (s, dir) => {
        val a = load(s, dir, "customer").filter(col("c_custkey") < 200)
          .select(col("c_nationkey").as("nk"))
        val b = load(s, dir, "customer").filter(col("c_custkey") >= 100)
          .select(col("c_nationkey").as("nk"))
        a.exceptAll(b).groupBy(col("nk")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("nk"))
      },
      Some("""SELECT nk, count(*) AS cnt FROM (
             |  SELECT c_nationkey AS nk FROM customer WHERE c_custkey < 200
             |  EXCEPT ALL
             |  SELECT c_nationkey FROM customer WHERE c_custkey >= 100)
             |GROUP BY nk ORDER BY nk""".stripMargin)),
  )
}
