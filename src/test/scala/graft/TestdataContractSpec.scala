package graft

import org.apache.spark.sql.types._

import graft.queries.Tables

/** Canary for the driver's testdata contract (TESTDATA.md). The driver has
  * regenerated `/root/testdata` mid-project before — between rounds 5 and 6
  * `events.ts` silently changed physical type from TIMESTAMP(NANOS) to µs
  * no-timezone, which surfaced as 13 scattered analysis-time failures
  * instead of one clear message. This spec pins the POST-LOAD logical
  * schema of every table ([[Tables.load]] normalizes the physical
  * encodings it knows how to absorb), so:
  *
  *   - a regen the loader absorbs (ns ↔ µs-NTZ ↔ µs-LTZ timestamps) stays
  *     green — the engine contract is unchanged;
  *   - a regen the loader canNOT absorb (column renamed, type changed to
  *     something non-normalizable, table dropped) fails HERE, first, with
  *     "testdata contract changed" naming the exact table.column.
  */
class TestdataContractSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType),
  )

  // all three scale factors: a PARTIAL regen (e.g. only sf0.01, the
  // correctness tier) must fail here too, not just when sf0.001 drifts
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1")

  test("testdata contract: every table loads with the pinned schema " +
      "at every scale factor") {
    val drifted = sfDirs.flatMap { dir =>
      Tables.names.flatMap { table =>
        val got = Tables.load(spark, dir, table).schema
          .map(f => (f.name, f.dataType))
        val want = expected(table)
        if (got == want) Nil
        else {
          val gotM = got.toMap
          val wantM = want.toMap
          val cols =
            (wantM.keySet -- gotM.keySet).map(c => s"$dir/$table.$c MISSING (expected ${wantM(c)})") ++
            (gotM.keySet -- wantM.keySet).map(c => s"$dir/$table.$c UNEXPECTED (${gotM(c)})") ++
            wantM.keySet.intersect(gotM.keySet).collect {
              case c if wantM(c) != gotM(c) =>
                s"$dir/$table.$c is ${gotM(c)}, expected ${wantM(c)}"
            }
          if (cols.isEmpty) Seq(s"$dir/$table column ORDER changed: $got")
          else cols.toSeq
        }
      }
    }
    assert(drifted.isEmpty,
      s"\ntestdata contract changed — the driver regenerated /root/testdata " +
        s"with a schema Tables.load does not normalize:\n  " +
        drifted.mkString("\n  ") +
        "\nFix Tables.load (QueryDef.scala) to absorb the new encoding, " +
        "then update this pin.")
  }

  test("testdata contract: all ten tables are present and non-empty") {
    Tables.names.foreach { t =>
      assert(Tables.load(spark, sfDir, t).limit(1).count() == 1L,
        s"testdata contract changed: table $t is missing or empty at $sfDir")
    }
  }
}
