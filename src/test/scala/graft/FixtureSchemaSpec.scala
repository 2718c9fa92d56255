package graft

import org.scalatest.exceptions.TestFailedException

/** Fixture-drift early warning: pins the exact Spark-read schema of every
  * driver-provided parquet table, INCLUDING the timestamp encodings.
  *
  * Why: the driver regenerates /root/testdata occasionally and has already
  * changed `events.ts` from TIMESTAMP(NANOS) (→ bigint under nanosAsLong)
  * to TIMESTAMP_MICROS NTZ once — which broke 13 queries with 16 cryptic
  * analysis errors scattered across 5 suites. This spec makes the NEXT
  * regen fail ONE named test with a schema diff instead.
  *
  * On failure: update the pin here, then audit every consumer of the
  * changed column (for `ts`: Tables.logs / Tables.tsMicros and their
  * DuckDB CTE mirrors, which are schema-adaptive across the encodings
  * seen so far).
  */
class FixtureSchemaSpec extends SparkSpec {

  private val expected = Map(
    "region" -> "r_regionkey INT,r_name STRING",
    "nation" -> "n_nationkey INT,n_name STRING,n_regionkey INT",
    "customer" -> "c_custkey BIGINT,c_name STRING,c_nationkey INT,c_acctbal DOUBLE,c_mktsegment STRING",
    "supplier" -> "s_suppkey BIGINT,s_name STRING,s_nationkey INT,s_acctbal DOUBLE",
    "part" -> "p_partkey BIGINT,p_name STRING,p_brand STRING,p_type STRING,p_size INT,p_retailprice DOUBLE",
    "orders" -> "o_orderkey BIGINT,o_custkey BIGINT,o_orderstatus STRING,o_totalprice DOUBLE,o_orderdate TIMESTAMP_NTZ,o_orderpriority STRING",
    "lineitem" -> ("l_orderkey BIGINT,l_partkey BIGINT,l_suppkey BIGINT,l_linenumber INT,l_quantity DOUBLE," +
      "l_extendedprice DOUBLE,l_discount DOUBLE,l_tax DOUBLE,l_returnflag STRING,l_linestatus STRING,l_shipdate TIMESTAMP_NTZ"),
    "events" -> "event_id BIGINT,ts TIMESTAMP_NTZ,user_id BIGINT,event_type STRING,value DOUBLE,props STRING",
    "documents" -> "doc_id BIGINT,text STRING,lang STRING,source STRING,n_chars BIGINT",
    "embeddings" -> "vec_id BIGINT,embedding ARRAY<FLOAT>,label INT")

  private def ddl(name: String): String =
    // plain read, NOT Tables.table: pin what the file carries under the
    // session's standing confs, before any adaptive handling
    spark.read.parquet(s"$sf0001/$name.parquet").schema.toDDL
      .replace(" NOT NULL", "")

  for ((table, exp) <- expected.toSeq.sortBy(_._1))
    test(s"fixture schema pinned: $table") {
      assert(ddl(table) == exp,
        s"\n$table.parquet was REGENERATED with a different schema — " +
          "update this pin and audit the column's consumers (see scaladoc)")
    }

  test("the pin actually catches a type change (self-check)") {
    // simulate a regen flipping events.ts: the assertion must fire
    val tampered = expected("events").replace("ts TIMESTAMP_NTZ", "ts BIGINT")
    intercept[TestFailedException] {
      assert(ddl("events") == tampered, "tampered pin must not match")
    }
  }
}
