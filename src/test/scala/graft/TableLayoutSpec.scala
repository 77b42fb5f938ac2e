package graft

import org.apache.spark.sql.types._

/** Round-start drift alarm: pins the POST-READER logical schema of every
  * driver-generated test table. The round-5→6 testdata regeneration changed
  * `events.ts`'s physical encoding and silently broke 23 queries at the
  * scoring gate; `Tables.normalizeEventTs` now absorbs the three observed
  * encodings (pinned by EventLayoutSpec), and THIS spec makes any future
  * drift — a retyped column, a renamed field, a new nullable — fail
  * `sbt test` immediately with the table and column named, instead of
  * surfacing as a hash mismatch hours later. Physical-encoding variety is
  * fine (that is the reader's job); what this asserts is the LOGICAL
  * contract every operator compiles against.
  */
class TableLayoutSpec extends SparkSpec {

  private def fields(name: String, df: org.apache.spark.sql.DataFrame): Map[String, DataType] =
    df.schema.fields.map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, actual: Map[String, DataType],
                         expected: (String, DataType)*): Unit =
    expected.foreach { case (c, t) =>
      assert(actual.contains(c), s"$table: column $c MISSING (testdata drift?)")
      assert(actual(c) == t,
        s"$table.$c: expected $t, scanned ${actual(c)} — the driver regenerated " +
          "testdata with a new layout; extend the reader seam (Tables) and " +
          "re-pin here")
    }

  private def assertTs(table: String, actual: Map[String, DataType], c: String): Unit =
    assert(actual.get(c).exists(t => t == TimestampType || t == TimestampNTZType),
      s"$table.$c: expected timestamp or timestamp_ntz, scanned ${actual.get(c)} " +
        "(in a UTC session every consumer treats the two identically; anything " +
        "else is the r5 events.ts drift class)")

  test("every test table scans to the pinned logical schema at sf0.01") {
    assertCols("region", fields("region", Tables.region(spark, sf01)),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    assertCols("nation", fields("nation", Tables.nation(spark, sf01)),
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType)
    assertCols("customer", fields("customer", Tables.customer(spark, sf01)),
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType)
    assertCols("supplier", fields("supplier", Tables.supplier(spark, sf01)),
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType)
    assertCols("part", fields("part", Tables.part(spark, sf01)),
      "p_partkey" -> LongType, "p_brand" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType)
    val ord = fields("orders", Tables.orders(spark, sf01))
    assertCols("orders", ord,
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_totalprice" -> DoubleType, "o_orderpriority" -> StringType)
    assertTs("orders", ord, "o_orderdate")
    val li = fields("lineitem", Tables.lineitem(spark, sf01))
    assertCols("lineitem", li,
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType)
    assertTs("lineitem", li, "l_shipdate")
    // events goes through the normalizing reader: whatever the physical
    // encoding, ts MUST come out timestamp_ntz (EventLayoutSpec pins the
    // three known physical forms; this pins the normalized contract)
    assertCols("events", fields("events", Tables.events(spark, sf01)),
      "event_id" -> LongType, "ts" -> TimestampNTZType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    assertCols("documents", fields("documents", Tables.documents(spark, sf01)),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    val emb = fields("embeddings", Tables.embeddings(spark, sf01))
    assert(emb.contains("vec_id") && emb("vec_id") == LongType, s"embeddings.vec_id: $emb")
    assert(emb.get("label").exists(t => t == IntegerType || t == LongType),
      s"embeddings.label: ${emb.get("label")}")
    emb("embedding") match {
      // float today; double would also flow through every consumer's
      // cast("array<double>") — both are pinned as acceptable
      case ArrayType(FloatType | DoubleType, _) => ()
      case other => fail(s"embeddings.embedding: expected array<float|double>, scanned $other")
    }
  }

  test("nationkey columns agree in type across their join seams") {
    // c_nationkey joins n_nationkey (q03/q13 enrichment) and rides in
    // q107's block key: a driver drift to mismatched integer widths would
    // still join (Spark casts) but changes oracle schemas — pin both sides
    val c = Tables.customer(spark, sf01).schema("c_nationkey").dataType
    val n = Tables.nation(spark, sf01).schema("n_nationkey").dataType
    assert(Set(c, n).subsetOf(Set[DataType](IntegerType, LongType)),
      s"nationkey types drifted: customer=$c nation=$n")
  }
}
