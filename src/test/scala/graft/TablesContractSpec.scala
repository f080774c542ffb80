package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Schema contract for the driver-generated testdata tables: one
  * clear failure per table if the driver regenerates testdata with
  * different physical types, instead of dozens of scattered
  * downstream errors (the r4 incident: events.ts changed from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS) and 44 queries + 36 tests
  * went red with cryptic DATATYPE_MISMATCH / silently-wrong rows).
  *
  * The contract asserts the NORMALIZED schema — what every operator
  * actually consumes — so it holds across any on-disk representation
  * the loaders know how to adapt.
  */
class TablesContractSpec extends AnyFunSuite {
  import TestSpark._

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, sf, name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loads with ts normalized to TimestampType") {
    val sch = Tables.events(spark, sf).schema.fields.map(f => f.name -> f.dataType).toMap
    assert(sch("ts") === TimestampType,
      s"events.ts must normalize to TimestampType, got ${sch("ts")} — " +
        "update Tables.normalizeEventTs for the new on-disk type")
    assert(sch("event_id") === LongType)
    assert(sch("user_id") === LongType)
    assert(sch("event_type") === StringType)
    assert(sch("value") === DoubleType)
    assert(sch("props") === StringType)
  }

  test("streaming raw events schema matches the on-disk footer and normalizes like batch") {
    val raw = graft.streaming.EventStreams.rawEventSchema(spark, sf)
    // whatever the raw type, normalization must land on TimestampType
    val normalized = Tables.normalizeEventTs(
      spark.read.schema(raw).parquet(s"$sf/events.parquet"))
    assert(normalized.schema("ts").dataType === TimestampType)
  }

  test("documents schema") {
    val sch = fields("documents")
    assert(sch("doc_id") === LongType)
    assert(sch("text") === StringType)
    assert(sch("lang") === StringType)
    assert(sch("source") === StringType)
    assert(sch("n_chars") === LongType)
  }

  test("embeddings schema") {
    val sch = fields("embeddings")
    assert(sch("vec_id") === LongType)
    assert(sch("embedding") match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }, s"embedding column must be array<float|double>, got ${sch("embedding")}")
    assert(sch("label") === IntegerType)
  }

  private def isDatetime(t: DataType): Boolean = t match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  test("tpch key columns") {
    assert(fields("lineitem")("l_orderkey") === LongType)
    assert(isDatetime(fields("lineitem")("l_shipdate")),
      s"l_shipdate: ${fields("lineitem")("l_shipdate")}")
    assert(fields("orders")("o_orderkey") === LongType)
    assert(isDatetime(fields("orders")("o_orderdate")),
      s"o_orderdate: ${fields("orders")("o_orderdate")}")
    assert(fields("customer")("c_custkey") === LongType)
    assert(fields("supplier")("s_suppkey") === LongType)
    assert(fields("part")("p_partkey") === LongType)
    assert(fields("nation")("n_nationkey") === IntegerType)
    assert(fields("region")("r_regionkey") === IntegerType)
  }
}
