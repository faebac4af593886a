package graft.cdc

import graft.SparkSpecBase
import graft.functions.SmartTimestamp
import graft.functions.SmartTimestamp.smart_timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

class SmartTimestampSpec extends SparkSpecBase {
  import spark.implicits._

  private def det(xs: Long*): Seq[Option[Timestamp]] =
    xs.toSeq.toDF("v").select(smart_timestamp(col("v")).as("ts"))
      .collect().toSeq.map(r => Option(r.getTimestamp(0)))

  test("epoch boundary values (codegen path)") {
    val lo = 1000000000L
    val got = det(lo - 1, lo, 10000000000L - 1, 10000000000L,
      1000000000000L, 10000000000000L, -5L, 0L)
    assert(got(0).isEmpty, "1e9-1 is not an epoch")
    assert(got(1).contains(Timestamp.valueOf("2001-09-09 01:46:40")))
    assert(got(2).isDefined && got(3).isEmpty)
    assert(got(4).contains(Timestamp.valueOf("2001-09-09 01:46:40")), "1e12 ms == 1e9 s")
    assert(got(5).isEmpty && got(6).isEmpty && got(7).isEmpty)
  }

  test("interpreted eval matches codegen semantics") {
    val e = SmartTimestamp(org.apache.spark.sql.catalyst.expressions.Literal(1500000000L))
    assert(e.eval(null) == 1500000000L * 1000000L)
    assert(SmartTimestamp(org.apache.spark.sql.catalyst.expressions.Literal(42L)).eval(null) == null)
  }

  test("SQL registration") {
    SmartTimestamp.register(spark)
    val r = spark.sql("SELECT smart_timestamp(1500000000) AS ts").collect()(0)
    assert(r.getTimestamp(0) == Timestamp.valueOf("2017-07-14 02:40:00"))
  }
}

class JsonFlattenSpec extends SparkSpecBase {
  import spark.implicits._

  test("depth cap: levels 1-2 expand, level 3 serializes to JSON") {
    // mirrors mongo_postgres_cdc.py:90-112 — dicts at nesting depth 1 and 2
    // recurse, a dict first seen at depth 3 is json.dumps'd
    val df = Seq(1L).toDF("a").select(
      col("a"),
      struct(lit("x").as("c"),
        struct(lit("deep").as("d"),
          struct(lit("deepest").as("f")).as("lvl3")).as("lvl2")).as("lvl1"))
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.toSeq == Seq("a", "lvl1_c", "lvl1_lvl2_d", "lvl1_lvl2_lvl3"))
    assert(flat.collect()(0).getString(3) == """{"f":"deepest"}""")
  }

  test("width cap: structs wider than maxKeys serialize whole") {
    val wide = struct((1 to 6).map(i => lit(i).as(s"k$i")): _*)
    val df = Seq(1).toDF("id").select(col("id"), wide.as("w"))
    val flat = JsonFlatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "w"))
    assert(flat.collect()(0).getString(1).startsWith("""{"k1":1"""))
  }

  test("arrays and maps serialize to JSON strings") {
    val df = Seq((1, Seq(1, 2, 3), Map("a" -> 1))).toDF("id", "arr", "m")
    val flat = JsonFlatten.flatten(df)
    val row = flat.collect()(0)
    assert(row.getString(1) == "[1,2,3]")
    assert(row.getString(2) == """{"a":1}""")
  }
}

class NameNormalizerSpec extends SparkSpecBase {
  test("F18 rules") {
    assert(NameNormalizer.normalize("First-Name") == "first_name")
    assert(NameNormalizer.normalize("a.b c") == "a_b_c")
    assert(NameNormalizer.normalize("weird!@#chars") == "weirdchars")
    assert(NameNormalizer.normalize("9lives") == "col_9lives")
    assert(NameNormalizer.normalize("!!!") == "col")
  }

  test("F20 collisions and reserved names") {
    assert(NameNormalizer.normalizeAll(Seq("A-B", "a b", "a_b")) ==
      Seq("a_b", "a_b_1", "a_b_2"))
    assert(NameNormalizer.normalizeAll(Seq("select", "raw_data")) ==
      Seq("select_1", "raw_data_1"))
  }
}

class PkExtractorSpec extends SparkSpecBase {
  import spark.implicits._

  test("candidate precedence: _id wins over other ids") {
    assert(PkExtractor.pkColumn(Seq("user_id", "_id", "name")).contains("_id"))
    assert(PkExtractor.pkColumn(Seq("name", "UUID")).contains("UUID"))
  }
  test("*id fallback") {
    assert(PkExtractor.pkColumn(Seq("name", "order_id")).contains("order_id"))
  }
  test("fingerprint fallback is deterministic and non-null") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("x", "y")
    val keyed = PkExtractor.withPrimaryKey(df).collect()
    assert(keyed.forall(_.getAs[String]("kafka_primary_key") != null))
    assert(keyed(0).getAs[String]("kafka_primary_key") ==
      keyed(1).getAs[String]("kafka_primary_key"))
  }
}
