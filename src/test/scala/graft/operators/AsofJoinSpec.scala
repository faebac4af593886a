package graft.operators

import graft.SparkSpecBase
import graft.dims.Scd2
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("asofLeft: inclusive boundary, latest-wins, null when nothing earlier") {
    val left = Seq((1, 5, "a"), (1, 10, "b"), (2, 3, "c"), (3, 7, "d")).toDF("k", "t", "lv")
    val right = Seq((1, 4, "x"), (1, 10, "y"), (2, 9, "z")).toDF("k", "t", "rv")
    val got = AsofJoin.asofLeft(left, right, "k", "t", "t", Seq("rv"))
      .select("k", "t", "lv", "asof_rv").orderBy("k", "t")
      .as[(Int, Int, String, Option[String])].collect().toSeq
    assert(got === Seq(
      (1, 5, "a", Some("x")),   // latest ≤ 5 is t=4
      (1, 10, "b", Some("y")),  // equal time matches (inclusive)
      (2, 3, "c", None),        // right exists but only later
      (3, 7, "d", None)))       // key absent on the right
  }

  test("scd2 intervals tile each key's timeline: from < to, exactly one current") {
    val log = graft.Tables.events(spark, sfDir).select("user_id", "ts", "event_id", "event_type")
    val scd = Scd2.fromChangeLog(log, "user_id", "ts", "event_id", Seq("event_type")).cache()
    assert(scd.count() === log.count())
    assert(scd.filter(col("is_current") === 1).count() ===
      log.select("user_id").distinct().count())
    assert(scd.filter(col("effective_to").isNotNull &&
      col("effective_to") < col("effective_from")).count() === 0)
    // version n's effective_to equals version n+1's effective_from
    val a = scd.select(col("user_id"), col("version"), col("effective_to"))
    val b = scd.select(col("user_id"), (col("version") - 1).as("version"),
      col("effective_from").as("next_from"))
    val mismatched = a.join(b, Seq("user_id", "version"))
      .filter(col("effective_to") =!= col("next_from"))
    assert(mismatched.count() === 0)
  }
}
