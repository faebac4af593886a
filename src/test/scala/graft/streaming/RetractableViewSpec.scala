package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Chg(key: String, value: Double, sign: Long)

/** Pins the streaming retractable view: a signed CDC feed folded per
  * micro-batch into a stored snapshot converges to the aggregate of
  * the net table state through inserts, an update (retract+insert
  * pair), a delete, and a full retraction of a key.
  */
class RetractableViewSpec extends SparkSpecBase {
  import spark.implicits._

  test("signed micro-batches converge to the net state; fully-retracted keys leave") {
    implicit val sq = spark.sqlContext
    val store = java.nio.file.Files.createTempDirectory("graft_rv_").toString + "/view"
    val input = MemoryStream[Chg]
    val q = input.toDF()
      .writeStream.outputMode("append")
      .foreachBatch(RetractableView.sink(store, "key") _)
      .start()
    try {
      // batch 1: three inserts over two keys
      input.addData(Chg("a", 10.0, 1), Chg("a", 20.0, 1), Chg("b", 5.0, 1))
      q.processAllAvailable()
      // batch 2: update a:20→25 (retract+insert), delete b:5
      input.addData(Chg("a", 20.0, -1), Chg("a", 25.0, 1), Chg("b", 5.0, -1))
      q.processAllAvailable()
      val view = spark.read.parquet(store)
        .select(col("key"), col("n"), col("total").cast("double"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      // a: two live rows (10 + 25); b fully retracted — GONE, not 0-count
      assert(view === Set(("a", 2L, 35.0)))
      // batch 3: b comes back
      input.addData(Chg("b", 7.0, 1))
      q.processAllAvailable()
      val view2 = spark.read.parquet(store)
        .select(col("key"), col("n"), col("total").cast("double"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(view2 === Set(("a", 2L, 35.0), ("b", 1L, 7.0)))
    } finally q.stop()
  }

  test("resolve heals a crash between the two swap renames") {
    val base = java.nio.file.Files.createTempDirectory("graft_rv_heal_").toString
    val store = base + "/view"
    val batch = Seq(Chg("a", 10.0, 1)).toDF()
    RetractableView.sink(store, "key")(batch, 0L)
    // simulate the crash window: store renamed aside, new never landed
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".old")))
    assert(RetractableView.resolve(spark, store),
      "resolve must rename the .old snapshot back, not report empty")
    // the next batch folds into the HEALED snapshot, not a zeroed view
    RetractableView.sink(store, "key")(Seq(Chg("a", 5.0, 1)).toDF(), 1L)
    val view = spark.read.parquet(store)
      .select(col("key"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(view === Set(("a", 2L, 15.0)))
  }

  test("replaying an already-applied batchId is a no-op, not a double fold") {
    val base = java.nio.file.Files.createTempDirectory("graft_rv_replay_").toString
    val store = base + "/view"
    RetractableView.sink(store, "key")(Seq(Chg("a", 10.0, 1)).toDF(), 0L)
    RetractableView.sink(store, "key")(Seq(Chg("a", 5.0, 1)).toDF(), 1L)
    assert(RetractableView.lastApplied(spark, store) === 1L)
    // the foreachBatch crash-replay: the SAME batch redelivered with the
    // SAME id after the snapshot swap committed but before the streaming
    // checkpoint did — must not double-apply
    RetractableView.sink(store, "key")(Seq(Chg("a", 5.0, 1)).toDF(), 1L)
    val view = spark.read.parquet(store)
      .select(col("key"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(view === Set(("a", 2L, 15.0)),
      "replayed batch must be detected by the snapshot's _batch marker")
    // a NEW batch after the replayed one still applies
    RetractableView.sink(store, "key")(Seq(Chg("b", 1.0, 1)).toDF(), 2L)
    assert(spark.read.parquet(store).count() === 2)
  }

  test("a corrupt snapshot rethrows instead of silently zeroing the view") {
    val base = java.nio.file.Files.createTempDirectory("graft_rv_bad_").toString
    val store = base + "/view"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(store))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(store, "part-00000.parquet"),
      "not a parquet file".getBytes)
    intercept[Exception] {
      RetractableView.sink(store, "key")(Seq(Chg("a", 1.0, 1)).toDF(), 0L)
    }
  }
}
