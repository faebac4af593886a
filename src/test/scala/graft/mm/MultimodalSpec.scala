package graft.mm

import graft.SparkSpecBase
import graft.Tables
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  private lazy val media = Multimodal.asMedia(Tables.documents(spark, sfDir)).cache()

  test("asMedia carries the payload bytes and typed metadata") {
    val row = media.select(col("media"), col("meta.n_bytes"), col("meta.mime")).first()
    assert(row.getAs[Array[Byte]](0).length === row.getInt(1))
    assert(row.getString(2) === "text/plain")
  }

  test("frameSample yields floor((len-frame)/stride)+1 frames of the frame length") {
    val res = media.select(
      col("meta.n_bytes").as("len"),
      Multimodal.frameSample(col("media"), 64, 48).as("frames"))
    val bad = res.filter(
      (col("len") >= 64 && size(col("frames")) =!= floor((col("len") - 64) / 48).cast("int") + 1) ||
      (col("len") < 64 && size(col("frames")) =!= 0))
    assert(bad.count() === 0)
    val lens = res.select(explode(col("frames")).as("f")).select(length(col("f"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSet === Set(64))
  }

  test("resizeHex decimates to at most 16 bytes and round-trips the stride rule") {
    val res = media.select(col("doc_id"), length(col("media")).as("n"),
      Multimodal.resizeHex(col("media"), 16).as("thumb"))
    // ≤ 16 bytes = ≤ 32 hex chars, and non-empty payloads yield non-empty thumbs
    assert(res.filter(length(col("thumb")) > 32).count() === 0)
    assert(res.filter(col("n") > 0 && length(col("thumb")) === 0).count() === 0)
    // payloads of ≥ 16 bytes always fill all 16 sample slots
    assert(res.filter(col("n") >= 16 && length(col("thumb")) =!= 32).count() === 0)
    // spot-check the stride rule on one row against a driver-side recompute
    val row = media.select(col("media"), Multimodal.resizeHex(col("media"), 16))
      .first()
    val bytes = row.getAs[Array[Byte]](0)
    val stride = math.max(1, bytes.length / 16)
    val expect = (0 to math.min(15, (bytes.length - 1) / stride))
      .map(i => f"${bytes(i * stride) & 0xff}%02x").mkString
    assert(row.getString(1) === expect)
  }

  test("decodeFeatures is deterministic and emits 3 features per frame") {
    val a = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(a.length === media.count())
    assert(a.zip(b).forall { case (x, y) =>
      x.doc_id == y.doc_id && x.feat.sameElements(y.feat) })
    assert(a.forall(f => f.feat.length == 3 * f.n_frames))
    // fake decode: byte stats are within [0, 255]
    assert(a.forall(_.feat.forall(v => v >= 0.0 && v <= 255.0)))
  }
}
