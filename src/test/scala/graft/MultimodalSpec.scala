package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.kinesis.FakeKinesisRegistry

/** Multimodal binary-column plumbing: schema, magic-byte sniffing, stub
  * feature extraction (deterministic, ANN-ready shape), frame sampling,
  * and the kinesis→multimodal ingestion path.
  */
class MultimodalSpec extends GraftSpec {

  private def bin(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray

  test("sniffFormat recognizes magic bytes; meta struct is complete") {
    val s = spark
    import s.implicits._
    val payloads = Seq(
      ("png",  bin(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a, 1, 2)),
      ("jpeg", bin(0xff, 0xd8, 0xff, 0xe0, 0, 1, 2, 3)),
      ("gif",  "GIF89a-data".getBytes(UTF_8)),
      ("riff", "RIFF1234WAVE".getBytes(UTF_8)),
      ("unknown", "plain text".getBytes(UTF_8)))
    val df = payloads.toDF("expected", "data")
    val out = Multimodal.enrich(df, "data").collect()
    out.foreach { r =>
      val meta = r.getStruct(r.fieldIndex("meta"))
      assert(meta.getAs[String]("format") == r.getAs[String]("expected"),
        s"format sniff failed for ${r.getAs[String]("expected")}")
      assert(meta.getAs[Int]("n_bytes") == r.getAs[Array[Byte]]("data").length)
      assert(meta.getAs[String]("prefix_hex").nonEmpty)
    }
  }

  test("fakeEmbedding is deterministic, dense, bounded, and ANN-ready") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("payload-a".getBytes(UTF_8)), Tuple1("payload-b".getBytes(UTF_8)))
      .toDF("data")
    val e1 = Multimodal.enrich(df, "data", dim = 16)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    val e2 = Multimodal.enrich(df, "data", dim = 16)
      .select(col("embedding")).collect().map(_.getSeq[Double](0))
    assert(e1.zip(e2).forall { case (a, b) => a == b }, "must be deterministic")
    assert(e1.forall(_.size == 16))
    assert(e1.forall(_.forall(x => x >= -1.0 && x <= 1.0)))
    assert(e1(0) != e1(1), "different payloads must embed differently")
    // ANN-ready: the stub output feeds the native dot product directly.
    val dot = Multimodal.enrich(df, "data", dim = 16)
      .agg(sum(graft.functions.VectorOps.dot(col("embedding"), col("embedding"))))
      .collect().head.getDouble(0)
    assert(dot > 0.0)
  }

  test("frameSample yields evenly spaced non-empty byte windows") {
    val s = spark
    import s.implicits._
    val payload = (0 until 1000).map(i => (i % 251).toByte).toArray
    val df = Seq(Tuple1(payload)).toDF("data")
    val frames = df.select(Multimodal.frameSample(col("data"), 4, 100).as("f"))
      .collect().head.getSeq[Array[Byte]](0)
    assert(frames.size == 4)
    assert(frames.forall(_.length == 100))
    assert(frames.head.toSeq == payload.slice(0, 100).toSeq)
  }

  test("kinesis → multimodal ingestion: binary payloads through meta + embedding") {
    val id = s"mm_${System.identityHashCode(this)}"
    val svc = FakeKinesisRegistry.create(id)
    svc.createStream("media", 2)
    val png = bin(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++
      Array.fill(64)(7.toByte)
    svc.putRecords("media", (1 to 10).map(i => (s"k$i", png)))

    val raw = spark.readStream.format("kinesis")
      .option("streams", "media").option("initialPosition", "trim_horizon")
      .option("fake.id", id).load()
    val qn = "mm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Multimodal.enrich(raw, "data", dim = 8)
      .select(col("sequenceNumber"), col("meta"), col("embedding"))
      .writeStream.format("memory").queryName(qn)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("mm_ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table(qn).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getStruct(1).getAs[String]("format") == "png")
      assert(r.getSeq[Double](2).size == 8)
    }
  }
}
