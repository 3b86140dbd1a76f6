package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("binary payload plumbing: schema, determinism, partition batching") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val withPayload = Multimodal.withPayload(docs)
    assert(withPayload.schema("payload").dataType.typeName === "binary")

    val meta = Multimodal.decodeMeta(withPayload).cache()
    assert(meta.schema === Multimodal.metaSchema)
    assert(meta.count() === docs.count())
    assert(meta.where(col("n_bytes") <= 0).count() === 0)
    assert(meta.where(col("width") < 1 || col("height") < 1 || col("n_frames") < 1).count() === 0)
    // deterministic stub: same input → same metadata across runs
    val a = Multimodal.decodeMeta(withPayload).orderBy("doc_id").collect()
    val b = Multimodal.decodeMeta(withPayload.repartition(7)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    meta.unpersist()
  }

  test("frame sampling: evenly spaced slices, bounded count, exact bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val videos = Multimodal.withPayload(docs).where(col("media_type") === "video").cache()
    val frames = Multimodal.sampleFrames(videos).cache()
    assert(frames.schema === Multimodal.frameSchema)
    // ≤ 4 frames per doc, frame_no dense from 0
    val perDoc = frames.groupBy("doc_id").count().collect()
    assert(perDoc.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 4))
    // the slice really is payload[off, off+len): spot-check via join
    val joined = frames.join(videos.select(col("doc_id"), col("payload")), "doc_id")
      .select("payload", "frame_off", "frame_bytes").collect()
    joined.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      val off = r.getAs[Int]("frame_off")
      val bytes = r.getAs[Array[Byte]]("frame_bytes")
      assert(java.util.Arrays.equals(bytes,
        java.util.Arrays.copyOfRange(payload, off, off + bytes.length)))
    }
    frames.unpersist(); videos.unpersist()
  }

  test("ImageIO codec decodes real PNG/JPEG bytes on executors; rejects garbage") {
    import spark.implicits._
    val docs = Seq(0L, 3L, 6L, 9L, 33L, 96L).toDF("doc_id")
    val images = Multimodal.withImagePayload(docs).cache()
    // payloads are real encodings: magic bytes match the format
    images.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      r.getString(1) match {
        case "png" =>
          assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'.toByte)
        case "jpeg" =>
          assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8)
      }
    }
    // decode on the partition-batched path recovers the true dimensions
    val meta = Multimodal.decodeMeta(images, Multimodal.ImageIoCodec).collect()
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(3) === (id % 48 + 16).toInt, s"width of doc $id")
      assert(r.getInt(4) === (id % 32 + 16).toInt, s"height of doc $id")
      assert(r.getInt(5) === 3, s"channels of doc $id")
      assert(r.getInt(2) > 0) // n_bytes
    }
    images.unpersist()
    // non-image payloads are flagged, not crashed
    assert(Multimodal.ImageIoCodec.decode("not an image".getBytes) === ((-1, -1, -1)))
    assert(Multimodal.ImageIoCodec.decode(Array.empty[Byte]) === ((-1, -1, -1)))
  }

  test("resizeNearest: PNG pixels reproduce encoder arithmetic; JPEG path decodes sane") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // PNG (lossless) half: 8x8 checksum must equal the arithmetic
    // prediction exactly — same contract the DuckDB oracle enforces
    val png = Multimodal.resizeNearest(
      Multimodal.withImagePayload(docs.where(col("doc_id") % 6 === 0)), 8, 8)
      .collect()
    assert(png.nonEmpty)
    png.foreach { r =>
      val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
      assert(w == (id % 48 + 16).toInt && h == (id % 32 + 16).toInt)
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8)
        want += (x * w / 8 * 31 + y * h / 8 * 17 + id) % 0x1000000
      assert(r.getLong(3) == want, s"PNG resize checksum drifted for doc $id")
    }
    // JPEG (lossy) half goes through the same code path: dimensions
    // exact, checksum merely in the 64-pixel envelope
    val jpg = Multimodal.resizeNearest(
      Multimodal.withImagePayload(
        docs.where(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 1)), 8, 8)
      .collect()
    assert(jpg.nonEmpty)
    jpg.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 48 + 16).toInt && r.getInt(2) == (id % 32 + 16).toInt)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 64L * 0xFFFFFF)
    }
    // an undecodable payload quarantines its ROW as a sentinel — it
    // must not NPE the partition's task (the decodeMeta guard contract)
    import spark.implicits._
    val poisoned = Seq(
      (1L, "not an image at all".getBytes),
      (2L, Array.empty[Byte])).toDF("doc_id", "payload")
    val bad = Multimodal.resizeNearest(poisoned, 8, 8).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(bad(1L) == ((-1, -1, -1L)) && bad(2L) == ((-1, -1, -1L)),
      "corrupt payloads must land (-1,-1,-1) sentinel rows")
  }

  test("audioBlockEnergy: blocks partition the PCM stream, energies match byte arithmetic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") % 3 === 1).limit(5)
    val rows = Multimodal.audioBlockEnergy(
      Multimodal.withAudioPayload(docs), 25).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      val ch = (id % 2 + 1).toInt
      val frames = (id % 100 + 50).toInt
      assert(rs.map(_.getAs[Long]("n_samples")).sum == frames.toLong * ch,
        s"blocks must partition all samples of doc $id")
      val byBlock = rs.sortBy(_.getAs[Int]("block"))
      assert(byBlock.map(_.getAs[Int]("block")).toSeq == byBlock.indices)
      // full blocks carry 25*ch samples; only the last may be short
      byBlock.init.foreach(r => assert(r.getAs[Long]("n_samples") == 25L * ch))
      // sample-level replication of the fixture arithmetic
      var i = 0L
      byBlock.foreach { r =>
        var want = 0L
        (0L until r.getAs[Long]("n_samples")).foreach { _ =>
          val v = (14 * i + id) % 128 + 256 * ((14 * i + 7 + id) % 128)
          want += v * v
          i += 1
        }
        assert(r.getAs[Long]("energy") == want, s"energy drift doc $id block $r")
      }
    }
    // format validation: the sample loop assumes PCM_SIGNED 16-bit LE —
    // anything else (here: an 8-bit WAV, plus outright garbage) must
    // quarantine as ONE sentinel row, never decode garbage energies
    import spark.implicits._
    val fmt8 = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(Array.fill[Byte](40)(3)), fmt8, 40),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val poisoned = Seq(
      (90L, bos.toByteArray),             // parses, but 8-bit: rejected
      (91L, "not audio".getBytes)).toDF("doc_id", "payload")
    val bad = Multimodal.audioBlockEnergy(poisoned, 25).collect()
      .groupBy(_.getLong(0))
    assert(bad(90L).toSeq.map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      == Seq((-1, -1L, -1L)), "non-16-bit WAV must sentinel, not misdecode")
    assert(bad(91L).toSeq.map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      == Seq((-1, -1L, -1L)), "unparseable payload must sentinel")
  }

  test("WAV codec parses real RIFF bytes on executors; rejects garbage") {
    import spark.implicits._
    val docs = Seq(1L, 4L, 7L, 34L, 97L).toDF("doc_id")
    val audio = Multimodal.withAudioPayload(docs).cache()
    // payloads are real WAV encodings: RIFF....WAVE magic
    audio.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.slice(0, 4)) === "RIFF")
      assert(new String(bytes.slice(8, 12)) === "WAVE")
    }
    // decode on the partition-batched path recovers the true header fields
    Multimodal.decodeMeta(audio, Multimodal.AudioWavCodec).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(3) === (id % 5 * 2000 + 8000).toInt, s"rate of doc $id")
      assert(r.getInt(4) === (id % 2 + 1).toInt, s"channels of doc $id")
      assert(r.getInt(5) === (id % 100 + 50).toInt, s"frames of doc $id")
    }
    audio.unpersist()
    // non-audio payloads are flagged, not crashed
    assert(Multimodal.AudioWavCodec.decode("not a wav".getBytes) === ((-1, -1, -1)))
    assert(Multimodal.AudioWavCodec.decode(Array.empty[Byte]) === ((-1, -1, -1)))
  }

  test("Y4M demuxer parses real containers on executors; rejects malformed") {
    import spark.implicits._
    val docs = Seq(2L, 5L, 8L, 35L, 98L).toDF("doc_id")
    val vids = Multimodal.withVideoPayload(docs).cache()
    // payloads are real Y4M containers: magic + FRAME markers
    vids.collect().foreach { r =>
      val bytes = r.getAs[Array[Byte]]("payload")
      assert(new String(bytes.slice(0, 9)) === "YUV4MPEG2")
    }
    // demux on the partition-batched path recovers dims + frame count
    Multimodal.decodeMeta(vids, Multimodal.Y4mCodec).collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(3) === (id % 16 + 2).toInt * 2, s"width of doc $id")
      assert(r.getInt(4) === (id % 12 + 2).toInt * 2, s"height of doc $id")
      assert(r.getInt(5) === (id % 12 + 1).toInt, s"frames of doc $id")
    }
    // real-offset frame sampling: byte sums match a direct recompute
    val frames = Multimodal.sampleVideoFrames(vids)
      .join(vids.select(col("doc_id"), col("payload")), "doc_id").collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      val off = r.getAs[Int]("frame_off")
      val id = r.getAs[Long]("doc_id")
      val fsz = ((id % 16 + 2) * 2 * (id % 12 + 2) * 2 * 3 / 2).toInt
      val expect = (0 until fsz).map(i => (p(off + i) & 0xff).toLong).sum
      assert(r.getAs[Long]("byte_sum") === expect)
    }
    vids.unpersist()
    // malformed containers are flagged, not crashed
    assert(Multimodal.Y4mCodec.decode("not a video".getBytes) === ((-1, -1, -1)))
    assert(Multimodal.Y4mCodec.decode(Array.empty[Byte]) === ((-1, -1, -1)))
    // truncated trailing frame poisons the payload (strict)
    val sample = {
      val hdr = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
      val frame = "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](24)(1)
      hdr ++ frame ++ frame.dropRight(3)
    }
    assert(Multimodal.Y4mCodec.decode(sample) === ((-1, -1, -1)))
    // header-only stream (zero frames) is VALID
    assert(Multimodal.Y4mCodec.decode(
      "YUV4MPEG2 W6 H4 F25:1\n".getBytes("US-ASCII")) === ((6, 4, 0)))
    // hostile dimensions must FLAG, not wrap frameSize negative (which
    // would hang the FRAME walk or index below zero and kill the task)
    assert(Multimodal.Y4mCodec.decode(
      "YUV4MPEG2 W50000 H50000 F25:1\nFRAME\nxxxx".getBytes("US-ASCII")) === ((-1, -1, -1)))
    assert(Multimodal.Y4mCodec.decode(
      "YUV4MPEG2 W2 H2147483645 Cmono\nFRAME\n".getBytes("US-ASCII")) === ((-1, -1, -1)))
    assert(Multimodal.Y4mCodec.decode(
      "YUV4MPEG2 W-4 H4\n".getBytes("US-ASCII")) === ((-1, -1, -1)))
    // near-max frameSize (C422 W32768 H32767 → 2147352512, legal after
    // the header guard) + a ~132 KB FRAME params line: nl+1+frameSize
    // exceeds Int.MaxValue, which the old Int-arithmetic bound check
    // wrapped negative — the walk then indexed out of bounds instead of
    // flagging the row. The Long-domain check must return malformed.
    val hostile = ("YUV4MPEG2 W32768 H32767 C422\n" +
      "FRAME " + ("X" * 132000) + "\n").getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(Multimodal.Y4mCodec.decode(hostile) === ((-1, -1, -1)))
  }

  test("session windows: gap-based aggregation (streaming-native sessionization)") {
    import spark.implicits._
    val base = 1704067200000L
    // user u1: events at 0s,60s then a 2h gap, then one more; u2: single event
    val df = Seq(
      ("u1", 0L), ("u1", 60000L), ("u1", 7260000L), ("u2", 30000L))
      .toDF("user_id", "off")
      .select(col("user_id"), expr(s"timestamp_millis($base + off)").as("ts"))
    val sessions = graft.streaming.StreamingAnalytics
      .sessionCounts(df, gap = "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(sessions.length === 3) // u1: two sessions, u2: one
    assert(sessions.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
  }
}
