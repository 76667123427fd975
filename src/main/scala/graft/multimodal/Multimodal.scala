package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, batch decode / feature-extract / resize /
  * frame-sample as per-partition batch transforms.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch shape (mapPartitions processes a full Arrow-sized batch of rows
  * per iterator pull, the Scala analogue of a Pandas-UDF batch). The
  * codec itself is STUBBED (no image/audio libraries in this
  * environment): media bytes use a deterministic synthetic container
  * format ("GFT1" header + metadata + payload), and `decodeStub` parses
  * that header in place of libjpeg/ffmpeg. Swap `decodeStub` for a real
  * codec binding to productionize; nothing else changes.
  */
object Multimodal {

  val Magic = "GFT1"

  final case class Meta(kind: String, width: Int, height: Int,
                        channels: Int, nFrames: Int, sampleRate: Int)

  /** Deterministic synthetic media container: header + zero payload whose
    * length is derived from the metadata (so size checks are exact).
    */
  def encode(meta: Meta): Array[Byte] = {
    val header = s"$Magic|${meta.kind}|${meta.width}|${meta.height}|" +
      s"${meta.channels}|${meta.nFrames}|${meta.sampleRate}|"
    val hb = header.getBytes(StandardCharsets.US_ASCII)
    val payloadLen = meta.kind match {
      case "image" => meta.width * meta.height * meta.channels
      case "video" => meta.width * meta.height * meta.channels * meta.nFrames
      case "audio" => meta.sampleRate * 2 // 1s of 16-bit samples
      case _ => 0
    }
    val out = new Array[Byte](hb.length + payloadLen)
    System.arraycopy(hb, 0, out, 0, hb.length)
    out
  }

  /** STUB decode — parses the synthetic header. Real implementation would
    * call an image/audio codec here (the `???` of this pipeline); the
    * signature and batch usage are what production code keeps.
    */
  def decodeStub(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 5) return None
    val head = new String(bytes, 0, math.min(bytes.length, 64),
      StandardCharsets.US_ASCII)
    if (!head.startsWith(Magic + "|")) return None
    head.split('|') match {
      case Array(_, kind, w, h, c, f, sr, _*) =>
        try Some(Meta(kind, w.toInt, h.toInt, c.toInt, f.toInt, sr.toInt))
        catch { case _: NumberFormatException => None }
      case _ => None
    }
  }

  /** Synthesize a deterministic media table from documents: kind cycles
    * image/audio/video by doc_id; dimensions derive from doc_id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(col("doc_id")).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val meta = Meta(kind,
        width = (64 + id % 64).toInt, height = (64 + (id / 2) % 64).toInt,
        channels = 3, nFrames = (1 + id % 30).toInt,
        sampleRate = 16000)
      (id, kind, encode(meta))
    }.toDF("doc_id", "kind", "media")
  }

  /** Batch decode: mapPartitions over (id, bytes) — one partition = one
    * batch, mirroring `mapInPandas` batch shape. Output: typed metadata
    * struct columns + payload size.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          decodeStub(bytes) match {
            case Some(m) => (id, m.kind, m.width, m.height, m.channels,
              m.nFrames, m.sampleRate, bytes.length.toLong, true)
            case None => (id, "unknown", 0, 0, 0, 0, 0,
              if (bytes == null) 0L else bytes.length.toLong, false)
          }
        }
      }
      .toDF("doc_id", "kind", "width", "height", "channels", "n_frames",
        "sample_rate", "n_bytes", "decoded")
  }

  /** Resize plumbing: recompute target dims preserving aspect ratio
    * (integer floor math — deterministic), re-encode through the stub.
    */
  def resize(media: DataFrame, maxSide: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          decodeStub(bytes).map { m =>
            val scaleNumer = maxSide
            val longest = math.max(m.width, m.height)
            val (w2, h2) =
              if (longest <= maxSide) (m.width, m.height)
              else (m.width * scaleNumer / longest, m.height * scaleNumer / longest)
            val resized = m.copy(width = w2, height = h2)
            (id, w2, h2, encode(resized))
          }
        }
      }
      .toDF("doc_id", "width", "height", "media")
  }

  /** Frame sampling for video rows: every `stride`-th frame index. */
  def frameSample(media: DataFrame, stride: Int): DataFrame = {
    val meta = decodeMeta(media)
    meta.filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"))
  }
}
