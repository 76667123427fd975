package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32C

/** TFRecord source tier — the length-delimited record format ML
  * training stacks ingest (TFRecord framing + `tf.train.Example`
  * protobuf payloads), implemented pure-JVM from the published wire
  * specs: records are `[len:u64le][masked_crc32c(len):u32le][data]
  * [masked_crc32c(data):u32le]` with mask(c) = ((c>>>15)|(c<<17)) +
  * 0xa282ead8, and Example is standard proto wire format (features map
  * → BytesList/Int64List features, map entries emitted in sorted key
  * order for determinism).
  *
  * Parsing is FAILFAST like [[Jsonl]]/[[Csv]]: a CRC mismatch or a
  * truncated record is a loud error — this tier is a source of record.
  * CRC32C comes from `java.util.zip.CRC32C` (hardware-accelerated on
  * x86/ARM), so integrity checking adds no dependency and no custom
  * table.
  */
object TfRecord {

  // ------------------------------------------------------- proto write

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def lenDelim(out: ByteArrayOutputStream, field: Int,
      bytes: Array[Byte]): Unit = {
    out.write((field << 3) | 2)
    varint(out, bytes.length.toLong)
    out.write(bytes)
  }

  /** Feature{int64_list{value:[v] packed}} — int64_list is oneof
    * field 3, Int64List.value is packed field 1. */
  def int64Feature(v: Long): Array[Byte] = {
    val packed = new ByteArrayOutputStream()
    varint(packed, v)
    val lst = new ByteArrayOutputStream()
    lenDelim(lst, 1, packed.toByteArray)
    val f = new ByteArrayOutputStream()
    lenDelim(f, 3, lst.toByteArray)
    f.toByteArray
  }

  /** Feature{bytes_list{value:[data]}} — bytes_list is oneof field 1,
    * BytesList.value is repeated bytes field 1. */
  def bytesFeature(data: Array[Byte]): Array[Byte] = {
    val lst = new ByteArrayOutputStream()
    lenDelim(lst, 1, data)
    val f = new ByteArrayOutputStream()
    lenDelim(f, 1, lst.toByteArray)
    f.toByteArray
  }

  /** tf.train.Example for one document: features map in SORTED key
    * order (proto maps are unordered; sorting pins the byte stream). */
  def encodeExample(docId: Long, lang: String, source: String,
      text: String): Array[Byte] = {
    def entry(key: String, feature: Array[Byte]): Array[Byte] = {
      val e = new ByteArrayOutputStream()
      lenDelim(e, 1, key.getBytes(StandardCharsets.UTF_8))
      lenDelim(e, 2, feature)
      e.toByteArray
    }
    val entries = Seq(
      entry("doc_id", int64Feature(docId)),
      entry("lang", bytesFeature(lang.getBytes(StandardCharsets.UTF_8))),
      entry("source",
        bytesFeature(source.getBytes(StandardCharsets.UTF_8))),
      entry("text", bytesFeature(text.getBytes(StandardCharsets.UTF_8))))
    val features = new ByteArrayOutputStream()
    entries.foreach(lenDelim(features, 1, _))
    val ex = new ByteArrayOutputStream()
    lenDelim(ex, 1, features.toByteArray)
    ex.toByteArray
  }

  // -------------------------------------------------------- proto read

  private final class Reader(bytes: Array[Byte], var pos: Int,
      val end: Int) {
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do {
        if (pos >= end) throw new IllegalArgumentException(
          s"proto varint overruns buffer at $pos")
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def slice(): Reader = {
      val len = varint().toInt
      if (pos + len > end) throw new IllegalArgumentException(
        s"proto length $len overruns buffer at $pos")
      val r = new Reader(bytes, pos, pos + len); pos += len; r
    }
    def sliceBytes(): Array[Byte] = {
      val r = slice()
      java.util.Arrays.copyOfRange(bytes, r.pos, r.end)
    }
    def hasMore: Boolean = pos < end
  }

  /** Minimal Example walker for the four document features. Unknown
    * fields are skipped (forward-compatible, like any proto reader);
    * Int64List accepts packed and unpacked encodings. */
  def decodeExample(bytes: Array[Byte]): (Long, String, String, String) = {
    var docId = 0L; var lang = ""; var source = ""; var text = ""
    def readFeatureLong(r: Reader): Long = {
      var v = 0L
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, tag & 7) match {
          case (3, 2) => // Int64List
            val lst = r.slice()
            while (lst.hasMore) {
              val t2 = lst.varint()
              (t2 >> 3, t2 & 7) match {
                case (1, 2) => // packed
                  val p = lst.slice(); while (p.hasMore) v = p.varint()
                case (1, 0) => v = lst.varint()
                case (_, 2) => lst.slice()
                case _ => lst.varint()
              }
            }
          case (_, 2) => r.slice()
          case _ => r.varint()
        }
      }
      v
    }
    def readFeatureBytes(r: Reader): Array[Byte] = {
      var v = Array.emptyByteArray
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, tag & 7) match {
          case (1, 2) => // BytesList
            val lst = r.slice()
            while (lst.hasMore) {
              val t2 = lst.varint()
              if ((t2 >> 3, t2 & 7) == ((1, 2))) v = lst.sliceBytes()
              else if ((t2 & 7) == 2) lst.slice()
              else lst.varint()
            }
          case (_, 2) => r.slice()
          case _ => r.varint()
        }
      }
      v
    }
    val ex = new Reader(bytes, 0, bytes.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      if ((tag >> 3, tag & 7) == ((1, 2))) { // Features
        val fs = ex.slice()
        while (fs.hasMore) {
          val t2 = fs.varint()
          if ((t2 >> 3, t2 & 7) == ((1, 2))) { // FeaturesEntry
            val e = fs.slice()
            var key = ""; var feature: Reader = null
            while (e.hasMore) {
              val t3 = e.varint()
              (t3 >> 3, t3 & 7) match {
                case (1, 2) => key = new String(e.sliceBytes(),
                  StandardCharsets.UTF_8)
                case (2, 2) => feature = e.slice()
                case (_, 2) => e.slice()
                case _ => e.varint()
              }
            }
            if (feature != null) key match {
              case "doc_id" => docId = readFeatureLong(feature)
              case "lang" => lang = new String(readFeatureBytes(feature),
                StandardCharsets.UTF_8)
              case "source" => source = new String(
                readFeatureBytes(feature), StandardCharsets.UTF_8)
              case "text" => text = new String(readFeatureBytes(feature),
                StandardCharsets.UTF_8)
              case _ => ()
            }
          } else if ((t2 & 7) == 2) fs.slice()
          else fs.varint()
        }
      } else if ((tag & 7) == 2) ex.slice()
      else ex.varint()
    }
    (docId, lang, source, text)
  }

  // ----------------------------------------------------------- framing

  /** TFRecord masked CRC32C: ((c >>> 15) | (c << 17)) + 0xa282ead8. */
  def maskedCrc(bytes: Array[Byte]): Int = {
    val c = new CRC32C()
    c.update(bytes, 0, bytes.length)
    val v = c.getValue.toInt // crc32c fits 32 bits
    ((v >>> 15) | (v << 17)) + 0xa282ead8
  }

  def encodeRecord(payload: Array[Byte]): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    buf.put(lenBytes)
    buf.putInt(maskedCrc(lenBytes))
    buf.put(payload)
    buf.putInt(maskedCrc(payload))
    buf.array()
  }

  /** Concatenated records — one TFRecord "file". */
  def encodeFile(payloads: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    payloads.foreach(p => bos.write(encodeRecord(p)))
    bos.toByteArray
  }

  /** Parse a concatenated-record stream, verifying BOTH CRCs per
    * record. FAILFAST on mismatch or truncation. */
  def parseFile(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var off = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"TFRecord parse at byte $off: $msg")
    while (off < bytes.length) {
      if (off + 12 > bytes.length) fail("truncated header")
      val bb = ByteBuffer.wrap(bytes, off, 12).order(ByteOrder.LITTLE_ENDIAN)
      val len = bb.getLong
      val lenCrc = bb.getInt
      if (len < 0 || len > Int.MaxValue - 16) fail(s"bad length $len")
      val lenBytes = java.util.Arrays.copyOfRange(bytes, off, off + 8)
      if (maskedCrc(lenBytes) != lenCrc) fail("length CRC mismatch")
      val dataStart = off + 12
      val dataEnd = dataStart + len.toInt
      if (dataEnd + 4 > bytes.length) fail("truncated record data")
      val data = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
      val dataCrc = ByteBuffer.wrap(bytes, dataEnd, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      if (maskedCrc(data) != dataCrc) fail("data CRC mismatch")
      out += data
      off = dataEnd + 4
    }
    out.toSeq
  }
}
