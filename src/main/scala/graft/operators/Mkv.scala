package graft.operators

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.util.control.NonFatal

/** Matroska/WebM (EBML) container metadata — the MKV twin of [[Mp4]],
  * parsed from the public EBML + Matroska element specs: duration and
  * timestamp scale from `Segment/Info`, presentation size from the
  * first video `TrackEntry`, codec id string, track count. No decoder
  * involved. [[buildMinimal]] writes the same structure for the oracle
  * lane's ground truth (generator → bytes → parse must invert).
  *
  * EBML layout: every element is [VINT id][VINT size][payload]; the
  * id keeps its length-marker bits, the size strips them. */
object Mkv {

  case class Meta(timestampScaleNs: Long, durationMs: Long,
                  width: Int, height: Int, codec: String, nTracks: Int)

  // Matroska element ids (with marker bits, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val Segment = 0x18538067L
  private val Info = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val Video = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val CodecID = 0x86L

  private def vintLen(b: Byte): Int = {
    var mask = 0x80
    var n = 1
    while (n <= 8 && (b & mask) == 0) { mask >>= 1; n += 1 }
    n
  }

  /** Element id: marker bits KEPT (the wire form above). */
  private def readId(b: Array[Byte], o: Int): (Long, Int) = {
    val n = vintLen(b(o))
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    (v, n)
  }

  /** Element size: marker bits STRIPPED. */
  private def readSize(b: Array[Byte], o: Int): (Long, Int) = {
    val n = vintLen(b(o))
    var v = (b(o) & (0xff >>> n)).toLong
    var i = 1
    while (i < n) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    (v, n)
  }

  private def readUint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
    v
  }

  private def readFloat(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(readUint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(readUint(b, s, e))
    case _ => 0.0
  }

  /** Walk child elements of [start, end): f(id, payloadStart,
    * payloadEnd). Malformed sizes stop the walk (never throw). */
  private def walk(b: Array[Byte], start: Int, end: Int)
                  (f: (Long, Int, Int) => Unit): Unit = {
    var off = start
    var ok = true
    while (ok && off + 2 <= end) {
      val (id, idLen) = readId(b, off)
      if (off + idLen >= end) ok = false
      else {
        val (size, szLen) = readSize(b, off + idLen)
        val ps = off + idLen + szLen
        if (size < 0 || ps + size > end) ok = false
        else {
          f(id, ps, ps + size.toInt)
          off = ps + size.toInt
        }
      }
    }
  }

  /** Parse container metadata; None when the bytes are not EBML (no
    * EBML header / no Segment Info). Never throws. */
  def parse(content: Array[Byte]): Option[Meta] = try {
    if (content.length < 8) return None
    var sawHeader = false
    var scale = 1000000L // Matroska default: 1 ms per tick
    var durationTicks = -1.0
    var width = 0
    var height = 0
    var codec = ""
    var tracks = 0
    walk(content, 0, content.length) { (id, s, e) =>
      id match {
        case EbmlHeader => sawHeader = true
        case Segment => walk(content, s, e) { (id2, s2, e2) =>
          id2 match {
            case Info => walk(content, s2, e2) { (id3, s3, e3) =>
              id3 match {
                case TimestampScale => scale = readUint(content, s3, e3)
                case Duration => durationTicks = readFloat(content, s3, e3)
                case _ =>
              }
            }
            case Tracks => walk(content, s2, e2) { (id3, s3, e3) =>
              if (id3 == TrackEntry) {
                tracks += 1
                walk(content, s3, e3) { (id4, s4, e4) =>
                  id4 match {
                    case CodecID if codec.isEmpty =>
                      codec = new String(content, s4, e4 - s4, "ISO-8859-1")
                    case Video => walk(content, s4, e4) { (id5, s5, e5) =>
                      id5 match {
                        case PixelWidth => width = readUint(content, s5, e5).toInt
                        case PixelHeight => height = readUint(content, s5, e5).toInt
                        case _ =>
                      }
                    }
                    case _ =>
                  }
                }
              }
            }
            case _ =>
          }
        }
        case _ =>
      }
    }
    if (sawHeader && durationTicks >= 0)
      Some(Meta(scale, (durationTicks * scale / 1e6).toLong,
        width, height, codec, tracks))
    else None
  } catch { case NonFatal(_) => None }

  // ---- minimal writer (fixture ground truth) ----

  private def writeId(o: DataOutputStream, id: Long): Unit = {
    // ids carry their own length in the leading bits — emit big-endian
    // without the leading zero bytes
    var n = 8
    while (n > 1 && (id >>> ((n - 1) * 8)) == 0) n -= 1
    var i = n - 1
    while (i >= 0) { o.writeByte(((id >>> (i * 8)) & 0xff).toInt); i -= 1 }
  }

  private def element(id: Long)(payload: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    payload(out)
    out.flush()
    val body = bos.toByteArray
    require(body.length < 127, "minimal writer: 1-byte sizes only")
    val full = new ByteArrayOutputStream()
    val o2 = new DataOutputStream(full)
    writeId(o2, id)
    o2.writeByte(0x80 | body.length) // 1-byte VINT size
    o2.write(body)
    o2.flush()
    full.toByteArray
  }

  private def uintBytes(v: Long): Array[Byte] = {
    var n = 8
    while (n > 1 && (v >>> ((n - 1) * 8)) == 0) n -= 1
    Array.tabulate(n)(i => ((v >>> ((n - 1 - i) * 8)) & 0xff).toByte)
  }

  /** A minimal valid Matroska skeleton: EBML header + Segment{Info{
    * TimestampScale, Duration(float64)}, Tracks{TrackEntry{CodecID,
    * Video{PixelWidth, PixelHeight}}}}. `durationTicks` is in
    * `timestampScaleNs` units (the Matroska contract). */
  def buildMinimal(timestampScaleNs: Long, durationTicks: Double,
                   w: Int, h: Int, codec: String): Array[Byte] = {
    val header = element(EbmlHeader) { o =>
      // DocType "matroska" (0x4282) — enough for a metadata reader
      writeId(o, 0x4282L); o.writeByte(0x80 | 8); o.writeBytes("matroska")
    }
    val info = element(Info) { o =>
      val ts = uintBytes(timestampScaleNs)
      writeId(o, TimestampScale); o.writeByte(0x80 | ts.length); o.write(ts)
      writeId(o, Duration); o.writeByte(0x80 | 8)
      o.writeLong(java.lang.Double.doubleToLongBits(durationTicks))
    }
    val video = element(Video) { o =>
      val wb = uintBytes(w.toLong); val hb = uintBytes(h.toLong)
      writeId(o, PixelWidth); o.writeByte(0x80 | wb.length); o.write(wb)
      writeId(o, PixelHeight); o.writeByte(0x80 | hb.length); o.write(hb)
    }
    val track = element(TrackEntry) { o =>
      writeId(o, CodecID); o.writeByte(0x80 | codec.length); o.writeBytes(codec)
      o.write(video)
    }
    val tracks = element(Tracks)(o => o.write(track))
    val segment = element(Segment) { o => o.write(info); o.write(tracks) }
    header ++ segment
  }
}
