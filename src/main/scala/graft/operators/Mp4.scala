package graft.operators

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.util.control.NonFatal

/** ISO-BMFF (MP4) container metadata — REAL box-structure parsing from
  * the public format spec (ISO/IEC 14496-12): duration and timescale
  * from `moov/mvhd`, presentation size from `moov/trak/tkhd` (16.16
  * fixed point), sample-entry codec fourcc from
  * `trak/mdia/minf/stbl/stsd`, major brand from `ftyp`. No decoder is
  * involved — this makes the video METADATA path real even though the
  * JDK ships no video codec (the decode kernel stays stubbed, see
  * [[Multimodal.fakeDecode]]).
  *
  * [[buildMinimal]] writes the same structure (a valid minimal
  * `ftyp`+`moov` skeleton), which gives the oracle lane its ground
  * truth: generator parameters → bytes → parse must invert exactly.
  */
object Mp4 {

  case class Meta(container: String, timescale: Long, durationMs: Long,
                  width: Int, height: Int, codec: String, nTracks: Int)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk the child boxes of [start, end): f(type, payloadStart,
    * payloadEnd). Malformed sizes stop the walk (never throw). */
  private def walk(b: Array[Byte], start: Int, end: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var off = start
    var ok = true
    while (ok && off + 8 <= end) {
      var size = be32(b, off)
      val typ = fourcc(b, off + 4)
      var hdr = 8
      if (size == 1 && off + 16 <= end) { size = be64(b, off + 8); hdr = 16 }
      else if (size == 0) size = end - off
      if (size < hdr || off + size > end) ok = false
      else {
        f(typ, off + hdr, off + size.toInt)
        off += size.toInt
      }
    }
  }

  /** Parse container metadata; None when the bytes are not ISO-BMFF
    * (no mvhd timescale found). Never throws. */
  def parse(content: Array[Byte]): Option[Meta] = try {
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    var codec = ""
    var tracks = 0
    walk(content, 0, content.length) { (t, s, e) =>
      t match {
        case "ftyp" if e - s >= 4 => brand = fourcc(content, s)
        case "moov" => walk(content, s, e) { (t2, s2, e2) =>
          t2 match {
            case "mvhd" if e2 - s2 >= 20 =>
              val v = content(s2) & 0xff
              if (v == 1) {
                // a truncated v1 payload must NOT fall through to the
                // v0 offsets (they'd read the middle of the creation
                // time as a "timescale" and report garbage as parsed)
                if (e2 - s2 >= 32) {
                  timescale = be32(content, s2 + 20)
                  duration = be64(content, s2 + 24)
                }
              } else {
                timescale = be32(content, s2 + 12)
                duration = be32(content, s2 + 16)
              }
            case "trak" =>
              tracks += 1
              walk(content, s2, e2) { (t3, s3, e3) =>
                t3 match {
                  case "tkhd" =>
                    // width/height are 16.16 fixed at the end of the
                    // box: v0 payload offsets 76/80, v1 88/92
                    val v = content(s3) & 0xff
                    val base = if (v == 1) s3 + 88 else s3 + 76
                    if (base + 8 <= e3) {
                      val w = (be32(content, base) >> 16).toInt
                      val h = (be32(content, base + 4) >> 16).toInt
                      if (w > 0 && h > 0) { width = w; height = h }
                    }
                  case "mdia" => walk(content, s3, e3) { (t4, s4, e4) =>
                    if (t4 == "minf") walk(content, s4, e4) { (t5, s5, e5) =>
                      if (t5 == "stbl") walk(content, s5, e5) { (t6, s6, e6) =>
                        // stsd payload: verflags(4) entry_count(4), then
                        // the first sample entry: size(4) format(4)
                        if (t6 == "stsd" && codec.isEmpty && e6 - s6 >= 16)
                          codec = fourcc(content, s6 + 12)
                      }
                    }
                  }
                  case _ =>
                }
              }
            case _ =>
          }
        }
        case _ =>
      }
    }
    if (timescale > 0)
      Some(Meta(brand, timescale, duration * 1000L / timescale,
        width, height, codec, tracks))
    else None
  } catch { case NonFatal(_) => None }

  private def box(typ: String)(payload: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    payload(out)
    out.flush()
    val body = bos.toByteArray
    val full = new ByteArrayOutputStream()
    val o2 = new DataOutputStream(full)
    o2.writeInt(body.length + 8)
    o2.writeBytes(typ)
    o2.write(body)
    o2.flush()
    full.toByteArray
  }

  /** A minimal valid single-video-track MP4 skeleton: ftyp(isom) +
    * moov{mvhd(timescale, duration), trak{tkhd(w, h),
    * mdia/minf/stbl/stsd(codec)}}. Enough structure for any
    * spec-conforming metadata reader; no media data (mdat omitted —
    * legal for a metadata fixture). */
  def buildMinimal(timescale: Int, duration: Long, w: Int, h: Int,
                   codec: String): Array[Byte] = {
    require(codec.length == 4, s"codec fourcc must be 4 chars: '$codec'")
    val identity = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    val ftyp = box("ftyp") { o => o.writeBytes("isom"); o.writeInt(0) }
    val mvhd = box("mvhd") { o =>
      o.writeInt(0)                  // version 0 + flags
      o.writeInt(0); o.writeInt(0)   // creation, modification
      o.writeInt(timescale)
      o.writeInt(duration.toInt)
      o.writeInt(0x00010000)         // rate 1.0
      o.writeShort(0x0100)           // volume 1.0
      o.writeShort(0)
      o.writeLong(0)                 // reserved
      identity.foreach(o.writeInt)   // matrix
      (0 until 6).foreach(_ => o.writeInt(0)) // pre_defined
      o.writeInt(2)                  // next_track_ID
    }
    val tkhd = box("tkhd") { o =>
      o.writeInt(0x00000007)         // version 0, flags: enabled|in-movie|in-preview
      o.writeInt(0); o.writeInt(0)   // creation, modification
      o.writeInt(1)                  // track_ID
      o.writeInt(0)                  // reserved
      o.writeInt(duration.toInt)
      o.writeLong(0)                 // reserved
      o.writeShort(0); o.writeShort(0) // layer, alternate_group
      o.writeShort(0); o.writeShort(0) // volume (video: 0), reserved
      identity.foreach(o.writeInt)   // matrix
      o.writeInt(w << 16)            // width 16.16
      o.writeInt(h << 16)            // height 16.16
    }
    val sampleEntry = box(codec) { o => o.writeLong(0) } // 8 reserved bytes
    val stsd = box("stsd") { o =>
      o.writeInt(0)                  // version + flags
      o.writeInt(1)                  // entry_count
      o.write(sampleEntry)
    }
    val stbl = box("stbl")(o => o.write(stsd))
    val minf = box("minf")(o => o.write(stbl))
    val mdia = box("mdia")(o => o.write(minf))
    val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
    val moov = box("moov") { o => o.write(mvhd); o.write(trak) }
    ftyp ++ moov
  }
}
