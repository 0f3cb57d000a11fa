package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video travel as opaque BINARY columns with typed metadata, and the
  * compute-heavy steps run batched per partition.
  *
  * IMAGE rows decode for real via `javax.imageio` (ships with the JDK:
  * PNG/JPEG/GIF/BMP need no external codec) — decode → deterministic
  * nearest-neighbor thumbnail → luminance histogram feature, and a real
  * pixel resize that rewrites `content`. AUDIO rows decode for real via
  * `javax.sound.sampled` (also JDK-shipped: WAV/AIFF/AU PCM need no
  * external codec) — decode → per-window RMS-energy envelope feature.
  * VIDEO decode remains a deterministic STUB (the JDK genuinely ships
  * no video demuxer/codec); its signature (bytes → unit-norm
  * float[dim]) is the real contract, and swapping in a codec changes
  * no plan shape.
  *
  * (Beyond the reference surface — vers is vectors-only — per the
  * driver's north star.)
  */
object Multimodal {

  /** Canonical media schema. `meta` fields are nullable by modality. */
  case class MediaRow(id: Long, content: Array[Byte], media_type: String,
                      width: Int, height: Int, channels: Int,
                      sample_rate: Int, n_frames: Int)

  case class MediaFeature(id: Long, media_type: String, feature: Array[Float])

  /** Real image decode+featurize via the JDK's ImageIO: decode the
    * compressed bytes, sample a 64×64 nearest-neighbor luminance
    * thumbnail (integer index math — deterministic across JDKs, and
    * bounds per-row cost for arbitrarily large sources), histogram the
    * luminances into `dim` bins, L2-normalize. None on undecodable
    * bytes (truncated upload, unsupported codec) — the caller picks the
    * fallback, never this kernel. */
  private[graft] def imageFeature(content: Array[Byte], dim: Int): Option[Array[Float]] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
      val T = 64
      val w = im.getWidth
      val h = im.getHeight
      val hist = new Array[Float](dim)
      var y = 0
      while (y < T) {
        var x = 0
        while (x < T) {
          val rgb = im.getRGB(x * w / T, y * h / T)
          val lum = 0.299 * ((rgb >>> 16) & 0xFF) +
            0.587 * ((rgb >>> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          hist(math.min(dim - 1, (lum * dim / 256.0).toInt)) += 1f
          x += 1
        }
        y += 1
      }
      val norm = math.sqrt(hist.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
      hist.map(_ / norm) // norm > 0 always: T² samples land somewhere
    }
  }

  /** Real audio decode+featurize via the JDK's `javax.sound.sampled`
    * (WAV/AIFF/AU, any PCM width the JDK converter reaches): decode to
    * 16-bit mono PCM, split the sample stream into `dim` equal time
    * windows, RMS energy per window, L2-normalize — a deterministic
    * loudness envelope that embeds straight into the index/dedup
    * operators (silence detection, repeated-jingle dedup). None on
    * undecodable bytes — the caller picks the fallback. */
  private[graft] def audioFeature(content: Array[Byte], dim: Int): Option[Array[Float]] = {
    decodePcm16(content).map { case (pcm, _) =>
      val nSamples = pcm.length / 2
      val feat = new Array[Float](dim)
      var w = 0
      while (w < dim) {
        val lo = (w.toLong * nSamples / dim).toInt
        val hi = math.max(lo + 1, ((w + 1).toLong * nSamples / dim).toInt)
        var acc = 0.0
        var i = lo
        while (i < math.min(hi, nSamples)) {
          val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort / 32768.0
          acc += s * s
          i += 1
        }
        feat(w) = math.sqrt(acc / math.max(1, math.min(hi, nSamples) - lo)).toFloat
        w += 1
      }
      val norm = math.sqrt(feat.foldLeft(0.0)((a, v) => a + v.toDouble * v)).toFloat
      if (norm < 1e-6f) feat else feat.map(_ / norm) // all-silence stays zero
    }
  }

  /** Shared audio decode: any JDK-reachable container/width
    * (WAV/AIFF/AU) to 16-bit signed little-endian mono PCM at the
    * SOURCE rate, plus that rate — the rate is what lets callers frame
    * by absolute duration ([[audioBlockHashes]]) instead of by
    * track-relative fractions ([[audioFeature]]). None on undecodable
    * bytes. */
  private[graft] def decodePcm16(content: Array[Byte]): Option[(Array[Byte], Float)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val f = in.getFormat
      // normalize to 16-bit signed little-endian mono at the source
      // rate — one fixed sample layout for the window math
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, 1, 2, f.getSampleRate, false)
      val conv = AudioSystem.getAudioInputStream(target, in)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = conv.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = conv.read(buf) }
      conv.close(); in.close()
      Option(bos.toByteArray).filter(_.length >= 2)
        .map(pcm => (pcm, f.getSampleRate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** 64-bit perceptual hash (DCT pHash) — the image near-dup
    * fingerprint: decode → 32×32 box-filtered luminance grid
    * (mean per cell, integer index math — dihedral-equivariant, see
    * the in-body note)
    * → 2-D DCT-II → keep the 8×8 low-frequency block → bit(u·8+v) set
    * iff coeff(u,v) > mean of the 63 non-DC coefficients — computed in
    * the CANONICAL dihedral orientation (content-chosen by three
    * signed coefficient statistics; each orientation's DCT block is a
    * permutation/sign-flip of the computed one, so canonicalization
    * costs index arithmetic, not 8 decodes).
    * Re-encodes, resizes, format shifts, mirrors, and 90°/180°
    * rotations preserve the canonical hash to within a few bits —
    * exactly the property [[Dedup.imagePhashPairs]]'s pigeonhole join
    * needs. Crops remain out of scope (they shift DCT content).
    * Deterministic across JVMs: StrictMath cosine, integer pixel
    * sampling, lossless PNG decode. None on undecodable bytes. */
  private[graft] def phash64(content: Array[Byte]): Option[Long] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
      val T = 32
      val w = im.getWidth; val h = im.getHeight
      // BOX-FILTER downsample (mean luminance per cell), not point
      // sampling: the floor(x·T/w) pixel→cell partition maps a
      // mirrored pixel to the mirrored cell, so the 32×32 grid of a
      // mirrored/rotated image IS the mirrored/rotated grid (exactly
      // when T | w and T | h, within one pixel row otherwise) — the
      // property the dihedral-canonical hash below needs; point
      // sampling was off by one pixel per axis and leaked ~7 bits on
      // 180° rotations.
      val gray = new Array[Double](T * T)
      val cnt = new Array[Int](T * T)
      var py = 0
      while (py < h) {
        val cy = (py.toLong * T / h).toInt
        var px = 0
        while (px < w) {
          val cx = (px.toLong * T / w).toInt
          val rgb = im.getRGB(px, py)
          gray(cy * T + cx) += 0.299 * ((rgb >>> 16) & 0xFF) +
            0.587 * ((rgb >>> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          cnt(cy * T + cx) += 1
          px += 1
        }
        py += 1
      }
      var ci = 0
      while (ci < T * T) {
        if (cnt(ci) > 0) gray(ci) /= cnt(ci)
        ci += 1
      }
      // C(u,v) = Σ_{x,y} gray(x,y)·cos(π(2x+1)u/2T)·cos(π(2y+1)v/2T),
      // u,v < 8 — 64 coefficients over 1024 pixels, O(64·T²) with the
      // cosine table hoisted
      val cos = Array.tabulate(8, T)((u, x) =>
        StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * T)))
      val coef = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var yy = 0
          while (yy < T) {
            var xx = 0
            val cu = cos(u)
            val rowBase = yy * T
            val cvy = cos(v)(yy)
            while (xx < T) {
              s += gray(rowBase + xx) * cu(xx) * cvy
              xx += 1
            }
            yy += 1
          }
          coef(u * 8 + v) = s
          v += 1
        }
        u += 1
      }
      // DIHEDRAL INVARIANCE: a mirrored or 90°-rotated copy (common in
      // scraped corpora) permutes/sign-flips the DCT block instead of
      // perturbing it — flip-x multiplies C(u,v) by (−1)^u, flip-y by
      // (−1)^v, transpose swaps (u,v) — so the 8 dihedral orientations'
      // coefficient blocks all derive from THIS one by cheap index
      // arithmetic. Canonicalize by CONTENT, not by hash-argmin (min
      // over the 8 orientation hashes compares ~random 64-bit values,
      // so a few perturbed bits flip the winner — measured 15% missed
      // perturbed dups at 200k): three signed statistics, each
      // equivariant in exactly one group generator and invariant in
      // the others, pick the orientation —
      //   t = Σ_{u>v}|C| − Σ_{u<v}|C|   (flip-invariant) → transpose iff t<0
      //   a = Σ_{u odd, v even} C        (y-flip-invariant) → x-flip iff a<0
      //   b = Σ_{u even, v odd} C        (x-flip-invariant) → y-flip iff b<0
      // A perturbation moves each statistic continuously, so the
      // decisions only flip when one sits near zero (near-symmetric
      // content — whose orientations hash close anyway).
      // Crop-robustness remains a real limit: cropping shifts DCT
      // content, not just signs.
      var tStat = 0.0
      var u0 = 0
      while (u0 < 8) {
        var v0 = 0
        while (v0 < 8) {
          if (u0 > v0) tStat += StrictMath.abs(coef(u0 * 8 + v0))
          else if (u0 < v0) tStat -= StrictMath.abs(coef(u0 * 8 + v0))
          v0 += 1
        }
        u0 += 1
      }
      val transpose = tStat < 0
      def cAt(u: Int, v: Int): Double =
        if (transpose) coef(v * 8 + u) else coef(u * 8 + v)
      var aStat = 0.0
      var bStat = 0.0
      u0 = 0
      while (u0 < 8) {
        var v0 = 0
        while (v0 < 8) {
          if (u0 % 2 == 1 && v0 % 2 == 0) aStat += cAt(u0, v0)
          if (u0 % 2 == 0 && v0 % 2 == 1) bStat += cAt(u0, v0)
          v0 += 1
        }
        u0 += 1
      }
      val xs = if (aStat < 0) 1 else 0
      val ys = if (bStat < 0) 1 else 0
      def get(u: Int, v: Int): Double =
        if (((xs * u + ys * v) & 1) == 1) -cAt(u, v) else cAt(u, v)
      var mean = 0.0
      var u1 = 0
      while (u1 < 8) {
        var v1 = 0
        while (v1 < 8) {
          if (u1 != 0 || v1 != 0) mean += get(u1, v1)
          v1 += 1
        }
        u1 += 1
      }
      mean /= 63.0
      var bits = 0L
      var i2 = 0
      while (i2 < 64) {
        if (get(i2 / 8, i2 % 8) > mean) bits |= (1L << i2)
        i2 += 1
      }
      bits
    }
  }

  /** 64-bit audio fingerprint — the energy-delta hash (the
    * Haitsma–Kalker 2002 shape at its simplest useful form): decode to
    * PCM via [[audioFeature]]'s real JDK path, split into 65 equal
    * time windows, bit i = RMS(window i+1) > RMS(window i). Sign-of-
    * delta is invariant to VOLUME (any monotone gain preserves every
    * comparison) and to the L2 normalization inside audioFeature, and
    * robust to re-encoding — the properties repeated-jingle /
    * duplicate-track dedup needs. None on undecodable bytes. */
  private[graft] def audioHash64(content: Array[Byte]): Option[Long] =
    audioFeature(content, 65).map { env =>
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (env(i + 1) > env(i)) bits |= (1L << i)
        i += 1
      }
      bits
    }

  /** Fingerprint frame over a media table: (id, ahash LONG) for every
    * decodable audio row — the audio face of [[imagePhash]], 8 B per
    * track leaving the scan; pairs via
    * [[Dedup.audioHashPairs]]. Undecodable rows drop (quarantine by
    * anti-join, as with images). */
  def audioHash(media: DataFrame, idCol: String = "id",
                contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"),
        col(contentCol).cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioHash64(bytes).map(h => (id, h))
      })
      .toDF("id", "ahash")
  }

  /** Shift-robust per-block audio sub-fingerprints — the actual
    * Haitsma–Kalker (ISMIR 2002) scheme shape, fixing the global
    * 65-window hash's blind spot: [[audioHash64]] divides the WHOLE
    * track into equal windows, so a silence-trimmed or intro-clipped
    * copy (the commonest real audio dup) shifts every window boundary
    * and the hash diverges. Here frames are FIXED-DURATION
    * (`frameSec`, anchored to absolute time via the decoded sample
    * rate) sliding by a small `hopSec`; each frame's 32-bit
    * sub-fingerprint is the sign-of-delta over its 33 equal
    * sub-window RMS energies (volume-invariant like the global hash).
    * A copy trimmed by any multiple of the hop produces EXACTLY the
    * original's sub-fingerprints at a constant block offset, and a
    * trim between hop points lands within a hop/2 misalignment —
    * small against the sub-window width, so most bits hold. Matching
    * is the pigeonhole anchor join + offset-agreement vote in
    * [[Dedup.audioBlockPairs]]. Tracks shorter than one frame hash as
    * a single whole-track frame. None on undecodable bytes. */
  private[graft] def audioBlockHashes(content: Array[Byte],
                                      frameSec: Double = 0.25,
                                      hopSec: Double = 0.0625): Option[Array[(Int, Int)]] =
    decodePcm16(content).map { case (pcm, rate) =>
      val nSamples = pcm.length / 2
      val frameLen = math.max(2, math.round(frameSec * rate).toInt)
      val hop = math.max(1, math.round(hopSec * rate).toInt)
      def rms(lo: Int, hi: Int): Double = {
        var acc = 0.0
        var i = lo
        while (i < hi) {
          val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort / 32768.0
          acc += s * s
          i += 1
        }
        math.sqrt(acc / math.max(1, hi - lo))
      }
      def frameFp(start: Int, len: Int): Int = {
        val e = new Array[Double](33)
        var w = 0
        while (w < 33) {
          val lo = start + (w.toLong * len / 33).toInt
          val hi = start + math.max(
            (w.toLong * len / 33).toInt + 1, ((w + 1).toLong * len / 33).toInt)
          e(w) = rms(lo, math.min(hi, nSamples))
          w += 1
        }
        var bits = 0
        var i = 0
        while (i < 32) {
          if (e(i + 1) > e(i)) bits |= (1 << i)
          i += 1
        }
        bits
      }
      if (nSamples < frameLen) Array((0, frameFp(0, nSamples)))
      else {
        val nFrames = (nSamples - frameLen) / hop + 1
        Array.tabulate(nFrames)(k => (k, frameFp(k * hop, frameLen)))
      }
    }

  /** Block-fingerprint frame over a media table: (id, block, bfp) for
    * every decodable audio row — one ~4 B sub-fingerprint per hop
    * (≈16/s at the defaults), the posting-list the shift-robust pair
    * join runs on. Still metadata-sized against the media bytes: a
    * 3-minute track is ~3 k rows of 16 B vs megabytes of audio. */
  def audioBlockFingerprints(media: DataFrame, idCol: String = "id",
                             contentCol: String = "content",
                             frameSec: Double = 0.25,
                             hopSec: Double = 0.0625): DataFrame = {
    require(frameSec > 0 && hopSec > 0 && hopSec <= frameSec,
      s"audioBlockFingerprints: need 0 < hopSec <= frameSec, got frame=$frameSec hop=$hopSec")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"),
        col(contentCol).cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        audioBlockHashes(bytes, frameSec, hopSec).toSeq.flatMap(_.map {
          case (blk, fp) => (id, blk, fp)
        })
      })
      .toDF("id", "block", "bfp")
  }

  /** Perceptual-hash frame over a media table: (id, phash LONG) for
    * every decodable image row — the fingerprint stage of image
    * near-dup dedup (pairs via [[Dedup.imagePhashPairs]]). Narrow
    * per-partition decode, one long per image leaves the scan —
    * at 100 TB of images the fingerprint table is corpus-count × 8 B.
    * Undecodable rows are dropped here (the quarantine pattern:
    * anti-join this result against the input to surface them). */
  def imagePhash(media: DataFrame, idCol: String = "id",
                 contentCol: String = "content"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long").as("id"),
        col(contentCol).cast("binary").as("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        phash64(bytes).map(p => (id, p))
      })
      .toDF("id", "phash")
  }

  /** STUB decode+featurize kernel for the one modality the JDK has no
    * codec for (video): a deterministic PRNG seeded from the
    * content bytes stands in for a real decoder+encoder. Replace the body
    * with the actual codec; the signature (bytes → unit-norm float[dim])
    * is the real contract. */
  private[graft] def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L // deterministic content hash (FNV-ish)
    var i = 0
    while (i < content.length) { h = h * 31 + (content(i) & 0xff); i += 1 }
    val rnd = new scala.util.Random(h)
    val raw = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val norm = math.sqrt(raw.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm < 1e-6f) raw else raw.map(_ / norm)
  }

  /** Batched feature extraction: one partition = one batch, kernel called
    * per row inside `mapPartitions` (no per-row task overhead; the shape
    * a vectorized/native decoder needs). Image and audio rows decode for
    * real ([[imageFeature]], [[audioFeature]]); undecodable bytes and
    * the codec-less video modality fall back to the deterministic stub.
    * Output embeds straight into the engine's index/dedup/similarity
    * operators. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val feat = (r.media_type match {
          case "image" => imageFeature(r.content, dim)
          case "audio" => audioFeature(r.content, dim)
          case _       => None
        }).getOrElse(fakeDecode(r.content, dim))
        MediaFeature(r.id, r.media_type, feat)
      }
    }
  }

  /** Resize. Image rows REWRITE `content`: decode, nearest-neighbor
    * resample to w×h (integer index math — deterministic), re-encode as
    * PNG (lossless, so resize∘resize is stable). Non-image rows (no JDK
    * codec) update metadata only. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val content =
        if (r.media_type != "image") r.content
        else {
          val imgOpt =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content)))
            catch { case scala.util.control.NonFatal(_) => None }
          imgOpt.filter(im => im.getWidth > 0 && im.getHeight > 0).map { im =>
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                out.setRGB(x, y,
                  im.getRGB(x * im.getWidth / w, y * im.getHeight / h))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            bos.toByteArray
          }.getOrElse(r.content) // undecodable: pass through untouched
        }
      r.copy(content = content, width = w, height = h)
    }
  }

  /** Container metadata for video rows — REAL parsing of the two
    * public container families: ISO-BMFF ([[Mp4.parse]]: ftyp brand,
    * mvhd duration, tkhd dimensions, stsd codec fourcc) and
    * Matroska/WebM ([[Mkv.parse]]: EBML Segment/Info duration +
    * timestamp scale, video TrackEntry dimensions, CodecID). No
    * decoder involved. One narrow map; unparseable bytes surface as
    * parsed=false sentinel rows, never errors — at crawl scale a
    * corrupt container is data, not an exception. */
  def videoMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select(col("id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, c) =>
        Mp4.parse(c) match {
          case Some(m) =>
            (id, true, m.container, m.durationMs, m.width, m.height,
              m.codec, m.nTracks)
          case None => Mkv.parse(c) match {
            case Some(m) =>
              (id, true, "matroska", m.durationMs, m.width, m.height,
                m.codec, m.nTracks)
            case None => (id, false, "", -1L, -1, -1, "", 0)
          }
        }
      }
      .toDF("id", "parsed", "container", "duration_ms", "width", "height",
        "codec", "n_tracks")
  }

  /** Frame sampling for video rows: emits `n` (frame_idx, byte-offset
    * slice) rows per video via posexplode — real distributed fan-out
    * plumbing; the slice bounds are what a real demuxer would seek. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media
      .filter(col("media_type") === "video")
      .select(col("id"), length(col("content")).as("total"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("ord", "frame_idx")))
      .withColumn("byte_offset", (col("frame_idx") * col("total")) / lit(n))
      .select(col("id"), col("frame_idx"),
        col("byte_offset").cast("long").as("byte_offset"))

  /** Wrap a text table as a media table (utf-8 bytes) — lets the binary
    * plumbing run against the driver's documents fixture. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id"),
      encode(col("text"), "utf-8").cast("binary").as("content"),
      lit("text").as("media_type"),
      lit(0).as("width"), lit(0).as("height"), lit(0).as("channels"),
      lit(0).as("sample_rate"), lit(0).as("n_frames"))
}
