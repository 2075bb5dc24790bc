package graft.operators

/** Matroska / WebM CONTAINER walk — [[Mp4Codec]]'s EBML twin (public spec:
  * RFC 8794 EBML + the Matroska element registry): DocType, duration,
  * per-track codec ids, pixel geometry, channel layout and sampling rate
  * straight from the element tree, NO frame decode. Pure byte parsing with
  * EBML variable-length ids/sizes (unknown-size elements clamp to the
  * enclosing scope); bounds-checked, Option on malformation, never throws.
  */
object MkvCodec {

  final case class Track(trackType: Int, codecId: String,
                         width: Int, height: Int,
                         channels: Int, sampleRate: Int)

  final case class Info(docType: String, durationMs: Long,
                        tracks: Vector[Track], payloadBytes: Long)

  // Matroska element ids (marker bits included, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val DocType = 0x4282L
  private val Segment = 0x18538067L
  private val SegInfo = 0x1549A966L
  private val TimestampScale = 0x2AD7B1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654AE6BL
  private val TrackEntry = 0xAEL
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val VideoEl = 0xE0L
  private val PixelWidth = 0xB0L
  private val PixelHeight = 0xBAL
  private val AudioEl = 0xE1L
  private val SamplingFrequency = 0xB5L
  private val Channels = 0x9FL

  /** Length of a varint from its first byte (1–8); 0 if invalid. */
  private def vintLen(first: Int): Int = {
    var mask = 0x80
    var len = 1
    while (len <= 8) {
      if ((first & mask) != 0) return len
      mask >>= 1
      len += 1
    }
    0
  }

  /** Element id: read WITH its marker bits (the registry convention). */
  private def readId(b: Array[Byte], o: Int, to: Int): Option[(Long, Int)] = {
    if (o >= to) return None
    val n = vintLen(b(o) & 0xff)
    if (n == 0 || n > 4 || o + n > to) return None
    var v = 0L
    var i = 0
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    Some((v, n))
  }

  /** Element size: marker bit stripped; all-value-bits-set means UNKNOWN
    * size (returned as -1 — the element runs to the enclosing scope). */
  private def readSize(b: Array[Byte], o: Int, to: Int): Option[(Long, Int)] = {
    if (o >= to) return None
    val n = vintLen(b(o) & 0xff)
    if (n == 0 || o + n > to) return None
    var v = (b(o) & 0xffL) & ((1L << (8 - n)) - 1)
    var i = 1
    while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * n)) - 1
    Some((if (v == allOnes) -1L else v, n))
  }

  /** Walk children of [from, to): f(id, payloadStart, payloadEnd). Stops
    * at the first malformed header. */
  private def walk(b: Array[Byte], from: Int, to: Int)
                  (f: (Long, Int, Int) => Unit): Unit = {
    var o = from
    var ok = true
    while (ok && o < to) {
      (for {
        (id, idLen) <- readId(b, o, to)
        (sz, szLen) <- readSize(b, o + idLen, to)
      } yield {
        val start = (o + idLen + szLen).toLong
        val end = if (sz < 0) to.toLong else start + sz
        if (end > to || end < start) ok = false
        else { f(id, start.toInt, end.toInt); o = end.toInt }
      }).getOrElse { ok = false }
    }
  }

  private def uint(b: Array[Byte], from: Int, to: Int): Long = {
    var v = 0L
    var i = from
    while (i < to && i - from < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def float(b: Array[Byte], from: Int, to: Int): Double =
    (to - from) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(b, from, to).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(b, from, to))
      case _ => Double.NaN
    }

  private def str(b: Array[Byte], from: Int, to: Int): String =
    new String(b, from, to - from, java.nio.charset.StandardCharsets.UTF_8)
      .takeWhile(_ != '\u0000')

  /** Parse the container structure; None unless the payload leads with a
    * well-formed EBML header element. */
  def probe(payload: Array[Byte]): Option[Info] = {
    if (payload == null || payload.length < 8) return None
    var docType = ""
    var tsScale = 1000000L // EBML default: 1 ms
    var durScaled = Double.NaN
    val tracks = Vector.newBuilder[Track]
    var sawHeader = false
    walk(payload, 0, payload.length) { (id, s, e) =>
      id match {
        case EbmlHeader =>
          sawHeader = true
          walk(payload, s, e) { (id2, s2, e2) =>
            if (id2 == DocType) docType = str(payload, s2, e2)
          }
        case Segment => walk(payload, s, e) { (id2, s2, e2) =>
          id2 match {
            case SegInfo => walk(payload, s2, e2) { (id3, s3, e3) =>
              id3 match {
                case TimestampScale => tsScale = uint(payload, s3, e3)
                case Duration => durScaled = float(payload, s3, e3)
                case _ =>
              }
            }
            case Tracks => walk(payload, s2, e2) { (id3, s3, e3) =>
              if (id3 == TrackEntry) tracks += parseTrack(payload, s3, e3)
            }
            case _ =>
          }
        }
        case _ =>
      }
    }
    if (!sawHeader || docType.isEmpty) None
    else {
      val durMs =
        if (durScaled.isNaN || tsScale <= 0) -1L
        else math.round(durScaled * tsScale / 1e6)
      Some(Info(docType, durMs, tracks.result(), payload.length.toLong))
    }
  }

  private def parseTrack(b: Array[Byte], from: Int, to: Int): Track = {
    var tt = 0; var codec = ""
    var w = 0; var h = 0; var chans = 0; var rate = 0
    walk(b, from, to) { (id, s, e) =>
      id match {
        case TrackType => tt = uint(b, s, e).toInt
        case CodecID => codec = str(b, s, e)
        case VideoEl => walk(b, s, e) { (id2, s2, e2) =>
          id2 match {
            case PixelWidth => w = uint(b, s2, e2).toInt
            case PixelHeight => h = uint(b, s2, e2).toInt
            case _ =>
          }
        }
        case AudioEl => walk(b, s, e) { (id2, s2, e2) =>
          id2 match {
            case SamplingFrequency => rate = math.round(float(b, s2, e2)).toInt
            case Channels => chans = uint(b, s2, e2).toInt
            case _ =>
          }
        }
        case _ =>
      }
    }
    Track(tt, codec, w, h, chans, rate)
  }
}
