package graft.pipeline

import java.io.ByteArrayOutputStream

/** Hand-rolled MP4 (ISO/IEC 14496-12 ISO-BMFF) container walk — the
  * VIDEO metadata tier of the multimodal columns, completing the
  * image/audio/video triple of the training-data-pipeline surface
  * (beyond the reference's own operators, like the rest of
  * graft.pipeline).
  *
  * Honesty contract, stated up front: the JDK ships NO MP4 muxer or
  * video codec, so — unlike the image (javax.imageio) and audio
  * (javax.sound) tiers, whose parsers are exercised against genuine
  * JDK codec output — the planted video corpus comes from
  * [[encodeMp4]], a minimal spec-conformant box writer in this file.
  * What keeps the pairing honest rather than a byte-mirror: the parser
  * is a GENERIC recursive box walk (any box order, 32- and 64-bit
  * sizes, unknown boxes skipped by declared length, fullbox versions
  * 0 and 1) while the writer emits one fixed layout; specs drive the
  * parser through layouts the writer never produces (moov after mdat,
  * largesize boxes, corrupt/truncated/overrun payloads). FRAME DECODE
  * is deliberately out of scope — the honest tier is metadata + codec
  * identification ([[Mp4Meta]]), which is also the pass that touches
  * only header bytes at 100 TB.
  */
object VideoCodec {

  /** Typed metadata of one MP4 payload: movie-header timescale and
    * duration (in timescale ticks), track count, the video track's
    * coded dimensions (tkhd 16.16 fixed point, integer part) and
    * sample-entry fourcc, and the audio track's fourcc ("" = none).
    */
  final case class Mp4Meta(timescale: Long, durationTs: Long, nTracks: Int,
      width: Int, height: Int, videoCodec: String, audioCodec: String)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Long =
    (((b(i).toLong & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** One box in a container: (type, payloadStart, payloadEnd). */
  private final case class Box(tpe: String, start: Int, end: Int)

  /** Walk the box list in b[from, to): size(4 BE) type(4), size == 1 →
    * 64-bit largesize follows, size == 0 → box extends to `to`.
    * Returns None on any malformed size (under the header, overrunning
    * the range) — corrupt payloads filter, they don't throw.
    */
  private def boxes(b: Array[Byte], from: Int, to: Int): Option[Seq[Box]] = {
    val out = Seq.newBuilder[Box]
    var i = from
    while (i < to) {
      if (i + 8 > to) return None
      val size32 = be32(b, i)
      val tpe = fourcc(b, i + 4)
      val (payload, end) =
        if (size32 == 0L) (i + 8, to.toLong)
        else if (size32 == 1L) {
          if (i + 16 > to) return None
          (i + 16, i + be64(b, i + 8))
        } else (i + 8, i + size32)
      if (end > to || end < payload) return None
      out += Box(tpe, payload, end.toInt)
      i = end.toInt
    }
    Some(out.result())
  }

  private def find(bs: Seq[Box], tpe: String): Option[Box] =
    bs.find(_.tpe == tpe)

  /** Header-only metadata parse: generic box walk for moov → mvhd +
    * per-trak hdlr/tkhd/stsd. Returns None for truncated, non-MP4
    * (no ftyp first), size-corrupt, or video-track-less payloads.
    */
  def parseMp4Header(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 16) return None
    for {
      top <- boxes(b, 0, b.length)
      _ <- top.headOption.filter(_.tpe == "ftyp")
      moov <- find(top, "moov")
      inMoov <- boxes(b, moov.start, moov.end)
      mvhd <- find(inMoov, "mvhd")
      (timescale, duration) <- mvhdFields(b, mvhd)
      traks = inMoov.filter(_.tpe == "trak")
      // one box walk per trak; vids/auds both project from it
      metas = traks.flatMap(trackMeta(b, _))
      vids = metas.collect { case ("vide", w, h, c) => (w, h, c) }
      auds = metas.collect { case ("soun", _, _, c) => c }
      v <- vids.headOption
    } yield Mp4Meta(timescale, duration, traks.length, v._1, v._2, v._3,
      auds.headOption.getOrElse(""))
  }

  /** mvhd fullbox: version 0 = 32-bit ctime/mtime/timescale/duration,
    * version 1 = 64-bit ctime/mtime/duration around a 32-bit timescale. */
  private def mvhdFields(b: Array[Byte], box: Box): Option[(Long, Long)] = {
    val i = box.start
    if (i + 4 > box.end) return None
    b(i) match {
      case 0 if i + 20 <= box.end => Some((be32(b, i + 12), be32(b, i + 16)))
      case 1 if i + 32 <= box.end => Some((be32(b, i + 20), be64(b, i + 24)))
      case _ => None
    }
  }

  /** (handler, width, height, sampleEntryFourcc) of one trak. */
  private def trackMeta(b: Array[Byte],
      trak: Box): Option[(String, Int, Int, String)] =
    for {
      inTrak <- boxes(b, trak.start, trak.end)
      mdia <- find(inTrak, "mdia")
      inMdia <- boxes(b, mdia.start, mdia.end)
      hdlr <- find(inMdia, "hdlr")
      if hdlr.start + 12 <= hdlr.end
      handler = fourcc(b, hdlr.start + 8)
      minf <- find(inMdia, "minf")
      inMinf <- boxes(b, minf.start, minf.end)
      stbl <- find(inMinf, "stbl")
      inStbl <- boxes(b, stbl.start, stbl.end)
      stsd <- find(inStbl, "stsd")
      if stsd.start + 16 <= stsd.end && be32(b, stsd.start + 4) >= 1L
      codec = fourcc(b, stsd.start + 12)
      dims = find(inTrak, "tkhd").flatMap(tkhdDims(b, _))
        .getOrElse((0, 0))
    } yield (handler, dims._1, dims._2, codec)

  /** tkhd width/height: the LAST 8 payload bytes, 16.16 fixed point —
    * offset-from-end reads both fullbox versions without caring which. */
  private def tkhdDims(b: Array[Byte], box: Box): Option[(Int, Int)] =
    if (box.end - box.start < 8) None
    else Some((be32(b, box.end - 8).toInt >>> 16,
      be32(b, box.end - 4).toInt >>> 16))

  // ---- writer (the planted corpus; one fixed layout) ----

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val out = new ByteArrayOutputStream(len)
    out.write(w32(len.toLong)); out.write(tpe.getBytes("US-ASCII"))
    payload.foreach(out.write)
    out.toByteArray
  }
  private def w16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def w32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fix1616(v: Int): Array[Byte] = w32(v.toLong << 16)

  private def hdlrBox(handler: String): Array[Byte] =
    box("hdlr", w32(0), w32(0), handler.getBytes("US-ASCII"),
      new Array[Byte](12), Array[Byte](0))

  private def trakBox(handler: String, trackId: Int, durationTs: Long,
      width: Int, height: Int, codec: String): Array[Byte] = {
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), w32(0), w32(0),
      w32(trackId.toLong), w32(0), w32(durationTs), new Array[Byte](8),
      w16(0), w16(0), w16(if (handler == "soun") 0x0100 else 0), w16(0),
      // identity 3x3 matrix in 16.16 / 2.30
      w32(0x00010000L), w32(0), w32(0), w32(0), w32(0x00010000L), w32(0),
      w32(0), w32(0), w32(0x40000000L),
      fix1616(width), fix1616(height))
    val sampleEntry = box(codec, new Array[Byte](6), w16(1),
      new Array[Byte](16), w16(width), w16(height), new Array[Byte](46))
    val stsd = box("stsd", w32(0), w32(1), sampleEntry)
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdhd = box("mdhd", w32(0), w32(0), w32(0), w32(1000), w32(durationTs),
      w16(0x55c4), w16(0))
    val mdia = box("mdia", mdhd, hdlrBox(handler), minf)
    box("trak", tkhd, mdia)
  }

  /** Minimal spec-conformant MP4: ftyp + moov(mvhd, video trak,
    * optional audio trak) + an empty mdat. Deterministic in its
    * arguments — the planted-corpus encoder.
    */
  def encodeMp4(timescale: Long, durationTs: Long, width: Int, height: Int,
      videoCodec: String, audioCodec: String = ""): Array[Byte] = {
    require(videoCodec.length == 4 &&
      (audioCodec.isEmpty || audioCodec.length == 4), "fourcc codes")
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), w32(512),
      "isomiso2mp41".getBytes("US-ASCII"))
    val mvhd = box("mvhd", w32(0), w32(0), w32(0), w32(timescale),
      w32(durationTs), w32(0x00010000L), w16(0x0100), w16(0),
      new Array[Byte](8),
      w32(0x00010000L), w32(0), w32(0), w32(0), w32(0x00010000L), w32(0),
      w32(0), w32(0), w32(0x40000000L),
      new Array[Byte](24), w32(3))
    val traks = Seq(trakBox("vide", 1, durationTs, width, height, videoCodec)) ++
      (if (audioCodec.nonEmpty)
        Seq(trakBox("soun", 2, durationTs, 0, 0, audioCodec)) else Nil)
    val moov = box("moov", (mvhd +: traks): _*)
    val mdat = box("mdat")
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }
}
