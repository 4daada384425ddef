package graft.ops

/** Deterministic in-memory media payload builders with KNOWN metadata —
  * the planted-truth side of the `mm_meta_oracle` driver row.
  *
  * The byte-walk decoders in [[Multimodal]] (MP4 `tkhd`/`stsz` box
  * walk, MP3 frame-header walk, WAV via javax.sound, PNG via ImageIO)
  * are pure functions of payload bytes, so a payload CONSTRUCTED with
  * chosen parameters gives oracle-expressible expected values: DuckDB
  * never decodes a byte, it just states what the builder planted
  * (dimensions, sample rate, channel count, frame count), and the
  * engine's decode must recover exactly that. This moves the decoder
  * logic from spec-only coverage to the per-round driver correctness
  * gate.
  *
  * Every builder is seed-free and uses fixed byte layouts (no
  * timestamps, no RNG), so the same slot produces identical bytes in
  * every JVM — the [[Multimodal.exifFixture]] contract.
  */
object MediaFixtures {

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** Minimal ISO-BMFF container the [[Multimodal.Mp4MetaDecoder]] walk
    * reads: `ftyp` + `moov(trak(tkhd + mdia(minf(stbl(stsz)))))`.
    * `tkhd` carries `w`×`h` in 16.16 fixed point (version 0 layout, or
    * version 1 with the widened 64-bit time fields when `v1`), `stsz`
    * carries the sample count. No `mdat` — the metadata walk never
    * touches sample data. */
  def mp4(w: Int, h: Int, frames: Int, v1: Boolean = false): Array[Byte] = {
    val tkhdPayload = new Array[Byte](if (v1) 96 else 84)
    if (v1) tkhdPayload(0) = 1
    val whOff = if (v1) 88 else 76
    System.arraycopy(be32(w.toLong << 16), 0, tkhdPayload, whOff, 4)
    System.arraycopy(be32(h.toLong << 16), 0, tkhdPayload, whOff + 4, 4)
    // stsz: version/flags, uniform sample size (0 = per-sample), count
    val stszPayload = be32(0) ++ be32(0) ++ be32(frames.toLong)
    val stbl = box("stbl", box("stsz", stszPayload))
    val trak = box("trak",
      box("tkhd", tkhdPayload) ++ box("mdia", box("minf", stbl)))
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ box("moov", trak)
  }

  /** MPEG Layer III frame stream the [[Multimodal.Mp3MetaDecoder]]
    * header walk reads: `frames` consecutive frames at 128 kbps/44.1 kHz
    * stereo (MPEG1) or 80 kbps/22.05 kHz mono (MPEG2 when `!mpeg1`),
    * optionally behind an ID3v2 tag (syncsafe length) and in front of
    * trailing junk — both of which a real file carries and the walker
    * must tolerate. Frame bodies are a fixed repeating byte pattern. */
  def mp3(frames: Int, mpeg1: Boolean = true, id3: Boolean = false,
      trailingJunk: Boolean = false): Array[Byte] = {
    val (h2, h3, h4, frameLen) =
      if (mpeg1) (0xfb, 0x90, 0x00, 144 * 128000 / 44100) // brIdx 9=128k, sr 44100, stereo
      else (0xf3, 0x90, 0xc0, 72 * 80000 / 22050)         // brIdx 9=80k, sr 22050, mono
    val frame = new Array[Byte](frameLen)
    frame(0) = 0xff.toByte
    frame(1) = h2.toByte
    frame(2) = h3.toByte
    frame(3) = h4.toByte
    var i = 4
    while (i < frameLen) { frame(i) = (i % 251).toByte; i += 1 }
    val id3Tag =
      if (!id3) Array.empty[Byte]
      else "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 0, 0, 17) ++
        Array.fill[Byte](17)('x')
    val tail =
      if (!trailingJunk) Array.empty[Byte]
      else ("TAG" + "junk after the last full frame").getBytes("US-ASCII")
    id3Tag ++ Array.fill(frames)(frame).flatten ++ tail
  }

  /** PCM WAV: 16-bit signed mono at `rate` Hz, `n` samples of a fixed
    * deterministic ramp. javax.sound reads back rate/channels/frames. */
  def wav(rate: Int, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = ((i * 523) % 30000).toShort // deterministic, no RNG
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** JPEG of `w`×`h` with a deterministic two-tone pattern (the MJPEG
    * sample payload). */
  def jpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) 0xcc2020 else 0x2020cc)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** MJPEG ISO-BMFF container: every sample is a complete ImageIO
    * JPEG of the given dims, addressed by REAL sample tables — `stsd`
    * (format `jpeg`), per-sample `stsz`, one-chunk `stco` (absolute
    * file offset into `mdat`), one-entry `stsc` — exactly the walk
    * [[Multimodal.Mp4FrameSampler.jpegSampleRanges]] performs. Built
    * in two passes: the `stco` offset depends on the moov length, not
    * on its own value, so pass 1 measures and pass 2 plants the real
    * offset. */
  def mjpegMp4(frameDims: Seq[(Int, Int)]): Array[Byte] = {
    val samples = frameDims.map { case (w, h) => jpeg(w, h) }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    def moov(mdatPayloadOff: Long): Array[Byte] = {
      val stsd = box("stsd", be32(0) ++ be32(1) ++
        be32(16) ++ "jpeg".getBytes("US-ASCII") ++ new Array[Byte](8))
      val stsz = box("stsz", be32(0) ++ be32(0) ++
        be32(samples.length.toLong) ++
        samples.flatMap(s => be32(s.length.toLong)))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
      val stsc = box("stsc", be32(0) ++ be32(1) ++
        be32(1) ++ be32(samples.length.toLong) ++ be32(1))
      box("moov", box("trak", box("mdia", box("minf",
        box("stbl", stsd ++ stsz ++ stco ++ stsc)))))
    }
    val moovLen = moov(0L).length
    val off = ftyp.length.toLong + moovLen + 8 // + mdat header
    ftyp ++ moov(off) ++ box("mdat", samples.flatten.toArray)
  }

  /** AVC (H.264) ISO-BMFF container with REAL random-access structure
    * and planted parameters — the keyframe-index fixture
    * ([[Multimodal.Mp4KeyframeWalk]]): an `avc1` sample entry carrying
    * an `avcC` decoder configuration (profile / level / NAL length
    * prefix), per-sample `stsz`, one-chunk `stco`/`stsc`, and an
    * optional `stss` sync-sample table (absent ⇒ every sample is sync,
    * ISO 14496-12 §8.6.2). Sample payloads are deterministic filler —
    * the walk never decodes a NAL unit (the disclosed inter-frame
    * boundary); the SEEK ARITHMETIC is what is real and oracle-stated.
    * Two passes for the `stco` offset, like [[mjpegMp4]].
    *
    * Disclosed: no real-encoder interop fixture is possible in this
    * container (zero egress, no codec libs ship with the JDK), so the
    * box layout follows the published spec rather than captured
    * encoder output. */
  def avcMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      profile: Int, level: Int, nalLen: Int): Array[Byte] = {
    require(Seq(1, 2, 4).contains(nalLen), s"illegal NAL length $nalLen")
    val avcC = box("avcC", Array(
      1, profile, 0, level, 0xfc | (nalLen - 1), 0xe0, 0).map(_.toByte))
    videoMp4(sizes, syncSamples, "avc1", avcC)
  }

  /** HEVC (H.265) sibling of [[avcMp4]]: an `hvc1` sample entry
    * carrying an `hvcC` decoder configuration (ISO 14496-15 §8.3.3.1)
    * — general_profile_idc in byte 1 (profile_space 0, tier 0),
    * general_level_idc in byte 12, lengthSizeMinusOne in the low two
    * bits of byte 21, numOfArrays 0. Reserved-bit patterns follow the
    * spec ('1111'/'111111' runs). Same seek-arithmetic contract. */
  def hevcMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      profile: Int, level: Int, nalLen: Int): Array[Byte] = {
    require(Seq(1, 2, 4).contains(nalLen), s"illegal NAL length $nalLen")
    val hvcC = box("hvcC", (Array(
      1,                 // configurationVersion
      profile & 0x1f,    // profile_space 0 | tier 0 | profile_idc
      0, 0, 0, 0,        // general_profile_compatibility_flags
      0, 0, 0, 0, 0, 0,  // general_constraint_indicator_flags
      level,             // general_level_idc
      0xf0, 0,           // '1111' + min_spatial_segmentation_idc
      0xfc,              // '111111' + parallelismType
      0xfd,              // '111111' + chromaFormat 4:2:0
      0xf8, 0xf8,        // bit depths (luma/chroma minus 8 = 0)
      0, 0,              // avgFrameRate
      // constantFrameRate 0 | numTemporalLayers 1 | temporalIdNested 1
      0x0c | (nalLen - 1),
      0).map(_.toByte)))  // numOfArrays
    videoMp4(sizes, syncSamples, "hvc1", hvcC)
  }

  private def videoMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      fmt: String, cfg: Array[Byte]): Array[Byte] = {
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    def moov(mdatPayloadOff: Long): Array[Byte] = {
      val entry = be32(8L + 78 + cfg.length) ++
        fmt.getBytes("US-ASCII") ++ new Array[Byte](78) ++ cfg
      val stsd = box("stsd", be32(0) ++ be32(1) ++ entry)
      val stsz = box("stsz", be32(0) ++ be32(0) ++
        be32(sizes.length.toLong) ++
        sizes.toArray.flatMap(s => be32(s.toLong)))
      val stco = box("stco", be32(0) ++ be32(1) ++ be32(mdatPayloadOff))
      val stsc = box("stsc", be32(0) ++ be32(1) ++
        be32(1) ++ be32(sizes.length.toLong) ++ be32(1))
      val stss = syncSamples.map(ss => box("stss",
          be32(0) ++ be32(ss.length.toLong) ++
            ss.toArray.flatMap(s => be32(s.toLong))))
        .getOrElse(Array.empty[Byte])
      box("moov", box("trak", box("mdia", box("minf",
        box("stbl", stsd ++ stsz ++ stco ++ stsc ++ stss)))))
    }
    val off = ftyp.length.toLong + moov(0L).length + 8 // + mdat header
    val mdat = new Array[Byte](sizes.sum)
    var j = 0
    while (j < mdat.length) { mdat(j) = (j % 251).toByte; j += 1 }
    ftyp ++ moov(off) ++ box("mdat", mdat)
  }

  /** The 8-slot planted AVC/HEVC table assigned by `doc_id % 8` in
    * `mm_keyframes`: slot m carries m % 4 + 3 samples of size
    * 100 + 17·m + 23·k, sync samples every m % 3 + 2 starting at 1
    * (slot 7 OMITS `stss` — the every-sample-is-sync spec rule),
    * profile/level/NAL from slot arithmetic. Slots 2 and 6 are HEVC
    * (`hvc1`/`hvcC`: Main and Main 10 profiles, level 90 + m) — their
    * stsd entry is 16 bytes longer than the AVC ones (hvcC 31 vs avcC
    * 15), which the oracle's base-offset arithmetic states. All
    * sample numbers, offsets and sizes are pure doc_id arithmetic:
    * the oracle states them without reading a byte (the
    * [[plantedTar]] contract). */
  def plantedAvcMp4(m: Int): Array[Byte] = {
    val n = m % 4 + 3
    val sizes = (0 until n).map(k => 100 + 17 * m + 23 * k)
    val syncs = if (m == 7) None else Some((1 to n by (m % 3 + 2)).toSeq)
    if (m == 2 || m == 6)
      hevcMp4(sizes, syncs, profile = if (m == 2) 1 else 2,
        level = 90 + m, nalLen = Seq(1, 2, 4)(m % 3))
    else
      avcMp4(sizes, syncs, profile = Seq(66, 77, 100)(m % 3),
        level = 30 + m, nalLen = Seq(1, 2, 4)(m % 3))
  }

  /** Pure-tone PCM WAV (16-bit mono): `n` samples of a `freq` Hz sine
    * at `rate` Hz — the planted input whose FFT octave-band argmax is
    * known by construction (a Hann-windowed pure tone concentrates its
    * energy within ±2 bins of `freq·fftSize/rate`, so choosing bins
    * mid-band pins the top band exactly). */
  def sineWav(freq: Double, rate: Int, n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 30000).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Animated GIF89a with chosen per-frame dims, per-frame delays
    * (centiseconds) and an optional NETSCAPE loop count — the
    * construction parameters ARE the truth the byte-walk
    * ([[Multimodal.GifAnim]]) must recover. Pixel data is a
    * structurally-valid but content-arbitrary LZW sub-block (the walk
    * never decodes pixels — same contract as the MP3/MP4 fixtures).
    * `loop` = None omits the application extension; Some(0) is the
    * spec's "loop forever". */
  def animatedGif(screenW: Int, screenH: Int, frames: Seq[(Int, Int)],
      delaysCs: Seq[Int], loop: Option[Int]): Array[Byte] = {
    require(frames.size == delaysCs.size, "one delay per frame")
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16le(screenW); u16le(screenH)
    u8(0x80)          // global color table present, 2 entries
    u8(0); u8(0)      // bg index, aspect
    out.write(Array[Byte](0, 0, 0, -1, -1, -1))  // 2-color GCT
    loop.foreach { n =>
      u8(0x21); u8(0xff); u8(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      u8(3); u8(1); u16le(n); u8(0)
    }
    frames.zip(delaysCs).foreach { case ((w, h), d) =>
      u8(0x21); u8(0xf9); u8(4)
      u8(0)             // packed (no disposal, no transparency)
      u16le(d); u8(0); u8(0)
      u8(0x2c)          // image descriptor
      u16le(0); u16le(0); u16le(w); u16le(h)
      u8(0)             // no local color table
      u8(2)             // LZW min code size
      u8(3); u8(0x44); u8(0x8f); u8(0x05)  // one 3-byte data sub-block
      u8(0)             // sub-block terminator
    }
    u8(0x3b)
    out.toByteArray
  }

  /** PNG of `w`×`h` with a deterministic two-tone pattern. */
  def png(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if ((x + y) % 2 == 0) 0x204080 else 0xc0a060)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 9×8 grayscale PNG whose [[Multimodal.dhashOf]] is EXACTLY `bits`:
    * the image is built at the hash's native sampling size (no
    * resample), each row's luminance walking ±10 per column so
    * comparison x of row y is (lum(x) > lum(x+1)) == bit(y*8+x). A
    * constructible inverse of the perceptual hash — lets a query
    * plant images with CHOSEN pairwise hamming distances, making
    * near-dup pair sets oracle-expressible. */
  def dhashPatternPng(bits: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var lum = 128
      img.setRGB(0, y, lum * 0x010101)
      var x = 0
      while (x < 8) {
        lum += (if (((bits >>> (y * 8 + x)) & 1L) == 1L) -10 else 10)
        img.setRGB(x + 1, y, lum * 0x010101)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** One planted fixture: the payload plus the metadata the decoder
    * MUST recover (construction parameters, not decoder outputs). */
  final case class Planted(slot: Long, mime: String, width: Int,
      height: Int, nFrames: Int, decoder: String, payload: Array[Byte])

  /** POSIX ustar archive from (name, payload) members — the WebDataset
    * shard container (multimodal training corpora ship as .tar shards
    * of grouped sample files). Fixed header fields (mode/uid/gid/mtime
    * all zero-octal, no timestamps, no RNG) keep the bytes identical
    * in every JVM; the checksum is the POSIX sum-with-spaces rule.
    * Two 512-zero trailer blocks terminate the archive. */
  def tar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, payload) =>
      out.write(tarHeader(name, payload.length.toLong))
      out.write(payload)
      val pad = (512 - payload.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** One checksum-valid ustar header claiming `size` bytes — split out
    * of [[tar]] so the TarWalk overflow spec can plant headers whose
    * CLAIMED sizes walk the position arithmetic near the 2 GiB array
    * limit without materializing matching payloads. */
  def tarHeader(name: String, size: Long): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    require(name.getBytes("US-ASCII").length <= 100, s"name too long: $name")
    put(0, name)
    put(100, "0000644")                       // mode
    put(108, "0000000")                       // uid
    put(116, "0000000")                       // gid
    put(124, f"$size%011o")                   // size, 11-digit octal
    put(136, "00000000000")                   // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = '0'                              // typeflag: regular file
    put(257, "ustar")                         // POSIX magic (NUL-terminated)
    put(263, "00")                            // version
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    h
  }

  /** The 8-slot planted tar table assigned by `doc_id % 8` in
    * `mm_tar_members`: slot m carries m % 3 + 1 members named
    * `f<m>_<k>.txt` of size 37·m + 300·k bytes (payload = 'x' bytes) —
    * slot 0 plants the empty member, the 300·k term drives sizes past
    * one 512 block so the offset walk exercises block rounding. All
    * names, sizes and offsets are pure doc_id arithmetic: the oracle
    * states them without reading a byte. */
  def plantedTar(m: Int): Array[Byte] = {
    val n = m % 3 + 1
    tar((0 until n).map { k =>
      val size = 37 * m + 300 * k
      (s"f${m}_$k.txt", Array.fill[Byte](size)('x'))
    })
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** STORED (method 0) ZIP archive from (name, payload) members — the
    * other standard shard container (ImageNet-style image zips).
    * Fixed version/flag/time fields (all zero — no timestamps, no RNG)
    * keep the bytes identical in every JVM; CRC32s are the standard
    * java.util.zip values. Layout: local headers + data, then the
    * central directory, then the end-of-central-directory record. */
  def zip(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    var n = 0
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      val off = out.size().toLong
      out.write(Array[Byte](0x50, 0x4b, 3, 4))     // local header sig
      out.write(le16(20)); out.write(le16(0))       // version, flags
      out.write(le16(0))                            // method: STORED
      out.write(le16(0)); out.write(le16(0))        // time, date
      out.write(le32(crc.getValue))
      out.write(le32(payload.length.toLong))        // csize
      out.write(le32(payload.length.toLong))        // usize
      out.write(le16(nameB.length)); out.write(le16(0))
      out.write(nameB)
      out.write(payload)
      cd.write(Array[Byte](0x50, 0x4b, 1, 2))       // central dir sig
      cd.write(le16(20)); cd.write(le16(20))        // made-by, needed
      cd.write(le16(0)); cd.write(le16(0))          // flags, method
      cd.write(le16(0)); cd.write(le16(0))          // time, date
      cd.write(le32(crc.getValue))
      cd.write(le32(payload.length.toLong))
      cd.write(le32(payload.length.toLong))
      cd.write(le16(nameB.length)); cd.write(le16(0)); cd.write(le16(0))
      cd.write(le16(0)); cd.write(le16(0))          // disk, int attrs
      cd.write(le32(0L))                            // ext attrs
      cd.write(le32(off))                           // local header offset
      cd.write(nameB)
      n += 1
    }
    val cdOff = out.size().toLong
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    out.write(Array[Byte](0x50, 0x4b, 5, 6))        // EOCD sig
    out.write(le16(0)); out.write(le16(0))          // disk numbers
    out.write(le16(n)); out.write(le16(n))          // entry counts
    out.write(le32(cdBytes.length.toLong))
    out.write(le32(cdOff))
    out.write(le16(0))                              // comment length
    out.toByteArray
  }

  /** The 8-slot planted zip table assigned by `doc_id % 8` in
    * `mm_zip_members`: slot m carries m % 3 + 1 STORED members named
    * `f<m>_<k>.bin` of size 37·m + 300·k bytes — the same arithmetic
    * scheme as [[plantedTar]], so the oracle states names, sizes and
    * local-header offsets (Σ of 30-byte headers + names +
    * payloads) without reading a byte. */
  def plantedZip(m: Int): Array[Byte] = {
    val n = m % 3 + 1
    zip((0 until n).map { k =>
      val size = 37 * m + 300 * k
      (s"f${m}_$k.bin", Array.fill[Byte](size)('x'))
    })
  }

  /** Deterministic gzip envelope (JDK GZIPOutputStream: zero mtime, no
    * FNAME, fixed deflate level) — for the compressed-shard walks. */
  def gzip(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(payload); gz.close()
    out.toByteArray
  }

  /** `.tar.gz` twin of [[plantedTar]] — the actual WebDataset wire
    * format (shards ship compressed); same slot arithmetic, so the
    * SAME oracle states the member rows. */
  def plantedTgz(m: Int): Array[Byte] = gzip(plantedTar(m))

  /** The 12-slot planted table assigned by `doc_id % 12` in
    * `mm_meta_oracle`: PNG dims (slots 0–2), WAV rate/channels/samples
    * (3–5), MP3 rate/channels/frame-count across MPEG1/MPEG2, ID3
    * prefix and trailing junk (6–8), MP4 tkhd dims + stsz counts
    * across v0/v1 tkhd and a zero-sample track (9–11). */
  def planted: Seq[Planted] = Seq(
    Planted(0L, "image/png", 7, 5, 1, "imageio", png(7, 5)),
    Planted(1L, "image/png", 12, 3, 1, "imageio", png(12, 3)),
    Planted(2L, "image/png", 2, 9, 1, "imageio", png(2, 9)),
    Planted(3L, "audio/wav", 8000, 1, 64, "wav", wav(8000, 64)),
    Planted(4L, "audio/wav", 22050, 1, 100, "wav", wav(22050, 100)),
    Planted(5L, "audio/wav", 16000, 1, 33, "wav", wav(16000, 33)),
    Planted(6L, "audio/mpeg", 44100, 2, 5, "mp3-meta",
      mp3(5, mpeg1 = true, id3 = true)),
    Planted(7L, "audio/mpeg", 22050, 1, 3, "mp3-meta",
      mp3(3, mpeg1 = false)),
    Planted(8L, "audio/mpeg", 44100, 2, 1, "mp3-meta",
      mp3(1, mpeg1 = true, trailingJunk = true)),
    Planted(9L, "video/mp4", 320, 240, 10, "mp4-meta", mp4(320, 240, 10)),
    Planted(10L, "video/mp4", 64, 48, 3, "mp4-meta",
      mp4(64, 48, 3, v1 = true)),
    Planted(11L, "video/mp4", 1920, 1080, 0, "mp4-meta",
      mp4(1920, 1080, 0)))
}
