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

  // Same deliberate JVM-global as [[Multimodal]]'s object init (r19,
  // ADVICE r18): every ImageIO-using object sets it, so the in-memory
  // stream cache holds no matter which object's class initializes
  // first on an executor — the setting is deterministic instead of
  // class-init-order dependent. All payloads here are in-memory byte
  // arrays; the default FILE-backed cache serializes parallel
  // encodes/decodes on temp-file churn (measured r18, Multimodal).
  javax.imageio.ImageIO.setUseCache(false)

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
  /** MSB-first bit writer for hand-encoding SPS NALs (r15 verdict
    * #4): `u`/`ue`/`se` mirror the H.264/H.265 descriptors, `nal`
    * closes with the rbsp_stop_one_bit, applies emulation-prevention
    * escaping (00 00 0x≤3 → 00 00 03 0x) and zero-pads to a FIXED
    * total length — trailing_zero_8bits are legal after the stop bit,
    * and the fixed length keeps the mm_keyframes offset oracle's
    * base arithmetic slot-independent. */
  private final class BitWriter {
    private val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def u(n: Int, v: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        if (nbits == 8) { bytes += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def ue(v: Int): this.type = {
      require(v >= 0)
      val code = v + 1
      val z = 31 - Integer.numberOfLeadingZeros(code)
      u(z, 0); u(z + 1, code)
    }
    def se(v: Int): this.type =
      ue(if (v > 0) 2 * v - 1 else -2 * v)
    def nal(header: Array[Byte], fixedLen: Int): Array[Byte] = {
      u(1, 1) // rbsp_stop_one_bit
      if (nbits > 0) { cur <<= (8 - nbits); bytes += cur.toByte
        cur = 0; nbits = 0 }
      val esc = scala.collection.mutable.ArrayBuffer[Byte]()
      var zeros = 0
      bytes.foreach { b =>
        if (zeros >= 2 && (b & 0xff) <= 3) { esc += 3; zeros = 0 }
        esc += b
        zeros = if (b == 0) zeros + 1 else 0
      }
      val out = header ++ esc
      require(out.length <= fixedLen,
        s"SPS ${out.length} exceeds fixed $fixedLen")
      out ++ new Array[Byte](fixedLen - out.length)
    }
  }

  /** Hand-encoded AVC PPS (ISO 14496-10 §7.3.2.2), entropy_coding
    * CAVLC, one slice group; padded to 8 bytes. The AVC slice-header
    * parse never needs it (slice_type precedes pic_parameter_set_id),
    * but a real avcC carries one and the NAL walk must step over
    * it. */
  def avcPps(): Array[Byte] = {
    val w = new BitWriter
    w.ue(0)   // pic_parameter_set_id
    w.ue(0)   // seq_parameter_set_id
    w.u(1, 0) // entropy_coding_mode_flag (CAVLC)
    w.u(1, 0) // bottom_field_pic_order_in_frame_present
    w.ue(0)   // num_slice_groups_minus1
    w.ue(0)   // num_ref_idx_l0_default_active_minus1
    w.ue(0)   // num_ref_idx_l1_default_active_minus1
    w.u(1, 0) // weighted_pred_flag
    w.u(2, 0) // weighted_bipred_idc
    w.se(0); w.se(0); w.se(0) // qp/qs/chroma offsets
    w.u(1, 0) // deblocking_filter_control_present
    w.u(1, 0) // constrained_intra_pred
    w.u(1, 0) // redundant_pic_cnt_present
    w.nal(Array(0x68.toByte), 8) // nal_ref_idc 3, type 8
  }

  /** Hand-encoded HEVC PPS (ISO 23008-2 §7.3.2.3) carrying the TWO
    * fields the slice-segment-header parse genuinely depends on —
    * `dependent_slice_segments_enabled_flag` and
    * `num_extra_slice_header_bits` — padded to 8 bytes. Planting a
    * nonzero `extraBits` (slot 6) proves the frame-type walk reads
    * the PPS rather than assuming the common zero case. */
  def hevcPps(extraBits: Int): Array[Byte] = {
    require(extraBits >= 0 && extraBits <= 7)
    val w = new BitWriter
    w.ue(0)            // pps_pic_parameter_set_id
    w.ue(0)            // pps_seq_parameter_set_id
    w.u(1, 0)          // dependent_slice_segments_enabled_flag
    w.u(1, 0)          // output_flag_present_flag
    w.u(3, extraBits)  // num_extra_slice_header_bits
    w.u(1, 0)          // sign_data_hiding_enabled_flag
    w.u(1, 0)          // cabac_init_present_flag
    w.ue(0); w.ue(0)   // num_ref_idx_l{0,1}_default_active_minus1
    w.se(0)            // init_qp_minus26
    // nal_unit_header: type 34, layer 0, tid+1 = 1
    w.nal(Array(0x44.toByte, 0x01.toByte), 8)
  }

  /** One slice NAL with a real exp-Golomb slice header. AVC
    * (ISO 14496-10 §7.3.3): first_mb_in_slice, slice_type,
    * pic_parameter_set_id, frame_num — the walk reads through
    * slice_type. `idr` picks NAL type 5 vs 1. `sliceType` is the RAW
    * planted value (the +5 "all slices in picture" variants exercise
    * the %5 mapping). Padded to `fixedLen`. */
  def avcSliceNal(idr: Boolean, sliceType: Int, fixedLen: Int): Array[Byte] = {
    val w = new BitWriter
    w.ue(0)         // first_mb_in_slice
    w.ue(sliceType)
    w.ue(0)         // pic_parameter_set_id
    w.u(4, 0)       // frame_num (log2_max_frame_num_minus4 = 0 → 4 bits)
    val hdr = if (idr) 0x65 else 0x41 // ref_idc 3/2, type 5/1
    w.nal(Array(hdr.toByte), fixedLen)
  }

  /** One HEVC slice-segment NAL (ISO 23008-2 §7.3.6.1):
    * first_slice_segment_in_pic_flag = 1, the IRAP-only
    * no_output_of_prior_pics_flag, slice_pic_parameter_set_id, the
    * PPS-declared extra bits, then slice_type. */
  def hevcSliceNal(nalType: Int, sliceType: Int, extraBits: Int,
      fixedLen: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(1, 1)                          // first_slice_segment_in_pic_flag
    if (nalType >= 16 && nalType <= 23)
      w.u(1, 0)                        // no_output_of_prior_pics_flag
    w.ue(0)                            // slice_pic_parameter_set_id
    w.u(math.max(extraBits, 0), 0)     // slice_reserved_flag[i]
    w.ue(sliceType)
    w.nal(Array(((nalType << 1) & 0x7e).toByte, 0x01.toByte), fixedLen)
  }

  /** One complete sample of EXACTLY `totalSize` bytes: each NAL
    * behind a `nalLen`-byte big-endian length prefix, then filler
    * NALs (AVC type 12 / HEVC FD_NUT 38, ff-bytes per spec) chunked
    * to the prefix's maximum until the size is met — the multi-NAL
    * access-unit layout of a real sample. */
  def nalSample(totalSize: Int, nalLen: Int, hevc: Boolean,
      nals: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(totalSize)
    def prefix(n: Int): Unit = {
      var i = nalLen - 1
      while (i >= 0) { out.write((n >> (8 * i)) & 0xff); i -= 1 }
    }
    nals.foreach { n => prefix(n.length); out.write(n) }
    val maxBody = if (nalLen >= 4) Int.MaxValue - 8
      else (1 << (8 * nalLen)) - 1
    val hdrLen = if (hevc) 2 else 1
    var r = totalSize - out.size()
    require(r >= 0, s"NALs ${out.size()} exceed sample $totalSize")
    while (r > 0) {
      require(r >= nalLen + hdrLen, s"unfillable remainder $r")
      var body = math.min(maxBody, r - nalLen)
      val rem2 = r - nalLen - body
      if (rem2 > 0 && rem2 < nalLen + hdrLen)
        body -= (nalLen + hdrLen - rem2)
      prefix(body)
      if (hevc) { out.write((38 << 1) & 0x7e); out.write(1) }
      else out.write(0x0c)
      var i = hdrLen
      while (i < body) { out.write(0xff); i += 1 }
      r = totalSize - out.size()
    }
    out.toByteArray
  }

  /** Hand-encoded AVC SPS (ISO 14496-10 §7.3.2.1.1): 4:2:0, poc type
    * 0, frame_mbs_only, optional right/bottom crop; padded to 24
    * bytes. The construction parameters ARE the planted truth the
    * bitstream parse ([[Multimodal.SpsParse.parseAvc]]) must
    * recover. */
  def avcSps(profile: Int, level: Int, widthMbs: Int, heightMbs: Int,
      cropRight: Int, cropBottom: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(8, profile).u(8, 0).u(8, level)
    w.ue(0) // seq_parameter_set_id
    if (profile == 100) {
      w.ue(1)      // chroma_format_idc 4:2:0
      w.ue(0).ue(0) // bit depths
      w.u(1, 0)    // transform bypass
      w.u(1, 0)    // no scaling matrix
    }
    w.ue(0)   // log2_max_frame_num_minus4
    w.ue(0)   // pic_order_cnt_type 0
    w.ue(0)   // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)   // max_num_ref_frames
    w.u(1, 0) // gaps_in_frame_num_value_allowed
    w.ue(widthMbs - 1)
    w.ue(heightMbs - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8_inference
    if (cropRight > 0 || cropBottom > 0) {
      w.u(1, 1)
      w.ue(0); w.ue(cropRight); w.ue(0); w.ue(cropBottom)
    } else w.u(1, 0)
    w.u(1, 0) // vui_parameters_present
    w.nal(Array(0x67.toByte), 24) // nal_ref_idc 3, type 7
  }

  /** Hand-encoded HEVC SPS (ISO 23008-2 §7.3.2.2): 4:2:0, optional
    * conformance window, `maxSub` exercising the sub-layer reserved
    * skip; padded to 32 bytes. */
  def hevcSps(profile: Int, level: Int, w0: Int, h0: Int,
      confWin: Option[(Int, Int, Int, Int)], maxSub: Int): Array[Byte] = {
    val w = new BitWriter
    w.u(4, 0)      // sps_video_parameter_set_id
    w.u(3, maxSub) // sps_max_sub_layers_minus1
    w.u(1, 1)      // sps_temporal_id_nesting_flag
    // profile_tier_level, general block
    w.u(2, 0).u(1, 0).u(5, profile)
    w.u(32, 0)               // compatibility flags
    w.u(24, 0).u(24, 0)      // 48 constraint bits
    w.u(8, level)
    if (maxSub > 0) {
      var i = 0
      while (i < maxSub) { w.u(1, 0); w.u(1, 0); i += 1 } // present flags
      var j = maxSub
      while (j < 8) { w.u(2, 0); j += 1 } // reserved_zero_2bits
    }
    w.ue(0) // sps_seq_parameter_set_id
    w.ue(1) // chroma_format_idc 4:2:0
    w.ue(w0); w.ue(h0)
    confWin match {
      case Some((l, r, t, b)) =>
        w.u(1, 1); w.ue(l); w.ue(r); w.ue(t); w.ue(b)
      case None => w.u(1, 0)
    }
    // nal_unit_header: type 33, layer 0, tid+1 = 1
    w.nal(Array(0x42.toByte, 0x01.toByte), 32)
  }

  def avcMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      profile: Int, level: Int, nalLen: Int,
      widthMbs: Int = 4, heightMbs: Int = 3,
      cropRight: Int = 0, cropBottom: Int = 0,
      containerW: Int = -1, containerH: Int = -1,
      samples: Option[Seq[Array[Byte]]] = None): Array[Byte] = {
    require(Seq(1, 2, 4).contains(nalLen), s"illegal NAL length $nalLen")
    val avcC = avcCBox(profile, level, nalLen, widthMbs, heightMbs,
      cropRight, cropBottom)
    val dispW = 16 * widthMbs - 2 * cropRight
    val dispH = 16 * heightMbs - 2 * cropBottom
    videoMp4(sizes, syncSamples, "avc1", avcC,
      if (containerW >= 0) containerW else dispW,
      if (containerH >= 0) containerH else dispH, samples)
  }

  /** avcC (ISO 14496-15 §5.3.3.1): 5 config bytes, '111' + 1 SPS,
    * 2-byte length + NAL, then 1 PPS the same way (r15 frame-type
    * walk) — fixed 43-byte payload (SPS 24 + PPS 8, both padded). */
  def avcCBox(profile: Int, level: Int, nalLen: Int, widthMbs: Int,
      heightMbs: Int, cropRight: Int, cropBottom: Int): Array[Byte] = {
    val sps = avcSps(profile, level, widthMbs, heightMbs,
      cropRight, cropBottom)
    val pps = avcPps()
    box("avcC", Array(
        1, profile, 0, level, 0xfc | (nalLen - 1), 0xe1).map(_.toByte) ++
      Array(((sps.length >> 8) & 0xff).toByte, (sps.length & 0xff).toByte) ++
      sps ++ Array(1.toByte) ++
      Array(((pps.length >> 8) & 0xff).toByte, (pps.length & 0xff).toByte) ++
      pps)
  }

  /** HEVC (H.265) sibling of [[avcMp4]]: an `hvc1` sample entry
    * carrying an `hvcC` decoder configuration (ISO 14496-15 §8.3.3.1)
    * — general_profile_idc in byte 1 (profile_space 0, tier 0),
    * general_level_idc in byte 12, lengthSizeMinusOne in the low two
    * bits of byte 21, numOfArrays 0. Reserved-bit patterns follow the
    * spec ('1111'/'111111' runs). Same seek-arithmetic contract. */
  def hevcMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      profile: Int, level: Int, nalLen: Int,
      lumaW: Int = 96, lumaH: Int = 64,
      confWin: Option[(Int, Int, Int, Int)] = None, maxSub: Int = 0,
      containerW: Int = -1, containerH: Int = -1,
      samples: Option[Seq[Array[Byte]]] = None,
      ppsExtraBits: Int = 0): Array[Byte] = {
    require(Seq(1, 2, 4).contains(nalLen), s"illegal NAL length $nalLen")
    val hvcC = hvcCBox(profile, level, nalLen, lumaW, lumaH, confWin,
      maxSub, ppsExtraBits)
    val (cl, cr, ct, cb) = confWin.getOrElse((0, 0, 0, 0))
    val dispW = lumaW - 2 * (cl + cr)
    val dispH = lumaH - 2 * (ct + cb)
    videoMp4(sizes, syncSamples, "hvc1", hvcC,
      if (containerW >= 0) containerW else dispW,
      if (containerH >= 0) containerH else dispH, samples)
  }

  /** hvcC (ISO 14496-15 §8.3.3.1) with an SPS and a PPS array —
    * fixed 73-byte payload (SPS 32 + PPS 8, both padded). */
  def hvcCBox(profile: Int, level: Int, nalLen: Int, lumaW: Int,
      lumaH: Int, confWin: Option[(Int, Int, Int, Int)], maxSub: Int,
      ppsExtraBits: Int): Array[Byte] = {
    val sps = hevcSps(profile, level, lumaW, lumaH, confWin, maxSub)
    val pps = hevcPps(ppsExtraBits)
    box("hvcC", (Array(
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
      2,                 // numOfArrays: SPS + PPS (r15 frame-type walk)
      // array_completeness 1 | reserved 0 | NAL_unit_type 33 (SPS)
      0x80 | 33).map(_.toByte) ++
      Array(0.toByte, 1.toByte) ++ // numNalus = 1
      Array(((sps.length >> 8) & 0xff).toByte,
        (sps.length & 0xff).toByte) ++ sps ++
      // array_completeness 1 | NAL_unit_type 34 (PPS), numNalus = 1
      Array((0x80 | 34).toByte, 0.toByte, 1.toByte) ++
      Array(((pps.length >> 8) & 0xff).toByte,
        (pps.length & 0xff).toByte) ++ pps))
  }

  /** One-entry `stsd` with a VisualSampleEntry: width/height at entry
    * offsets 32/34 (= body indices 24/26 past the 8-byte size+format
    * header), decoder config box appended. */
  private def visualStsd(fmt: String, cfg: Array[Byte], containerW: Int,
      containerH: Int): Array[Byte] = {
    val body = new Array[Byte](78)
    body(24) = ((containerW >> 8) & 0xff).toByte
    body(25) = (containerW & 0xff).toByte
    body(26) = ((containerH >> 8) & 0xff).toByte
    body(27) = (containerH & 0xff).toByte
    val entry = be32(8L + 78 + cfg.length) ++
      fmt.getBytes("US-ASCII") ++ body ++ cfg
    box("stsd", be32(0) ++ be32(1) ++ entry)
  }

  private def videoMp4(sizes: Seq[Int], syncSamples: Option[Seq[Int]],
      fmt: String, cfg: Array[Byte], containerW: Int = 0,
      containerH: Int = 0,
      samples: Option[Seq[Array[Byte]]] = None): Array[Byte] = {
    samples.foreach { ss =>
      require(ss.map(_.length) == sizes,
        "sample payload lengths must equal the planted stsz sizes")
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    def moov(mdatPayloadOff: Long): Array[Byte] = {
      val stsd = visualStsd(fmt, cfg, containerW, containerH)
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
    val mdat = samples match {
      case Some(ss) => ss.flatten.toArray
      case None =>
        val a = new Array[Byte](sizes.sum)
        var j = 0
        while (j < a.length) { a(j) = (j % 251).toByte; j += 1 }
        a
    }
    ftyp ++ moov(off) ++ box("mdat", mdat)
  }

  /** The 8-slot planted AVC/HEVC table assigned by `doc_id % 8` in
    * `mm_keyframes`: slot m carries m % 4 + 3 samples of size
    * 100 + 17·m + 23·k, sync samples every m % 3 + 2 starting at 1
    * (slot 7 OMITS `stss` — the every-sample-is-sync spec rule),
    * profile/level/NAL from slot arithmetic. Slots 2 and 6 are HEVC
    * (`hvc1`/`hvcC`: Main and Main 10 profiles, level 90 + m) — their
    * stsd entry is 30 bytes longer than the AVC ones (hvcC 81 vs avcC
    * 51 — both carry fixed-length planted SPS + PPS NALs since r15),
    * which the oracle's base-offset arithmetic states. All
    * sample numbers, offsets and sizes are pure doc_id arithmetic:
    * the oracle states them without reading a byte (the
    * [[plantedTar]] contract). */
  /** Sample-flags constants (ISO 14496-12 §8.8.3.1): bit 16 is
    * `sample_is_non_sync_sample`. */
  private val SyncFlags = 0x02000000L    // depends_on = 2 (I), sync
  private val NonSyncFlags = 0x01010000L // depends_on = 1, non-sync

  /** FRAGMENTED MP4 (fMP4 — the DASH/CMAF wire format): `ftyp` +
    * `moov` carrying only the decode config (`stsd` + zero-sample
    * tables + `mvex > trex` defaults), then one `moof` + `mdat` pair
    * per fragment. Three tfhd/trun layouts exercise the §8.8.7 field
    * precedence the walk must honor:
    *   - 'A': explicit `base_data_offset` in tfhd; per-sample size +
    *     flags in the trun entries;
    *   - 'B': `default-base-is-moof`; uniform size + non-sync flags
    *     as tfhd DEFAULTS, `first_sample_flags` marking the fragment
    *     head sync;
    *   - 'C': tfhd carries nothing but the track id — size and flags
    *     fall through to the `trex` defaults, head sync again via
    *     `first_sample_flags`.
    * `frags(f)(k)` = (sample payload bytes, claimed-sync). For 'B'
    * and 'C' the claimed pattern must be head-of-fragment (that is
    * all those layouts can express); 'A' is free. Two passes per
    * fragment for the length-dependent offset fields, like
    * [[mjpegMp4]]. */
  def fragmentedMp4(fmt: String, cfg: Array[Byte], w: Int, h: Int,
      layout: Char,
      frags: Seq[Seq[(Array[Byte], Boolean)]]): Array[Byte] = {
    require("ABC".contains(layout), s"unknown layout $layout")
    val uniform = frags.flatten.map(_._1.length).distinct
    if (layout != 'A')
      require(uniform.size == 1 && frags.forall(_.zipWithIndex.forall {
        case ((_, sync), k) => sync == (k == 0)
      }), s"layout $layout needs uniform sizes and head-of-fragment sync")
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val stbl = box("stbl", visualStsd(fmt, cfg, w, h) ++
      box("stsz", be32(0) ++ be32(0) ++ be32(0)) ++
      box("stco", be32(0) ++ be32(0)) ++
      box("stsc", be32(0) ++ be32(0)))
    val trex = box("trex", be32(0) ++ be32(1) ++ be32(1) ++ be32(0) ++
      be32(if (layout == 'C') uniform.head.toLong else 0L) ++
      be32(NonSyncFlags))
    val moov = box("moov",
      box("trak", box("mdia", box("minf", stbl))) ++ box("mvex", trex))
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    frags.zipWithIndex.foreach { case (samples, f0) =>
      val moofStart = out.size().toLong
      def moof(dataOff: Long): Array[Byte] = {
        val mfhd = box("mfhd", be32(0) ++ be32(f0 + 1L))
        val tfhd = layout match {
          case 'A' => box("tfhd", be32(0x000001) ++ be32(1) ++
            be32(moofStart >> 32) ++ be32(moofStart & 0xffffffffL))
          case 'B' => box("tfhd", be32(0x020030) ++ be32(1) ++
            be32(uniform.head.toLong) ++ be32(NonSyncFlags))
          case _ => box("tfhd", be32(0x020000) ++ be32(1))
        }
        val trun = layout match {
          case 'A' => box("trun",
            be32(0x000601) ++ be32(samples.size.toLong) ++ be32(dataOff) ++
              samples.toArray.flatMap { case (p, sync) =>
                be32(p.length.toLong) ++
                  be32(if (sync) SyncFlags else NonSyncFlags)
              })
          case _ => box("trun",
            be32(0x000005) ++ be32(samples.size.toLong) ++ be32(dataOff) ++
              be32(SyncFlags))
        }
        box("moof", mfhd ++ box("traf", tfhd ++ trun))
      }
      val moofLen = moof(0L).length
      out.write(moof(moofLen + 8L))
      out.write(box("mdat", samples.toArray.flatMap(_._1)))
    }
    out.toByteArray
  }

  /** The planted frame rule for FRAGMENTED slot m, fragment f
    * (1-based), sample sl (1-based in fragment), global sample gs —
    * shared truth between [[plantedFragMp4]] and the `mm_fragments`
    * oracle: the fragment head is the RAP (the CMAF shape), except
    * slot 5 fragment 2 (head claims sync, bitstream is P — the
    * planted lie) and slot 3's second sample (an unclaimed IDR);
    * non-I samples are B when gs % 3 == 0, else P. */
  def plantedFragFrameType(m: Int, f: Int, sl: Int, gs: Int): Char =
    if ((sl == 1 && !(m == 5 && f == 2)) || (m == 3 && f == 1 && sl == 2))
      'I'
    else if (gs % 3 == 0) 'B' else 'P'

  /** The 8-slot planted fMP4 table assigned by `doc_id % 8` in
    * `mm_fragments`: slot m carries m % 3 + 1 fragments, fragment f
    * has (m + f) % 3 + 1 samples; layout 'A' on odd slots (explicit
    * base_data_offset + per-sample trun sizes 60 + 9m + 7(sl−1)),
    * 'C' on slot 4 (trex defaults), 'B' on the other even slots
    * (tfhd defaults) — the last two uniform at 60 + 9m. Codec,
    * NAL-prefix size and PPS extra bits follow [[plantedAvcMp4]]'s
    * slot arithmetic (slots 2/6 HEVC, extra_bits = 2 on slot 6). All
    * offsets are closed-form: moof_len = 76 + 8n ('A') / 80 ('B') /
    * 72 ('C'), and the oracle states every sample's byte range as
    * doc_id arithmetic without reading a byte. */
  def plantedFragMp4(m: Int): Array[Byte] = {
    val hevc = m == 2 || m == 6
    val nalLen = Seq(1, 2, 4)(m % 3)
    val layout = if (m % 2 == 1) 'A' else if (m == 4) 'C' else 'B'
    val nFrags = m % 3 + 1
    var gs = 0
    val frags = (1 to nFrags).map { f =>
      val n = (m + f) % 3 + 1
      (1 to n).map { sl =>
        gs += 1
        val size =
          if (layout == 'A') 60 + 9 * m + 7 * (sl - 1) else 60 + 9 * m
        val ft = plantedFragFrameType(m, f, sl, gs)
        val slice =
          if (hevc) {
            val nalType =
              if (ft == 'I') (if (m == 2) 19 else 21)
              else if (ft == 'B') 0 else 1
            val st = if (ft == 'I') 2 else if (ft == 'P') 1 else 0
            hevcSliceNal(nalType, st, if (m == 6) 2 else 0, 16)
          } else {
            val base = if (ft == 'I') 2 else if (ft == 'B') 1 else 0
            avcSliceNal(ft == 'I', base + 5 * (gs % 2), 16)
          }
        (nalSample(size, nalLen, hevc, Seq(slice)), sl == 1)
      }
    }
    val cfg =
      if (hevc) hvcCBox(profile = if (m == 2) 1 else 2, level = 90 + m,
        nalLen = nalLen, lumaW = 64 + 8 * m, lumaH = 48 + 8 * (m % 3),
        confWin = if (m == 6) Some((1, 1, 0, 1)) else None,
        maxSub = if (m == 6) 1 else 0,
        ppsExtraBits = if (m == 6) 2 else 0)
      else avcCBox(profile = Seq(66, 77, 100)(m % 3), level = 30 + m,
        nalLen = nalLen, widthMbs = m % 4 + 2, heightMbs = m % 3 + 2,
        cropRight = m % 2, cropBottom = m % 3)
    fragmentedMp4(if (hevc) "hvc1" else "avc1", cfg,
      w = 64, h = 48, layout, frags)
  }

  /** SEGMENT-TIMELINE fMP4 (r16, verdict #5): the DASH/CMAF timing
    * boxes a segment ingest audits — a top-level `sidx` (ISO 14496-12
    * §8.16.3: timescale, earliest_presentation_time, one
    * (referenced_size, subsegment_duration) pair per fragment), a
    * `tfdt` per traf (§8.8.12 baseMediaDecodeTime), and per-sample
    * durations riding the same §8.8.7 defaults ladder as sizes/flags:
    * layout 'A' = per-sample trun durations, 'B' = tfhd
    * default_sample_duration, 'C' = the `trex` default. The written
    * `tfdts`/`sidxDurs`/`sidxSizes` are CALLER-supplied so a planted
    * slot can lie about any of the three axes; mdat payloads are
    * 10-byte filler (the timeline walk never reads sample bytes).
    * Two passes like [[fragmentedMp4]] for the sidx referenced_size
    * fields.
    *
    * Closed-form fragment byte lengths (the oracle states them as
    * doc_id arithmetic): 'A' 88 + 14n, 'B' 92 + 10n, 'C' 88 + 10n. */
  def timelineMp4(timescale: Long, ept: Long, layout: Char,
      sampleDur: Long, frags: Seq[Int], tfdts: Seq[Long],
      sidxDurs: Seq[Long],
      sidxSizes: Option[Seq[Long]] = None): Array[Byte] = {
    require("ABC".contains(layout), s"unknown layout $layout")
    require(frags.size == tfdts.size && frags.size == sidxDurs.size)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val trex = box("trex", be32(0) ++ be32(1) ++ be32(1) ++
      be32(if (layout == 'C') sampleDur else 0L) ++ be32(0) ++
      be32(0x01010000L))
    val moov = box("moov", box("mvex", trex))
    def fragBytes(f: Int): Array[Byte] = {
      val n = frags(f)
      val mfhd = box("mfhd", be32(0) ++ be32(f + 1L))
      val tfhd = layout match {
        case 'B' => box("tfhd", be32(0x020008) ++ be32(1) ++ be32(sampleDur))
        case _ => box("tfhd", be32(0x020000) ++ be32(1))
      }
      val tfdt = box("tfdt", be32(0) ++ be32(tfdts(f)))
      val trun = layout match {
        case 'A' => box("trun", be32(0x000100) ++ be32(n.toLong) ++
          (0 until n).toArray.flatMap(_ => be32(sampleDur)))
        case _ => box("trun", be32(0x000000) ++ be32(n.toLong))
      }
      box("moof", mfhd ++ box("traf", tfhd ++ tfdt ++ trun)) ++
        box("mdat", new Array[Byte](10 * n))
    }
    val fragLens = frags.indices.map(f => fragBytes(f).length.toLong)
    val refSizes = sidxSizes.getOrElse(fragLens)
    val sidx = box("sidx", be32(0) ++ be32(1) ++ be32(timescale) ++
      be32(ept) ++ be32(0) ++ be32(frags.size.toLong) ++
      frags.indices.toArray.flatMap { f =>
        be32(refSizes(f)) ++ be32(sidxDurs(f)) ++ be32(0x90000000L)
      })
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(sidx)
    frags.indices.foreach(f => out.write(fragBytes(f)))
    out.toByteArray
  }

  /** The 8-slot planted segment-timeline table assigned by
    * `doc_id % 8` in `mm_timeline`: slot m carries m % 3 + 2
    * fragments, fragment f (1-based) has (m + f) % 3 + 1 samples of
    * uniform duration 40 + m at timescale 1000 + 100m, earliest
    * presentation time 100m; duration layout 'A' on odd slots, 'B'
    * on slots 0/2, 'C' (trex default) on slots 4/6. Three planted
    * lies, one per audit axis:
    *   - slot 3, fragment 2 (its last): tfdt written 7 ticks late —
    *     the decode-time gap `tfdt_consistent` catches;
    *   - slot 5, fragment 1: sidx subsegment_duration overstated by
    *     5 ticks — `sidx_dur_consistent`;
    *   - slot 6, fragment 2: sidx referenced_size overstated by 3
    *     bytes — `sidx_size_consistent`.
    * Everything else is exact; the oracle restates every field as
    * doc_id arithmetic (the [[plantedFragMp4]] contract). */
  def plantedTimelineMp4(m: Int): Array[Byte] = {
    val nFrags = m % 3 + 2
    val d = 40L + m
    val counts = (1 to nFrags).map(f => (m + f) % 3 + 1)
    val layout = if (m % 2 == 1) 'A' else if (m == 4 || m == 6) 'C' else 'B'
    val ept = 100L * m
    val tfdts = (0 until nFrags).map { f0 =>
      ept + counts.take(f0).map(_ * d).sum +
        (if (m == 3 && f0 == 1) 7L else 0L)
    }
    val sidxDurs = (0 until nFrags).map { f0 =>
      counts(f0) * d + (if (m == 5 && f0 == 0) 5L else 0L)
    }
    val base = timelineMp4(1000L + 100 * m, ept, layout, d, counts,
      tfdts, sidxDurs)
    if (m != 6) base
    else {
      // recompute with the size lie on fragment 2 (closed form: the
      // truthful sizes are what timelineMp4 derives internally)
      val lens = counts.map(n => (layout match {
        case 'A' => 88 + 14 * n
        case 'B' => 92 + 10 * n
        case _ => 88 + 10 * n
      }).toLong)
      val lied = lens.zipWithIndex.map { case (l, f0) =>
        l + (if (f0 == 1) 3L else 0L) }
      timelineMp4(1000L + 100 * m, ept, layout, d, counts, tfdts,
        sidxDurs, sidxSizes = Some(lied))
    }
  }

  /** HIERARCHICAL (two-level) segment-timeline fMP4 (r18, verdict
    * #3): a ROOT `sidx` whose references are all type 1 (top bit set)
    * — each pointing at a CHILD sidx box that in turn indexes that
    * group's media fragments with type-0 references — in the
    * daisy-chain layout every hierarchical muxer writes:
    * `ftyp moov sidx(root) [sidx(child g) moof mdat ...]*`. This is
    * the multi-period DASH shape the flat [[timelineMp4]] cannot
    * express. Fragment machinery (layout ladder 'A'/'B'/'C', closed-
    * form lengths) matches [[timelineMp4]] exactly; `groups(g)` is
    * the per-child list of per-fragment sample counts; `tfdts` is
    * flat across all fragments in file order; mfhd sequence numbers
    * are global (1-based, file order).
    *
    * Lie injection, one knob per audit axis:
    *   - `childDurLie`/`childSizeLie`: delta added to the CHILD's
    *     (subsegment_duration, referenced_size) claim for a given
    *     (group, fragment-in-group) — surfaces on the leaf axes
    *     (`sidx_dur/size_consistent`);
    *   - `parentDurLie`/`parentSizeLie`: delta added to the ROOT's
    *     type-1 claim for a group — surfaces on the tree axes
    *     (`tree_dur/size_consistent`) for every fragment of that
    *     group.
    * Truthful parent claims are derived from the child's CLAIMS (not
    * ground truth), per §8.16.3 — a child-level lie with an honest
    * parent keeps the tree axes green while the leaf axis flags.
    * Child sidx g carries its truthful earliest_presentation_time
    * (root ept + the true durations of all prior groups). */
  def timelineTreeMp4(timescale: Long, ept: Long, layout: Char,
      sampleDur: Long, groups: Seq[Seq[Int]], tfdts: Seq[Long],
      childDurLie: Map[(Int, Int), Long] = Map.empty,
      childSizeLie: Map[(Int, Int), Long] = Map.empty,
      parentDurLie: Map[Int, Long] = Map.empty,
      parentSizeLie: Map[Int, Long] = Map.empty,
      childEptLie: Map[Int, Long] = Map.empty): Array[Byte] = {
    require("ABC".contains(layout), s"unknown layout $layout")
    require(groups.map(_.size).sum == tfdts.size)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val trex = box("trex", be32(0) ++ be32(1) ++ be32(1) ++
      be32(if (layout == 'C') sampleDur else 0L) ++ be32(0) ++
      be32(0x01010000L))
    val moov = box("moov", box("mvex", trex))
    val fragLen = (n: Int) => (layout match {
      case 'A' => 88 + 14 * n
      case 'B' => 92 + 10 * n
      case _ => 88 + 10 * n
    }).toLong
    def fragBytes(seq: Long, n: Int, tfdtV: Long): Array[Byte] = {
      val mfhd = box("mfhd", be32(0) ++ be32(seq))
      val tfhd = layout match {
        case 'B' => box("tfhd", be32(0x020008) ++ be32(1) ++ be32(sampleDur))
        case _ => box("tfhd", be32(0x020000) ++ be32(1))
      }
      val tfdt = box("tfdt", be32(0) ++ be32(tfdtV))
      val trun = layout match {
        case 'A' => box("trun", be32(0x000100) ++ be32(n.toLong) ++
          (0 until n).toArray.flatMap(_ => be32(sampleDur)))
        case _ => box("trun", be32(0x000000) ++ be32(n.toLong))
      }
      box("moof", mfhd ++ box("traf", tfhd ++ tfdt ++ trun)) ++
        box("mdat", new Array[Byte](10 * n))
    }
    def sidxBox(ept0: Long, refs: Seq[(Boolean, Long, Long)]) =
      box("sidx", be32(0) ++ be32(1) ++ be32(timescale) ++ be32(ept0) ++
        be32(0) ++ be32(refs.size.toLong) ++
        refs.toArray.flatMap { case (child, size, dur) =>
          be32((if (child) 0x80000000L else 0L) | size) ++ be32(dur) ++
            be32(0x90000000L)
        })
    // per-group child claims (lies applied), then the root's type-1
    // claims derived from the child CLAIMS (plus any parent lie)
    val childClaims = groups.zipWithIndex.map { case (counts, g) =>
      counts.zipWithIndex.map { case (n, f) =>
        (fragLen(n) + childSizeLie.getOrElse((g, f), 0L),
          n * sampleDur + childDurLie.getOrElse((g, f), 0L))
      }
    }
    // child sidx box length: 8 header + 24 fixed + 12 per ref
    val childBoxLen = (nRefs: Int) => 32L + 12 * nRefs
    val rootRefs = childClaims.zipWithIndex.map { case (claims, g) =>
      (true,
        childBoxLen(claims.size) + claims.map(_._1).sum +
          parentSizeLie.getOrElse(g, 0L),
        claims.map(_._2).sum + parentDurLie.getOrElse(g, 0L))
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(sidxBox(ept, rootRefs))
    var seq = 1L
    var fi = 0
    var trueTime = ept
    groups.zipWithIndex.foreach { case (counts, g) =>
      out.write(sidxBox(trueTime + childEptLie.getOrElse(g, 0L),
        childClaims(g).map { case (s, d) => (false, s, d) }))
      counts.foreach { n =>
        out.write(fragBytes(seq, n, tfdts(fi)))
        seq += 1; fi += 1; trueTime += n * sampleDur
      }
    }
    out.toByteArray
  }

  /** The 8-slot planted HIERARCHICAL-timeline table assigned by
    * `doc_id % 8` in `mm_timeline_tree`: slot m carries m % 2 + 2
    * child groups; group g (1-based) holds (m + g) % 2 + 1 fragments;
    * fragment f (1-based in group) has (m + g + f) % 3 + 1 samples of
    * uniform duration 40 + m at timescale 1000 + 100m, root earliest
    * presentation time 100m, duration layout 'A'/'B'/'C' by m % 3,
    * truthful tfdts throughout, global 1-based sequence numbers.
    * Four planted lies, one per remaining audit axis (tfdt lies are
    * mm_timeline's job):
    *   - slot 2, group 1, fragment 1: CHILD subsegment_duration
    *     overstated by 4 — `sidx_dur_consistent` (the child-level lie
    *     behind a consistent parent);
    *   - slot 7, group 2, fragment 1: CHILD referenced_size
    *     overstated by 2 — `sidx_size_consistent`;
    *   - slot 4, group 2: ROOT subsegment_duration overstated by 6 —
    *     `tree_dur_consistent` on every fragment of group 2;
    *   - slot 5, group 3 (its last): ROOT referenced_size overstated
    *     by 3 — `tree_size_consistent` on every fragment of group 3;
    *   - slot 6, group 2: CHILD earliest_presentation_time written 4
    *     ticks late — `tree_ept_consistent` on group 2's fragments.
    * Slot 2's child-duration lie ALSO surfaces on `tree_ept` for its
    * group 2: the claimed-duration prefix a seeker sums no longer
    * matches the next child's truthful ept — the propagation the
    * column exists to catch. Everything else is exact; the oracle
    * restates every field as doc_id arithmetic (the
    * [[plantedTimelineMp4]] contract). */
  def plantedTimelineTreeMp4(m: Int): Array[Byte] = {
    val nGroups = m % 2 + 2
    val d = 40L + m
    val layout = Seq('A', 'B', 'C')(m % 3)
    val groups = (1 to nGroups).map { g =>
      (1 to (m + g) % 2 + 1).map(f => (m + g + f) % 3 + 1)
    }
    val ept = 100L * m
    val flat = groups.flatten
    val tfdts = flat.indices.map(i => ept + flat.take(i).map(_ * d).sum)
    timelineTreeMp4(1000L + 100 * m, ept, layout, d, groups, tfdts,
      childDurLie = if (m == 2) Map((0, 0) -> 4L) else Map.empty,
      childSizeLie = if (m == 7) Map((1, 0) -> 2L) else Map.empty,
      parentDurLie = if (m == 4) Map(1 -> 6L) else Map.empty,
      parentSizeLie = if (m == 5) Map(2 -> 3L) else Map.empty,
      childEptLie = if (m == 6) Map(1 -> 4L) else Map.empty)
  }

  /** MUXED MULTI-TRACK fragmented MP4 (r18): each moof carries one
    * `traf` PER TRACK — video + audio in a single segment stream, the
    * shape [[timelineMp4]]'s single-track walk cannot audit honestly.
    * `tracks(t)` = (track_id, layout, sampleDur): layout 'A' writes
    * per-sample trun durations, 'B' a tfhd default_sample_duration,
    * 'C' leans on that track's own `trex` (mvex carries ONE TREX PER
    * TRACK — per-track defaults resolution is exactly what the
    * multi-track walk must get right). `counts(f)(t)` / `tfdts(f)(t)`
    * are per fragment per track (same order as `tracks`); mfhd
    * sequence numbers are 1-based. Caller-supplied tfdts so a planted
    * slot can lie on ONE track's clock while the other stays
    * truthful. */
  def timelineTracksMp4(tracks: Seq[(Int, Char, Long)],
      counts: Seq[Seq[Int]], tfdts: Seq[Seq[Long]]): Array[Byte] = {
    require(tracks.nonEmpty && counts.size == tfdts.size)
    require(counts.forall(_.size == tracks.size))
    require(tracks.forall(t => "ABC".contains(t._2)))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0))
    val trexes = tracks.toArray.flatMap { case (tid, layout, d) =>
      box("trex", be32(0) ++ be32(tid.toLong) ++ be32(1) ++
        be32(if (layout == 'C') d else 0L) ++ be32(0) ++
        be32(0x01010000L))
    }
    val moov = box("moov", box("mvex", trexes))
    def trafBytes(t: Int, n: Int, tfdtV: Long): Array[Byte] = {
      val (tid, layout, d) = tracks(t)
      val tfhd = layout match {
        case 'B' => box("tfhd", be32(0x020008) ++ be32(tid.toLong) ++
          be32(d))
        case _ => box("tfhd", be32(0x020000) ++ be32(tid.toLong))
      }
      val tfdt = box("tfdt", be32(0) ++ be32(tfdtV))
      val trun = layout match {
        case 'A' => box("trun", be32(0x000100) ++ be32(n.toLong) ++
          (0 until n).toArray.flatMap(_ => be32(d)))
        case _ => box("trun", be32(0x000000) ++ be32(n.toLong))
      }
      box("traf", tfhd ++ tfdt ++ trun)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    counts.indices.foreach { f =>
      val trafs = tracks.indices.toArray.flatMap(t =>
        trafBytes(t, counts(f)(t), tfdts(f)(t)))
      out.write(box("moof",
        box("mfhd", be32(0) ++ be32(f + 1L)) ++ trafs))
      out.write(box("mdat", new Array[Byte](10 * counts(f).sum)))
    }
    out.toByteArray
  }

  /** The 8-slot planted MULTI-TRACK timeline table assigned by
    * `doc_id % 8` in `mm_timeline_tracks`: slot m carries m % 3 + 2
    * fragments, each moof holding a traf for track 1 (layout 'A' —
    * per-sample trun durations, sampleDur 40 + m, decode clock
    * seeded at 50m) and a traf for track 2 (layout 'B' on odd slots,
    * 'C' — the track's OWN trex default — on even slots, sampleDur
    * 30 + m, clock seeded at 70m). Fragment f (1-based) has
    * (m + f) % 3 + 1 samples on track 1 and (m + 2f) % 2 + 1 on
    * track 2; tfdts are per-track cumulative truth except the two
    * planted lies, each on a slot's LAST fragment so the per-track
    * recurrence condemns exactly one row: slot 3, fragment 2,
    * track 2 written 7 ticks late; slot 4, fragment 3, track 1
    * written 5 late. The other track's clock in the same moof stays
    * truthful — the single-track walk's summed-duration audit would
    * flag both. All fields are doc_id arithmetic. */
  def plantedTimelineTracksMp4(m: Int): Array[Byte] = {
    val nFrags = m % 3 + 2
    val dA = 40L + m
    val dB = 30L + m
    val tracks = Seq((1, 'A', dA),
      (2, if (m % 2 == 1) 'B' else 'C', dB))
    val counts = (1 to nFrags).map(f =>
      Seq((m + f) % 3 + 1, (m + 2 * f) % 2 + 1))
    val tfdts = (1 to nFrags).map { f =>
      Seq(
        50L * m + counts.take(f - 1).map(_(0) * dA).sum +
          (if (m == 4 && f == 3) 5L else 0L),
        70L * m + counts.take(f - 1).map(_(1) * dB).sum +
          (if (m == 3 && f == 2) 7L else 0L))
    }
    timelineTracksMp4(tracks, counts, tfdts)
  }

  // ------------------------------------------------- WebM / EBML

  /** Minimal-width EBML size VINT (ISO/IEC? no — the EBML spec, RFC
    * 8794 §4): the marker bit in the first byte encodes the width;
    * values use the minimal width that fits (deterministic). */
  private def ebmlSize(v: Long): Array[Byte] = {
    require(v >= 0, s"ebml size $v")
    var w = 1
    while (w < 8 && v > (1L << (7 * w)) - 2) w += 1
    val out = new Array[Byte](w)
    var x = v | (1L << (7 * w))
    var i = w - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  /** One EBML element: raw ID bytes (IDs keep their marker per RFC
    * 8794) + size VINT + payload. */
  private def ebml(id: Array[Byte], payload: Array[Byte]): Array[Byte] =
    id ++ ebmlSize(payload.length.toLong) ++ payload

  private def ebmlUint(id: Array[Byte], v: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && v >= (1L << (8 * w))) w += 1
    val p = new Array[Byte](w)
    var x = v
    var i = w - 1
    while (i >= 0) { p(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    ebml(id, p)
  }

  private def idb(bs: Int*): Array[Byte] = bs.map(_.toByte).toArray

  /** A VP9-style frame payload whose FIRST BYTE carries the
    * uncompressed-header prefix (VP9 bitstream spec §6.2): frame
    * marker 0b10, profile 0, show_existing 0, then the frame_type
    * bit (0 = KEY) and show_frame 1 — 0x82 for a key frame, 0x86
    * for an inter frame — followed by deterministic filler. */
  def vp9Frame(key: Boolean, size: Int): Array[Byte] = {
    require(size >= 1)
    val out = new Array[Byte](size)
    out(0) = (if (key) 0x82 else 0x86).toByte
    var i = 1
    while (i < size) { out(i) = (i * 31 + size).toByte; i += 1 }
    out
  }

  /** WebM (Matroska subset, RFC 8794 EBML framing): `EBML(DocType)` +
    * `Segment(Info(TimestampScale), Tracks(TrackEntry(TrackNumber,
    * TrackType, CodecID, Video(PixelWidth, PixelHeight))),
    * Cluster(Timestamp, SimpleBlock*)*)`. Each SimpleBlock payload is
    * track VINT + s16 relative timestamp + flags byte (0x80 =
    * keyframe claim) + the frame bytes. `clusters(c)` =
    * (clusterTimestamp, blocks); each block = (relTs, claimedKey,
    * frameBytes).
    *
    * With `grouped = true` every block is emitted as a
    * `BlockGroup(Block, ReferenceBlock?)` instead of a SimpleBlock:
    * the keyframe claim becomes the ABSENCE of a ReferenceBlock
    * sibling (the Matroska Block semantics — Block carries no
    * keyframe flag), which is how real muxers write non-VP8/VP9
    * streams and B-frame content.
    *
    * With `unknownSize = true` the Segment and every Cluster carry
    * the all-ones unknown-size marker (r17 — the STREAMING-MUXED
    * shape: a live muxer writes the element header before it knows
    * the final size; RFC 8794 §6.2), and every Cluster additionally
    * carries the EBML GLOBAL elements a real live muxer emits (r17
    * ADVICE): a CRC-32 (0xBF, real IEEE CRC of the following cluster
    * data, little-endian per RFC 8794 §11.3.1) as its FIRST child —
    * ffmpeg's streaming shape — and a trailing Void (0xEC) filler.
    * Identical audit content either way — the walk must audit the
    * two encodings identically, skipping the globals. */
  def webm(docType: String, timescale: Long, track: Int,
      codec: String, pixelW: Int, pixelH: Int,
      clusters: Seq[(Long, Seq[(Int, Boolean, Array[Byte])])],
      grouped: Boolean = false,
      unknownSize: Boolean = false): Array[Byte] = {
    val header = ebml(idb(0x1A, 0x45, 0xDF, 0xA3),
      ebml(idb(0x42, 0x82), docType.getBytes("US-ASCII")))
    val info = ebml(idb(0x15, 0x49, 0xA9, 0x66),
      ebmlUint(idb(0x2A, 0xD7, 0xB1), timescale))
    val video = ebml(idb(0xE0),
      ebmlUint(idb(0xB0), pixelW.toLong) ++
        ebmlUint(idb(0xBA), pixelH.toLong))
    val entry = ebml(idb(0xAE),
      ebmlUint(idb(0xD7), track.toLong) ++
        ebmlUint(idb(0x83), 1L) ++
        ebml(idb(0x86), codec.getBytes("US-ASCII")) ++ video)
    val tracks = ebml(idb(0x16, 0x54, 0xAE, 0x6B), entry)
    val clusterBytes = clusters.map { case (ts, blocks) =>
      val body = ebmlUint(idb(0xE7), ts) ++
        blocks.toArray.flatMap { case (rel, key, frame) =>
          if (!grouped) {
            val blk = ebmlSize(track.toLong) ++ Array(
              ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
              (if (key) 0x80 else 0x00).toByte) ++ frame
            ebml(idb(0xA3), blk)
          } else {
            // Block carries NO keyframe flag (flags byte 0); the
            // claim is the absence of a ReferenceBlock sibling
            val blk = ebmlSize(track.toLong) ++ Array(
              ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
              0x00.toByte) ++ frame
            ebml(idb(0xA0), ebml(idb(0xA1), blk) ++
              (if (key) Array.empty[Byte]
               else ebml(idb(0xFB), Array(0x7f.toByte))))
          }
        }
      if (unknownSize) {
        // the live-muxed globals: CRC-32 first child (IEEE CRC of the
        // cluster data AFTER the CRC element, stored little-endian per
        // RFC 8794 §11.3.1) + a trailing Void filler — the elements a
        // walk that only knows block IDs would misread as the end of
        // an unknown-size Cluster (r17 ADVICE)
        val tail = body ++ ebml(idb(0xEC),
          Array.fill(5 + (ts % 4).toInt)(0x00.toByte))
        val crc = new java.util.zip.CRC32()
        crc.update(tail)
        val v = crc.getValue
        val crcEl = ebml(idb(0xBF), Array(
          (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
          ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte))
        idb(0x1F, 0x43, 0xB6, 0x75) ++ Array(0xFF.toByte) ++ crcEl ++ tail
      } else ebml(idb(0x1F, 0x43, 0xB6, 0x75), body)
    }
    val segBody = info ++ tracks ++ clusterBytes.toArray.flatten
    header ++ (if (unknownSize)
      idb(0x18, 0x53, 0x80, 0x67) ++ Array(0xFF.toByte) ++ segBody
    else ebml(idb(0x18, 0x53, 0x80, 0x67), segBody))
  }

  /** Signed lace-delta VINT (Matroska EBML lacing): delta `d` encodes
    * as the unsigned VINT of `d + (2^(7w−1) − 1)` at the minimal
    * width that fits (and is not the all-ones unknown-size marker). */
  private def ebmlLaceDelta(d: Long): Array[Byte] = {
    var w = 1
    while (w < 8 && (d + ((1L << (7 * w - 1)) - 1) < 0 ||
      d + ((1L << (7 * w - 1)) - 1) > (1L << (7 * w)) - 2)) w += 1
    val v = d + ((1L << (7 * w - 1)) - 1)
    val out = new Array[Byte](w)
    var x = v | (1L << (7 * w))
    var i = w - 1
    while (i >= 0) { out(i) = (x & 0xff).toByte; x >>= 8; i -= 1 }
    out
  }

  /** A LACED WebM file (r17): same container skeleton as [[webm]],
    * but each cluster holds SimpleBlocks whose payload is a lace of
    * several frames. Each block = (relTs, claimedKey, mode, frames)
    * with mode 0 = none (frames must be a single frame), 1 = Xiph
    * (255-continuation size bytes for the first n−1 frames), 2 =
    * fixed-size (frames must all be equal length), 3 = EBML (first
    * size an unsigned VINT, then signed-VINT deltas). The keyframe
    * claim applies to the whole block per the Matroska spec. */
  def webmLaced(docType: String, timescale: Long, track: Int,
      codec: String, pixelW: Int, pixelH: Int,
      clusters: Seq[(Long, Seq[(Int, Boolean, Int, Seq[Array[Byte]])])])
      : Array[Byte] = {
    val header = ebml(idb(0x1A, 0x45, 0xDF, 0xA3),
      ebml(idb(0x42, 0x82), docType.getBytes("US-ASCII")))
    val info = ebml(idb(0x15, 0x49, 0xA9, 0x66),
      ebmlUint(idb(0x2A, 0xD7, 0xB1), timescale))
    val video = ebml(idb(0xE0),
      ebmlUint(idb(0xB0), pixelW.toLong) ++
        ebmlUint(idb(0xBA), pixelH.toLong))
    val entry = ebml(idb(0xAE),
      ebmlUint(idb(0xD7), track.toLong) ++
        ebmlUint(idb(0x83), 1L) ++
        ebml(idb(0x86), codec.getBytes("US-ASCII")) ++ video)
    val tracks = ebml(idb(0x16, 0x54, 0xAE, 0x6B), entry)
    val clusterBytes = clusters.map { case (ts, blocks) =>
      val body = ebmlUint(idb(0xE7), ts) ++
        blocks.toArray.flatMap { case (rel, key, mode, frames) =>
          require(mode >= 0 && mode <= 3, s"lace mode $mode")
          require(mode != 0 || frames.size == 1, "unlaced = one frame")
          require(mode != 2 ||
            frames.map(_.length).distinct.size == 1,
            "fixed lacing needs equal frame sizes")
          val flags = (if (key) 0x80 else 0x00) | (mode << 1)
          val laceTable: Array[Byte] = mode match {
            case 0 => Array.empty
            case 1 => Array((frames.size - 1).toByte) ++
              frames.dropRight(1).toArray.flatMap { f =>
                val q = f.length / 255
                Array.fill(q)(0xff.toByte) :+ (f.length % 255).toByte
              }
            case 2 => Array((frames.size - 1).toByte)
            case _ => Array((frames.size - 1).toByte) ++
              (if (frames.size < 2) Array.empty[Byte]
               else ebmlSize(frames.head.length.toLong) ++
                 frames.sliding(2).toArray.dropRight(1).flatMap { w =>
                   ebmlLaceDelta((w(1).length - w(0).length).toLong)
                 })
          }
          val blk = ebmlSize(track.toLong) ++ Array(
            ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
            flags.toByte) ++ laceTable ++ frames.toArray.flatten
          ebml(idb(0xA3), blk)
        }
      ebml(idb(0x1F, 0x43, 0xB6, 0x75), body)
    }
    header ++ ebml(idb(0x18, 0x53, 0x80, 0x67),
      info ++ tracks ++ clusterBytes.toArray.flatten)
  }

  /** A MULTI-TRACK WebM file (r17): several `TrackEntry`s (num, type,
    * codec, pixelW, pixelH — dims ignored for non-video), clusters of
    * blocks each addressed to a track: (relTs, trackNum, claimedKey,
    * laceMode, frames). Lace modes as in [[webmLaced]]. This is the
    * REAL Matroska shape — a video track of unlaced VP9 SimpleBlocks
    * interleaved with an audio track whose blocks lace
    * near-universally. */
  def webmTracks(docType: String, timescale: Long,
      tracks: Seq[(Int, Long, String, Int, Int)],
      clusters: Seq[(Long, Seq[(Int, Int, Boolean, Int, Seq[Array[Byte]])])])
      : Array[Byte] = {
    val header = ebml(idb(0x1A, 0x45, 0xDF, 0xA3),
      ebml(idb(0x42, 0x82), docType.getBytes("US-ASCII")))
    val info = ebml(idb(0x15, 0x49, 0xA9, 0x66),
      ebmlUint(idb(0x2A, 0xD7, 0xB1), timescale))
    val entries = tracks.toArray.flatMap { case (num, typ, codec, pw, ph) =>
      val video = if (typ == 1L) ebml(idb(0xE0),
        ebmlUint(idb(0xB0), pw.toLong) ++ ebmlUint(idb(0xBA), ph.toLong))
      else Array.empty[Byte]
      ebml(idb(0xAE),
        ebmlUint(idb(0xD7), num.toLong) ++
          ebmlUint(idb(0x83), typ) ++
          ebml(idb(0x86), codec.getBytes("US-ASCII")) ++ video)
    }
    val trackList = ebml(idb(0x16, 0x54, 0xAE, 0x6B), entries)
    val clusterBytes = clusters.map { case (ts, blocks) =>
      val body = ebmlUint(idb(0xE7), ts) ++
        blocks.toArray.flatMap { case (rel, trk, key, mode, frames) =>
          ebml(idb(0xA3), simpleBlockBytes(trk, rel, key, mode, frames))
        }
      ebml(idb(0x1F, 0x43, 0xB6, 0x75), body)
    }
    header ++ ebml(idb(0x18, 0x53, 0x80, 0x67),
      info ++ trackList ++ clusterBytes.toArray.flatten)
  }

  /** SimpleBlock payload bytes: track VINT + s16 relative timestamp +
    * flags (0x80 keyframe claim, bits 0x06 lace mode) + lace table +
    * frames — the shared core of [[webmLaced]]/[[webmTracks]]/
    * [[webmCues]]. */
  private def simpleBlockBytes(trk: Int, rel: Int, key: Boolean,
      mode: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(mode >= 0 && mode <= 3, s"lace mode $mode")
    require(mode != 0 || frames.size == 1, "unlaced = one frame")
    require(mode != 2 || frames.map(_.length).distinct.size == 1,
      "fixed lacing needs equal frame sizes")
    val flags = (if (key) 0x80 else 0x00) | (mode << 1)
    val laceTable: Array[Byte] = mode match {
      case 0 => Array.empty
      case 1 => Array((frames.size - 1).toByte) ++
        frames.dropRight(1).toArray.flatMap { f =>
          val q = f.length / 255
          Array.fill(q)(0xff.toByte) :+ (f.length % 255).toByte
        }
      case 2 => Array((frames.size - 1).toByte)
      case _ => Array((frames.size - 1).toByte) ++
        (if (frames.size < 2) Array.empty[Byte]
         else ebmlSize(frames.head.length.toLong) ++
           frames.sliding(2).toArray.dropRight(1).flatMap { w =>
             ebmlLaceDelta((w(1).length - w(0).length).toLong)
           })
    }
    ebmlSize(trk.toLong) ++ Array(
      ((rel >> 8) & 0xff).toByte, (rel & 0xff).toByte,
      flags.toByte) ++ laceTable ++ frames.toArray.flatten
  }

  /** WebM with a SEEK INDEX (r18, verdict #5): the [[webmTracks]]
    * skeleton plus per-track `DefaultDuration` (0x23E383, ns per
    * frame, omitted when < 0) in the TrackEntry, and a trailing
    * `Cues` (0x1C53BB6B) element — `CuePoint(CueTime,
    * CueTrackPositions(CueTrack, CueClusterPosition))` per entry,
    * CueClusterPosition being the cued Cluster's byte offset from the
    * Segment payload start (the Matroska "Segment Position"), which
    * this builder computes from the real assembled layout. Each cue =
    * (time, track, clusterOrdinal, posDelta) — a non-zero `posDelta`
    * writes a LYING position (the planted seek-table lie the walk
    * must catch). Tracks carry (num, type, codec, pixelW, pixelH,
    * defaultDurationNs). */
  def webmCues(docType: String, timescale: Long,
      tracks: Seq[(Int, Long, String, Int, Int, Long)],
      clusters: Seq[(Long, Seq[(Int, Int, Boolean, Int, Seq[Array[Byte]])])],
      cues: Seq[(Long, Int, Int, Long)]): Array[Byte] = {
    val header = ebml(idb(0x1A, 0x45, 0xDF, 0xA3),
      ebml(idb(0x42, 0x82), docType.getBytes("US-ASCII")))
    val info = ebml(idb(0x15, 0x49, 0xA9, 0x66),
      ebmlUint(idb(0x2A, 0xD7, 0xB1), timescale))
    val entries = tracks.toArray.flatMap {
      case (num, typ, codec, pw, ph, ddNs) =>
        val video = if (typ == 1L) ebml(idb(0xE0),
          ebmlUint(idb(0xB0), pw.toLong) ++ ebmlUint(idb(0xBA), ph.toLong))
        else Array.empty[Byte]
        val dd = if (ddNs >= 0)
          ebmlUint(idb(0x23, 0xE3, 0x83), ddNs) else Array.empty[Byte]
        ebml(idb(0xAE),
          ebmlUint(idb(0xD7), num.toLong) ++
            ebmlUint(idb(0x83), typ) ++
            ebml(idb(0x86), codec.getBytes("US-ASCII")) ++ dd ++ video)
    }
    val trackList = ebml(idb(0x16, 0x54, 0xAE, 0x6B), entries)
    val clusterBytes = clusters.map { case (ts, blocks) =>
      val body = ebmlUint(idb(0xE7), ts) ++
        blocks.toArray.flatMap { case (rel, trk, key, mode, frames) =>
          ebml(idb(0xA3), simpleBlockBytes(trk, rel, key, mode, frames))
        }
      ebml(idb(0x1F, 0x43, 0xB6, 0x75), body)
    }
    // Segment Positions of each cluster: offset from the Segment
    // payload start, over the real assembled layout (info + tracks
    // precede the clusters; Cues trail them — the live-muxer order)
    val clusterOffsets = clusterBytes
      .scanLeft((info.length + trackList.length).toLong)(_ + _.length)
    val cuesEl = ebml(idb(0x1C, 0x53, 0xBB, 0x6B),
      cues.toArray.flatMap { case (time, trk, ord, posDelta) =>
        ebml(idb(0xBB),
          ebmlUint(idb(0xB3), time) ++
            ebml(idb(0xB7),
              ebmlUint(idb(0xF7), trk.toLong) ++
                ebmlUint(idb(0xF1), clusterOffsets(ord) + posDelta)))
      })
    header ++ ebml(idb(0x18, 0x53, 0x80, 0x67),
      info ++ trackList ++ clusterBytes.toArray.flatten ++ cuesEl)
  }

  /** The 8-slot planted SEEK-INDEX WebM table assigned by `doc_id % 8`
    * in `mm_webm_cues`: slot m carries m % 3 + 1 clusters at
    * timestamps 600(c−1) + 10m (1-based c), timescale 1000000 + 125m.
    * Track 1 = V_VP9 video ((320 + 8m) × (180 + 4m)), one unlaced
    * keyframe SimpleBlock per cluster at rel 4, frame size
    * 22 + 3m + 2c; track 2 = A_OPUS audio, one Xiph-laced 2-frame
    * block per cluster at rel 7 (sizes 12 + 2m + 3k) — cues never
    * reference it, it exists so the cue walk runs against the real
    * multi-track shape. One CuePoint per cluster cues track 1 at the
    * video block's absolute time. Track 1 claims DefaultDuration =
    * 600 ticks × timescale ns (the true cluster cadence), absent on
    * slot 7, overstated as 580 ticks on slot 4. Four planted lies:
    *   - slot 1, cue 2: CueClusterPosition +3 bytes (not a cluster
    *     start) — `cluster_found`;
    *   - slot 2, cue 3: CueTime +5 (no block at that time) —
    *     `cue_time_ok`;
    *   - slot 5, cluster 2: the cued video block claims NON-key over
    *     an inter frame — `cue_key_ok` (the cue points at a frame a
    *     seek cannot decode from);
    *   - slot 4: DefaultDuration 580 ticks vs measured 600 —
    *     `default_dur_ok`.
    * Slots with one cluster (m % 3 == 0) measure no cadence (−1,
    * vacuous-true). All fields are doc_id arithmetic. */
  def plantedWebmCues(m: Int): Array[Byte] = {
    val nClusters = m % 3 + 1
    val ts = 1000000L + 125 * m
    val ddNs = if (m == 7) -1L else (if (m == 4) 580L else 600L) * ts
    val clusters = (1 to nClusters).map { c =>
      val key = !(m == 5 && c == 2)
      val video = (4, 1, key, 0, Seq(vp9Frame(key, 22 + 3 * m + 2 * c)))
      val audio = (7, 2, true, 1,
        (1 to 2).map(k => audioFrame(12 + 2 * m + 3 * k)))
      (600L * (c - 1) + 10 * m, Seq(video, audio))
    }
    val cues = (1 to nClusters).map { c =>
      (600L * (c - 1) + 10 * m + 4 +
        (if (m == 2 && c == 3) 5L else 0L), 1, c - 1,
        if (m == 1 && c == 2) 3L else 0L)
    }
    webmCues("webm", ts,
      Seq((1, 1L, "V_VP9", 320 + 8 * m, 180 + 4 * m, ddNs),
        (2, 2L, "A_OPUS", -1, -1, -1L)),
      clusters, cues)
  }

  /** Deterministic opaque audio frame (no bitstream claim to audit —
    * the walk's VP9 check reads vacuous-true for non-VP9 codecs). */
  def audioFrame(size: Int): Array[Byte] = {
    require(size >= 1)
    val out = new Array[Byte](size)
    var i = 0
    while (i < size) { out(i) = ((i * 37 + size * 11) & 0xff).toByte; i += 1 }
    out
  }

  /** The 8-slot planted MULTI-TRACK WebM table assigned by
    * `doc_id % 8` in `mm_webm_tracks`: track 1 = V_VP9 video
    * ((288 + 8m) × (160 + 4m)), track 2 = A_OPUS audio (dims -1).
    * Slot m has m % 2 + 1 clusters; cluster c (1-based, timestamp
    * 400c + 10m) holds one UNLACED video SimpleBlock (rel 9c, size
    * 24 + 4m + c, claimed AND bitstream-key iff c == 1 — except the
    * slot 4 lie: cluster 1 claims key over an inter frame) followed
    * by one XIPH-LACED audio SimpleBlock (rel 9c + 3, claimed always,
    * (m + c) % 3 + 2 frames of sizes 15 + 2m + 3k). All fields are
    * doc_id arithmetic — the oracle states them without reading a
    * byte. */
  def plantedWebmTracks(m: Int): Array[Byte] = {
    val clusters = (1 to m % 2 + 1).map { c =>
      val vKey = if (m == 4 && c == 1) false else c == 1
      val video = (9 * c, 1, c == 1, 0,
        Seq(vp9Frame(vKey, 24 + 4 * m + c)))
      val n = (m + c) % 3 + 2
      val audio = (9 * c + 3, 2, true, 1,
        (1 to n).map(k => audioFrame(15 + 2 * m + 3 * k)))
      (400L * c + 10 * m, Seq(video, audio))
    }
    webmTracks("webm", 1000000L + 250 * m,
      Seq((1, 1L, "V_VP9", 288 + 8 * m, 160 + 4 * m),
        (2, 2L, "A_OPUS", -1, -1)),
      clusters)
  }

  /** The 8-slot planted LACED WebM table assigned by `doc_id % 8` in
    * `mm_webm_laced`: slot m laces with mode m % 4 (0 = none, 1 =
    * Xiph, 2 = fixed-size, 3 = EBML) across m % 2 + 1 clusters;
    * cluster c (1-based, timestamp 500c + 10m) holds ONE SimpleBlock
    * at relative timestamp 9c with (m + c) % 3 + 2 laced frames
    * (a single frame when mode 0). Frame k (1-based) has size
    * 20 + 4m + 3k for Xiph/EBML (uneven — the size tables earn their
    * keep) and 20 + 4m for none/fixed. The block CLAIMS key iff
    * c == 1 and every frame in a c == 1 block is a bitstream key,
    * except two planted lies: slot 3 (EBML) cluster 1 frame 2 is an
    * inter frame under the key claim; slot 1 (Xiph) cluster 2 frame 1
    * is a hidden key. Track 1, codec V_VP9, timescale 1000000 + 500m,
    * dims (256 + 8m) × (144 + 4m), doc type webm. All fields are
    * doc_id arithmetic — the oracle states them without reading a
    * byte. */
  def plantedWebmLaced(m: Int): Array[Byte] = {
    val mode = m % 4
    val clusters = (1 to m % 2 + 1).map { c =>
      val n = if (mode == 0) 1 else (m + c) % 3 + 2
      val frames = (1 to n).map { k =>
        val keyTruth =
          if (m == 3 && c == 1 && k == 2) false
          else if (m == 1 && c == 2 && k == 1) true
          else c == 1
        val size = if (mode == 1 || mode == 3) 20 + 4 * m + 3 * k
          else 20 + 4 * m
        vp9Frame(keyTruth, size)
      }
      (500L * c + 10 * m, Seq((9 * c, c == 1, mode, frames)))
    }
    webmLaced("webm", 1000000L + 500 * m, 1, "V_VP9",
      256 + 8 * m, 144 + 4 * m, clusters)
  }

  /** The 8-slot planted WebM table assigned by `doc_id % 8` in
    * `mm_webm`: slot m carries m % 3 + 1 clusters, cluster c
    * (1-based) at timestamp 1000c + 10m holds (m + c) % 3 + 1
    * SimpleBlocks with relative timestamps 7k and VP9 frame sizes
    * 30 + 5m + 3k (k 1-based in cluster); the cluster head is the
    * keyframe (claimed AND bitstream-key), except the two planted
    * lies: slot 2 cluster 2 block 2 CLAIMS key over an inter frame,
    * slot 5 cluster 1 block 1 claims non-key over a KEY frame (the
    * inverse lie — `key_consistent` surfaces both). Track m % 2 + 1,
    * timescale 1000000 + 1000m, dims (320 + 16m) × (180 + 8m),
    * codec V_VP9, doc type webm. All fields are doc_id arithmetic —
    * the oracle states them without reading a byte. With
    * `unknownSize = true` (`mm_webm_stream`, r17) the SAME truth is
    * emitted with unknown-size Segment/Cluster markers — the
    * streaming-muxed encoding; the oracle is shared because the
    * audit rows must be identical. */
  def plantedWebm(m: Int, unknownSize: Boolean = false): Array[Byte] = {
    val clusters = (1 to m % 3 + 1).map { c =>
      val blocks = (1 to (m + c) % 3 + 1).map { k =>
        val keyTruth =
          if (m == 5 && c == 1 && k == 1) true
          else if (m == 2 && c == 2 && k == 2) false
          else k == 1
        val claimed =
          if (m == 5 && c == 1 && k == 1) false
          else if (m == 2 && c == 2 && k == 2) true
          else k == 1
        (7 * k, claimed, vp9Frame(keyTruth, 30 + 5 * m + 3 * k))
      }
      (1000L * c + 10 * m, blocks)
    }
    webm("webm", 1000000L + 1000 * m, m % 2 + 1, "V_VP9",
      320 + 16 * m, 180 + 8 * m, clusters, unknownSize = unknownSize)
  }

  /** The planted frame-type rule for slot m, sample s (1-based) —
    * shared truth between [[plantedAvcMp4]]'s slice NALs and the
    * `mm_frame_types`/`mm_gop` oracles (which restate it as doc_id
    * arithmetic): a sample is an I/RAP frame iff its `stss` entry
    * claims sync, EXCEPT slot 3 sample 3 (stss claims sync, the
    * bitstream is a P slice — the planted container LIE) and slot 1
    * sample 3 (an unclaimed IDR — the inverse lie); non-I samples
    * are B when s % 3 == 0, else P. */
  def plantedFrameType(m: Int, s: Int): Char = {
    val step = m % 3 + 2
    val claimed = m == 7 || (s - 1) % step == 0
    if ((claimed && !(m == 3 && s == 3)) || (m == 1 && s == 3)) 'I'
    else if (s % 3 == 0) 'B' else 'P'
  }

  def plantedAvcMp4(m: Int): Array[Byte] = {
    val n = m % 4 + 3
    val sizes = (0 until n).map(k => 100 + 17 * m + 23 * k)
    val syncs = if (m == 7) None else Some((1 to n by (m % 3 + 2)).toSeq)
    val hevc = m == 2 || m == 6
    val nalLen = Seq(1, 2, 4)(m % 3)
    // r15 frame-type walk: every sample is a real access unit — an
    // optional SEI (slots 0 and 5 AVC type 6, slot 2 HEVC type 39,
    // skipped by the walk), ONE slice NAL whose exp-Golomb header
    // plants the [[plantedFrameType]] rule, then spec filler NALs
    // (type 12 / FD_NUT) padding to the stsz size — so the keyframe
    // oracle's seek arithmetic is untouched.
    val samples = (1 to n).map { s =>
      val ft = plantedFrameType(m, s)
      val slice =
        if (hevc) {
          val nalType =
            if (ft == 'I') (if (m == 2) 19 else 21) // IDR_W_RADL / CRA
            else if (ft == 'B') 0 else 1            // TRAIL_N / TRAIL_R
          val st = if (ft == 'I') 2 else if (ft == 'P') 1 else 0
          hevcSliceNal(nalType, st, if (m == 6) 2 else 0, 16)
        } else {
          val base = if (ft == 'I') 2 else if (ft == 'B') 1 else 0
          avcSliceNal(ft == 'I', base + 5 * (s % 2), 16)
        }
      val sei =
        if (!hevc && (m == 0 || m == 5))
          Seq(Array(0x06.toByte, 0x01.toByte, 0x01.toByte, 0xff.toByte))
        else if (hevc && m == 2)
          Seq(Array(((39 << 1) & 0x7e).toByte, 0x01.toByte, 0x01.toByte))
        else Seq.empty
      nalSample(sizes(s - 1), nalLen, hevc, sei :+ slice)
    }
    // r15 (verdict #4): every slot's decoder config now carries a
    // real hand-encoded SPS NAL with slot-arithmetic dimensions —
    // the mm_sps oracle states these without reading a byte. Slot 7
    // plants a container-width LIE (disp + 16) so the dims_match
    // mismatch arm is exercised; slot 5 takes the High-profile
    // chroma/scaling branch; slot 6 the HEVC sub-layer skip.
    if (hevc)
      hevcMp4(sizes, syncs, profile = if (m == 2) 1 else 2,
        level = 90 + m, nalLen = nalLen,
        lumaW = 64 + 8 * m, lumaH = 48 + 8 * (m % 3),
        confWin = if (m == 6) Some((1, 1, 0, 1)) else None,
        maxSub = if (m == 6) 1 else 0,
        samples = Some(samples), ppsExtraBits = if (m == 6) 2 else 0)
    else
      avcMp4(sizes, syncs, profile = Seq(66, 77, 100)(m % 3),
        level = 30 + m, nalLen = nalLen,
        widthMbs = m % 4 + 2, heightMbs = m % 3 + 2,
        cropRight = m % 2, cropBottom = m % 3,
        containerW = if (m == 7)
          16 * (m % 4 + 2) - 2 * (m % 2) + 16 else -1,
        samples = Some(samples))
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
  def tarHeader(name: String, size: Long): Array[Byte] =
    tarHeaderTyped(name, size, '0', "")

  /** ustar header with an explicit typeflag and POSIX `prefix` field
    * (r18 — the long-name wire encodings). */
  def tarHeaderTyped(name: String, size: Long, typeflag: Char,
      prefix: String): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII")
      System.arraycopy(b, 0, h, off, b.length)
    }
    require(name.getBytes("US-ASCII").length <= 100, s"name too long: $name")
    require(prefix.getBytes("US-ASCII").length <= 155,
      s"prefix too long: $prefix")
    put(0, name)
    put(100, "0000644")                       // mode
    put(108, "0000000")                       // uid
    put(116, "0000000")                       // gid
    put(124, f"$size%011o")                   // size, 11-digit octal
    put(136, "00000000000")                   // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces
    h(156) = typeflag.toByte
    put(257, "ustar")                         // POSIX magic (NUL-terminated)
    put(263, "00")                            // version
    put(345, prefix)                          // POSIX long-path prefix
    val sum = h.foldLeft(0L)((a, b) => a + (b & 0xff))
    put(148, f"$sum%06o")
    h(154) = 0; h(155) = ' '
    h
  }

  /** One pax extended-header record, `len key=value\n` with the
    * self-referential decimal length per POSIX. */
  def paxRecord(key: String, value: String): Array[Byte] = {
    val base = 1 + key.length + 1 + value.getBytes("UTF-8").length + 1
    var digits = (base + 1).toString.length
    var total = base + digits
    while (total.toString.length != digits) {
      digits = total.toString.length
      total = base + digits
    }
    s"$total $key=$value\n".getBytes("UTF-8")
  }

  /** Long-path tar in one of the three wire encodings (r18):
    * 'P' = POSIX ustar `prefix` field (path split at its last '/');
    * 'L' = a GNU `././@LongLink` marker entry carrying the
    * NUL-terminated full name before each member; 'x' = a pax
    * extended header with a `path` record before each member. Under
    * 'L'/'x' the member's own header carries only the (≤100 byte)
    * base name — the walk must take the override. */
  def tarLong(members: Seq[(String, Array[Byte])],
      mode: Char): Array[Byte] = {
    require("PLx".contains(mode), s"mode $mode")
    val out = new java.io.ByteArrayOutputStream()
    def pad(n: Int): Unit = out.write(new Array[Byte]((512 - n % 512) % 512))
    members.foreach { case (name, payload) =>
      val slash = name.lastIndexOf('/')
      val base = name.substring(slash + 1)
      mode match {
        case 'P' =>
          require(slash > 0, s"'P' needs a '/' in $name")
          out.write(tarHeaderTyped(base, payload.length.toLong, '0',
            name.substring(0, slash)))
        case 'L' =>
          val nb = name.getBytes("US-ASCII") :+ 0.toByte
          out.write(tarHeaderTyped("././@LongLink", nb.length.toLong,
            'L', ""))
          out.write(nb); pad(nb.length)
          out.write(tarHeader(base, payload.length.toLong))
        case _ =>
          val rec = paxRecord("path", name)
          out.write(tarHeaderTyped("./PaxHeaders/" + base.take(86),
            rec.length.toLong, 'x', ""))
          out.write(rec); pad(rec.length)
          out.write(tarHeader(base, payload.length.toLong))
      }
      out.write(payload); pad(payload.length)
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  /** The 8-slot planted LONG-NAME tar table assigned by `doc_id % 8`
    * in `mm_tar_longnames`: slot m carries m % 3 + 1 members whose
    * full path is `'d' × (100 + m) + "/f<m>_<k>.bin"` (109 + m chars
    * — past the 100-byte header field by construction) with payload
    * size 37·m + 300·k, written in the wire encoding m % 3 selects
    * (0 = ustar prefix, 1 = GNU 'L' markers, 2 = pax 'x' headers).
    * Marker entries cost exactly 1024 bytes each (512 header + one
    * 512 block — both the NUL-terminated name and the pax record fit
    * one block at these lengths), so offsets stay doc_id arithmetic:
    * the oracle states names, sizes and payload offsets without
    * reading a byte. */
  def plantedTarLong(m: Int): Array[Byte] = {
    val n = m % 3 + 1
    val mode = Seq('P', 'L', 'x')(m % 3)
    tarLong((0 until n).map { k =>
      val size = 37 * m + 300 * k
      (("d" * (100 + m)) + s"/f${m}_$k.bin",
        Array.fill[Byte](size)('x'))
    }, mode)
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

  private def le64(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var x = v
    var i = 0
    while (i < 8) { out(i) = (x & 0xff).toByte; x >>= 8; i += 1 }
    out
  }

  /** ZIP64-format STORED archive (r18): the SAME members and local
    * headers as [[zip]] — local-header offsets are byte-identical, so
    * the [[plantedZip]] oracle states the rows of both encodings —
    * but the central directory masks uncompressed size and
    * local-header offset as 0xFFFFFFFF with the real values in a
    * per-entry ZIP64 extra field (id 0x0001: usize, csize, lhOff),
    * and the tail is ZIP64 EOCD record + locator + a classic EOCD
    * with masked counts/offset. This is how modern writers emit even
    * SMALL archives in zip64 mode (python zipfile force_zip64,
    * non-seeking streamers); any archive > 65535 entries or 4 GiB
    * requires it. */
  def zip64(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val cd = new java.io.ByteArrayOutputStream()
    var n = 0L
    members.foreach { case (name, payload) =>
      val nameB = name.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      val off = out.size().toLong
      out.write(Array[Byte](0x50, 0x4b, 3, 4))      // local header sig
      out.write(le16(20)); out.write(le16(0))        // version, flags
      out.write(le16(0))                             // method: STORED
      out.write(le16(0)); out.write(le16(0))         // time, date
      out.write(le32(crc.getValue))
      out.write(le32(payload.length.toLong))         // csize
      out.write(le32(payload.length.toLong))         // usize
      out.write(le16(nameB.length)); out.write(le16(0))
      out.write(nameB)
      out.write(payload)
      cd.write(Array[Byte](0x50, 0x4b, 1, 2))        // central dir sig
      cd.write(le16(45)); cd.write(le16(45))         // made-by, needed (4.5)
      cd.write(le16(0)); cd.write(le16(0))           // flags, method
      cd.write(le16(0)); cd.write(le16(0))           // time, date
      cd.write(le32(crc.getValue))
      cd.write(le32(0xffffffffL))                    // csize: MASKED
      cd.write(le32(0xffffffffL))                    // usize: MASKED
      cd.write(le16(nameB.length))
      cd.write(le16(4 + 24))                         // extra length
      cd.write(le16(0))                              // comment length
      cd.write(le16(0)); cd.write(le16(0))           // disk, int attrs
      cd.write(le32(0L))                             // ext attrs
      cd.write(le32(0xffffffffL))                    // lhOff: MASKED
      cd.write(nameB)
      cd.write(le16(1)); cd.write(le16(24))          // ZIP64 extra hdr
      cd.write(le64(payload.length.toLong))          // usize
      cd.write(le64(payload.length.toLong))          // csize
      cd.write(le64(off))                            // lhOff
      n += 1
    }
    val cdOff = out.size().toLong
    val cdBytes = cd.toByteArray
    out.write(cdBytes)
    val z64Off = out.size().toLong
    out.write(Array[Byte](0x50, 0x4b, 6, 6))         // ZIP64 EOCD sig
    out.write(le64(44L))                             // record size - 12
    out.write(le16(45)); out.write(le16(45))         // made-by, needed
    out.write(le32(0L)); out.write(le32(0L))         // disk numbers
    out.write(le64(n)); out.write(le64(n))           // entry counts
    out.write(le64(cdBytes.length.toLong))
    out.write(le64(cdOff))
    out.write(Array[Byte](0x50, 0x4b, 6, 7))         // ZIP64 locator sig
    out.write(le32(0L))                              // disk with z64 EOCD
    out.write(le64(z64Off))
    out.write(le32(1L))                              // total disks
    out.write(Array[Byte](0x50, 0x4b, 5, 6))         // classic EOCD sig
    out.write(le16(0)); out.write(le16(0))           // disk numbers
    out.write(le16(0xffff)); out.write(le16(0xffff)) // counts: MASKED
    out.write(le32(0xffffffffL))                     // cd size: MASKED
    out.write(le32(0xffffffffL))                     // cd offset: MASKED
    out.write(le16(0))                               // comment length
    out.toByteArray
  }

  /** ZIP64 twin of [[plantedZip]] — identical members and
    * local-header layout under the ZIP64 encoding, so the SAME
    * oracle states the member rows (`mm_zip64_members`). */
  def plantedZip64(m: Int): Array[Byte] = {
    val n = m % 3 + 1
    zip64((0 until n).map { k =>
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

  /** `.tar.gz` twin of [[plantedTarLong]] (r18) — long-path markers
    * behind the gzip envelope; shares [[plantedTarLong]]'s oracle. */
  def plantedTgzLong(m: Int): Array[Byte] = gzip(plantedTarLong(m))

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
