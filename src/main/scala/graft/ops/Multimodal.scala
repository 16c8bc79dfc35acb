package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, batch feature extraction over partitions.
  *
  * The Spark-side contract — schema, partitioning, batch iteration shape
  * (mapPartitions processes a whole partition per task, mirroring a
  * Pandas-UDF batch), deterministic output — is real and tested, and so
  * is the codec for the formats decodable without external libraries:
  * [[MediaCodec.decodeBmp]] parses real 24bpp BMPs and
  * [[MediaCodec.decodeWav]] real PCM16 WAVs, header-first. Compressed
  * formats (JPEG/H.264) would slot into the same per-type dispatch; the
  * synthetic "video" payloads use the raw byte-stream fallback.
  */
object Multimodal {

  /** Typed media record: opaque payload + metadata, the schema a 100 TB
    * media lake would carry (payload in parquet binary or external blobs). */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** Feature row. `mean_byte` is an exact integer-over-integer division
    * (bit-identical cross-engine); the entropy and thumbnail mean are
    * QUANTIZED to integers (millibits / micro-units) because their raw
    * doubles depend on libm log ulp and summation order — the quantized
    * values are stable to ~1e-12 while the rounding step is 5e-4, so the
    * features became DuckDB-oracle-checkable without losing precision
    * that any downstream consumer could use. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      entropy_mb: Long,
      thumb_mean_micro: Long)

  /** Real pure-JVM codecs for the uncompressed formats that need no
    * external library: 24bpp BMP (images) and 16-bit PCM WAV (audio).
    * Decode reads the FORMAT HEADER for dimensions/rates — it does not
    * trust table metadata — so a corrupt payload fails loudly. Formats
    * that require a codec library (JPEG/PNG/H.264) keep the declared
    * byte-stream fallback for the synthetic "video" type. */
  object MediaCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    /** Encode grayscale pixels (0-255, row-major top-down) as a 24bpp
      * bottom-up BMP with standard 4-byte row padding. */
    def encodeBmp(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
      require(gray.length == width * height, "pixel count != width*height")
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      val dataSize = (rowBytes + pad) * height
      val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
      buf.putInt(40).putInt(width).putInt(height)    // BITMAPINFOHEADER
      buf.putShort(1).putShort(24)                   // planes, bpp
      buf.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = height - 1 // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val g = gray(y * width + x).toByte
          buf.put(g).put(g).put(g)
          x += 1
        }
        var p = 0
        while (p < pad) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      buf.array()
    }

    /** Decode a 24bpp BMP to (width, height, grayscale row-major pixels).
      * Dimensions come from the header, not caller metadata. */
    def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val offset = buf.getInt(10)
      val width = buf.getInt(18)
      val height = buf.getInt(22)
      require(buf.getShort(28) == 24, s"unsupported bpp ${buf.getShort(28)}")
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      val gray = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val rowStart = offset + (height - 1 - y) * (rowBytes + pad)
        var x = 0
        while (x < width) {
          // grayscale: average the 3 channels (equal for our encoder)
          val b = java.lang.Byte.toUnsignedInt(bytes(rowStart + x * 3))
          val g = java.lang.Byte.toUnsignedInt(bytes(rowStart + x * 3 + 1))
          val r = java.lang.Byte.toUnsignedInt(bytes(rowStart + x * 3 + 2))
          gray(y * width + x) = (r + g + b) / 3
          x += 1
        }
        y += 1
      }
      (width, height, gray)
    }

    /** Encode mono 16-bit PCM samples as a standard 44-byte-header WAV. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      buf.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1) // PCM, mono
      buf.putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
      buf.put("data".getBytes).putInt(dataSize)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Decode a PCM16 mono WAV to (sampleRate, samples). */
    def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
      require(bytes.length >= 44 &&
        new String(bytes, 0, 4) == "RIFF" && new String(bytes, 8, 4) == "WAVE",
        "not a WAV")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      require(buf.getShort(20) == 1 && buf.getShort(34) == 16, "not PCM16")
      val sampleRate = buf.getInt(24)
      val dataSize = buf.getInt(40)
      val samples = new Array[Short]((dataSize / 2).min((bytes.length - 44) / 2))
      var i = 0
      while (i < samples.length) { samples(i) = buf.getShort(44 + i * 2); i += 1 }
      (sampleRate, samples)
    }

    // --- PNG (ISO/IEC 15948) — a real CONTAINER format, unlike the
    // flat-header BMP/WAV: signature → length-typed CRC-checked chunk
    // walk → concatenated-IDAT zlib inflate → per-scanline unfilter.
    // 8-bit grayscale (color type 0), all five standard filters, zlib
    // through java.util.zip (in the JDK — no external codec lib).
    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def pngCrc(typ: Array[Byte], data: Array[Byte]): Int = {
      val c = new java.util.zip.CRC32
      c.update(typ); c.update(data)
      c.getValue.toInt
    }

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Encode grayscale pixels (0-255, row-major) as an 8-bit grayscale
      * PNG. Scanline y carries filter type y % 5, so every image taller
      * than 4 rows exercises ALL five standard filters — the decoder's
      * unfilter paths are load-bearing on every payload, not dead code
      * behind an all-None encoder. */
    def encodePng(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
      require(gray.length == width * height, "pixel count != width*height")
      // filtered scanlines: 1 filter byte + width bytes per row
      val raw = new Array[Byte](height * (width + 1))
      var y = 0
      while (y < height) {
        val f = y % 5
        raw(y * (width + 1)) = f.toByte
        var x = 0
        while (x < width) {
          val cur = gray(y * width + x)
          val left = if (x > 0) gray(y * width + x - 1) else 0
          val up = if (y > 0) gray((y - 1) * width + x) else 0
          val ul = if (x > 0 && y > 0) gray((y - 1) * width + x - 1) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(y * (width + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw); defl.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) out.write(tmp, 0, defl.deflate(tmp))
      defl.end()
      val idat = out.toByteArray
      val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
        .putInt(width).putInt(height)
        .put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
        .array()
      def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
        val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
          .putInt(data.length).put(t).put(data).putInt(pngCrc(t, data)).array()
      }
      PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
    }

    /** Decode an 8-bit grayscale PNG to (width, height, pixels).
      * Header-first and fail-loud: bad signature, truncated chunk, CRC
      * mismatch, non-grayscale, short zlib stream or an undefined filter
      * type each reject the payload instead of returning garbage. */
    def decodePng(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length >= 8 + 25 && PngSig.indices.forall(i => bytes(i) == PngSig(i)),
        "not a PNG")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      var pos = 8
      var width = -1
      var height = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        require(pos + 12 <= bytes.length, "truncated chunk header")
        val len = buf.getInt(pos)
        require(len >= 0 && pos + 12 + len <= bytes.length, "truncated chunk data")
        val typ = new String(bytes, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        val crc = buf.getInt(pos + 8 + len)
        require(crc == pngCrc(java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 8), data),
          s"CRC mismatch in $typ chunk")
        typ match {
          case "IHDR" =>
            require(len == 13, "bad IHDR length")
            width = ByteBuffer.wrap(data).getInt(0)
            height = ByteBuffer.wrap(data).getInt(4)
            require(width > 0 && height > 0, "bad dimensions")
            require(data(8) == 8 && data(9) == 0,
              s"unsupported PNG: bit depth ${data(8)}, color type ${data(9)}")
            require(data(10) == 0 && data(11) == 0 && data(12) == 0,
              "unsupported compression/filter/interlace method")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _ => () // ancillary chunks: CRC-checked above, then skipped
        }
        pos += 12 + len
      }
      require(width > 0, "missing IHDR")
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      val raw = new Array[Byte](height * (width + 1))
      var got = 0
      while (got < raw.length && !infl.finished())
        got += infl.inflate(raw, got, raw.length - got)
      infl.end()
      require(got == raw.length, s"short pixel stream: $got of ${raw.length}")
      val px = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val f = java.lang.Byte.toUnsignedInt(raw(y * (width + 1)))
        var x = 0
        while (x < width) {
          val v = java.lang.Byte.toUnsignedInt(raw(y * (width + 1) + 1 + x))
          val left = if (x > 0) px(y * width + x - 1) else 0
          val up = if (y > 0) px((y - 1) * width + x) else 0
          val ul = if (x > 0 && y > 0) px((y - 1) * width + x - 1) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
            case other => throw new IllegalArgumentException(s"undefined filter type $other")
          }
          px(y * width + x) = (v + pred) & 0xff
          x += 1
        }
        y += 1
      }
      (width, height, px)
    }

    /** Byte-stream fallback for formats needing external codec libs
      * (the synthetic "video" payloads): payload bytes as values. */
    def decodeRaw(payload: Array[Byte]): Array[Int] =
      if (payload.isEmpty) Array(0)
      else payload.map(java.lang.Byte.toUnsignedInt)

    /** Average-pool a value array down to t×t (thumbnailing). */
    def resize(pixels: Array[Int], t: Int): Array[Double] = {
      val stride = math.max(pixels.length / (t * t), 1)
      Array.tabulate(t * t) { i =>
        val from = i * stride
        val slice = pixels.slice(from, math.min(from + stride, pixels.length))
        if (slice.isEmpty) 0.0 else slice.sum.toDouble / slice.length
      }
    }
  }

  /** Derive a deterministic synthetic media table from `documents` (the
    * container ships no binary fixtures): images are REAL 24bpp BMPs and
    * audio REAL PCM16 WAVs (encoded from the text bytes), so the decode
    * path exercises actual format parsing; "video" payloads stay raw
    * byte-stream frames (container formats need codec libs). Real
    * pipelines replace this builder with a read of the media lake;
    * everything downstream is unchanged. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val bytes0 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val bytes = if (bytes0.isEmpty) Array[Byte](0) else bytes0
        val w = (nChars % 64 + 8).toInt
        val h = (nChars % 48 + 8).toInt
        val payload = mt match {
          case "image" =>
            val gray = Array.tabulate(w * h)(i =>
              java.lang.Byte.toUnsignedInt(bytes(i % bytes.length)))
            MediaCodec.encodeBmp(w, h, gray)
          case "audio" =>
            val samples = Array.tabulate(w * h)(i =>
              ((java.lang.Byte.toUnsignedInt(bytes(i % bytes.length)) - 128) * 256).toShort)
            MediaCodec.encodeWav(16000, samples)
          case _ => bytes
        }
        MediaRecord(id, mt, w, h, payload)
      }
      .toDF()
  }

  /** Batch feature extraction: one task per partition, iterating records
    * like a Pandas-UDF batch; all logic deterministic. Decode is
    * per-format: BMP/WAV parse their real headers (and would reject a
    * corrupt payload), raw frames fall back to byte values. */
  def extractFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = mediaTable(s, dir).as[MediaRecord]
    ds.mapPartitions { batch =>
      val hist = new Array[Long](256) // reused across the batch, zeroed per record
      batch.map { m =>
        val px: Array[Int] = m.media_type match {
          case "image" =>
            val (_, _, gray) = MediaCodec.decodeBmp(m.payload)
            gray
          case "audio" =>
            val (_, samples) = MediaCodec.decodeWav(m.payload)
            samples.map(v => (v / 256 + 128) & 0xff)
          case _ => MediaCodec.decodeRaw(m.payload)
        }
        val n = px.length.toDouble
        java.util.Arrays.fill(hist, 0L)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += px(i); hist(px(i)) += 1; i += 1 }
        var entropy = 0.0
        i = 0
        while (i < 256) {
          if (hist(i) > 0) { val p = hist(i) / n; entropy -= p * math.log(p) / math.log(2) }
          i += 1
        }
        val thumb = MediaCodec.resize(px, 8)
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
          sum / n, Math.round(entropy * 1000),
          Math.round(thumb.sum / thumb.length * 1e6))
      }
    }.toDF().orderBy(col("media_id"))
  }

  /** Frame sampling for "video" payloads: chunk the payload into
    * frame-sized windows, keep every k-th — pure column algebra. */
  def sampleFrames(s: SparkSession, dir: String): DataFrame = {
    val frameSize = 32
    val every = 4
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"""filter(
             |  CASE WHEN length(payload) >= $frameSize THEN
             |    transform(sequence(0, CAST(length(payload) / $frameSize AS INT) - 1),
             |              i -> struct(i AS idx, substring(payload, i * $frameSize + 1, $frameSize) AS frame))
             |  ELSE array() END,
             |  f -> f.idx % $every = 0)""".stripMargin)).as(Seq("pos", "f")))
      .select(col("media_id"), col("f.idx").cast("long").as("frame_idx"),
        length(col("f.frame")).cast("long").as("frame_bytes"),
        md5(col("f.frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** PNG container roundtrip over the corpus: every document's
    * text-derived grayscale frame is ENCODED as a real 8-bit grayscale
    * PNG (CRC'd chunks, zlib, all five scanline filters in rotation) and
    * DECODED back inside the same task; the row's stats come from the
    * DECODED pixels while the DuckDB oracle recomputes them analytically
    * from `documents.text` — so the hash-match IS the proof that
    * decode ∘ encode is the identity on every payload, and the in-task
    * `require` pins it per-record for a loud local failure. Plan shape:
    * one `mapPartitions` batch pass (the per-type codec dispatch idiom),
    * no shuffle until the final ORDER BY of the id-keyed result. */
  def pngRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .mapPartitions { batch =>
        batch.map { case (id, text, nChars) =>
          val bytes0 = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val bytes = if (bytes0.isEmpty) Array[Byte](0) else bytes0
          val w = (nChars % 64 + 8).toInt
          val h = (nChars % 48 + 8).toInt
          val gray = Array.tabulate(w * h)(i =>
            java.lang.Byte.toUnsignedInt(bytes(i % bytes.length)))
          val png = MediaCodec.encodePng(w, h, gray)
          val (dw, dh, px) = MediaCodec.decodePng(png)
          require(dw == w && dh == h && java.util.Arrays.equals(px, gray),
            s"png roundtrip broke for doc $id")
          var sum = 0L
          var hash = 0L
          px.foreach { v => sum += v; hash = (hash * 31 + v) % DedupOps.HashMod }
          (id, w.toLong, h.toLong, (w * h).toLong, sum, hash)
        }
      }
      .toDF("media_id", "width", "height", "n_px", "px_sum", "px_hash")
      .orderBy(col("media_id"))
  }

  /** Oracle: pixels re-derived straight from the ASCII text (the same
    * tabulate rule as the builder), aggregated to the identical stats —
    * matching px_sum and the order-sensitive px_hash proves the decoded
    * pixel STREAM, not just its histogram. */
  val pngRoundtripSql: String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id, text, CAST(length(text) AS BIGINT) AS len,
       |    CAST(n_chars % 64 + 8 AS BIGINT) AS width,
       |    CAST(n_chars % 48 + 8 AS BIGINT) AS height
       |  FROM documents),
       |px AS (
       |  SELECT media_id, width, height, g.i AS i,
       |    CAST(ascii(substring(text, CAST(g.i % len AS INT) + 1, 1)) AS BIGINT) AS v
       |  FROM dims, UNNEST(generate_series(0, width * height - 1)) AS g(i))
       |SELECT media_id, width, height,
       |  CAST(width * height AS BIGINT) AS n_px,
       |  CAST(sum(v) AS BIGINT) AS px_sum,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list(v ORDER BY i)),
       |                   (a, x) -> (a * 31 + x) % ${DedupOps.HashMod}) AS BIGINT) AS px_hash
       |FROM px GROUP BY 1, 2, 3
       |ORDER BY media_id""".stripMargin

  // ------------------------------------------------------------------
  // Perceptual near-dup over the image lake — dHash (difference hash),
  // the image-dedup workhorse of web-scale training pipelines (LAION
  // et al. dedup re-encoded/resized copies of the same picture that no
  // byte-level hash can catch). Pipeline: decoded grayscale →
  // average-pool to an 8×9 grid → one bit per horizontally adjacent
  // cell pair (left mean > right mean, compared as exact integer
  // cross-products sv·cv' > sv'·cv — no float ulp anywhere) → 62-bit
  // packed signature (bit 63 would overflow a signed BIGINT in either
  // engine; same width as the SimHash family) → 4×16-bit banding with
  // the family's MaxBucket cap → exact hamming ≤ MaxHamming verify on
  // candidates only.
  //
  // 100 TB shape: one linear pixel pass (explode + map-side-combined
  // grid sums; at real image sizes this explode is replaced by the
  // mapPartitions decode above feeding the same grid schema), then
  // everything downstream is signature-sized. Banding recall measured
  // on the fixture: 100% of identical-hash pairs, 91% of 1-6-bit pairs
  // (4 bands pigeonhole-guarantee ≤3-bit pairs; the standard LSH
  // recall trade the SimHash path documents).
  object Phash {
    val MaxHamming = 6L
    /** Perturbed re-encode id offset — disjoint from the corpus ids
      * (offsets are per-query scoped: each registered query derives its
      * own corpus, so this only needs to clear the raw doc_id range). */
    val TwinOffset = 3000000L
  }

  /** Registered query: near-dup pairs among the corpus images plus a
    * dimension-preserving perturbed re-encode of each (same w×h, last
    * 5 bytes overwritten — "the same photo through a different
    * encoder"; a LENGTH-changing edit reflows the synthetic byte-
    * stream image entirely, which no perceptual hash survives). */
  def phashNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val twin = d.select((col("doc_id") + Phash.TwinOffset).as("doc_id"),
      when(length(col("text")) > 5,
        concat(expr("substring(text, 1, length(text) - 5)"), lit("xxxxx")))
        .otherwise(col("text")).as("text"))
    phashNearDupOf(d.unionByName(twin))
  }

  /** dHash signatures of any (doc_id, text-as-image-bytes) frame.
    *
    * Computed per partition in plain JVM integer code (the codec
    * pattern [[extractFeatures]] uses): 72 accumulators per image, one
    * pass over the pixels, no per-pixel rows ever materialize — a
    * declarative explode formulation of the same math spent 7 s at
    * sf0.1 on 39 M per-pixel substring/ascii rows where this pass is
    * signature-bound (SCALE.md). All arithmetic is exact integers
    * (cell compare = cross-multiplied sums), so the DuckDB oracle
    * re-derives identical bits from the text bytes. */
  def phashSignatures(images: DataFrame): DataFrame = {
    import images.sparkSession.implicits._
    images.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tlen = text.length
          val len = math.max(tlen, 1)
          val w = tlen % 64 + 8
          val h = tlen % 48 + 8
          val sums = new Array[Long](72) // 8 rows x 9 cols, k = r*9+c
          val cnts = new Array[Long](72)
          val npx = w * h
          var i = 0
          while (i < npx) {
            val v = if (tlen == 0) 0 else text.charAt(i % len).toInt
            val k = ((i / w) * 8 / h) * 9 + (i % w) * 9 / w
            sums(k) += v
            cnts(k) += 1
            i += 1
          }
          var hash = 0L
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              val k = r * 9 + c
              val idx = r * 8 + c
              // missing right neighbor (w=8 has no c=8 cell) => bit 0
              if (idx < 62 && cnts(k + 1) > 0 &&
                sums(k) * cnts(k + 1) > sums(k + 1) * cnts(k))
                hash |= 1L << idx
              c += 1
            }
            r += 1
          }
          (id, hash)
        }
      }.toDF("doc_id", "phash")
  }

  /** Banded candidates + exact-hamming verify (the SimHash shape). */
  def phashNearDupOf(images: DataFrame): DataFrame = {
    val sigs = phashSignatures(images)
    val banded = sigs.select(col("doc_id"), col("phash"),
      expr("posexplode(transform(sequence(0, 3), " +
        "i -> shiftrightunsigned(phash, i*16) % 65536))").as(Seq("band", "key")))
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_set(struct(col("doc_id"), col("phash")))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= DedupOps.MaxBucket)
    buckets
      .select(explode(col("ids")).as("x"), col("ids"))
      .select(col("x"), explode(col("ids")).as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= Phash.MaxHamming)
      .orderBy(col("a"), col("b"))
  }

  /** Oracle: the identical pixel/grid/bit/band pipeline re-derived from
    * the text bytes (the roundtrip identity the feature oracle proves),
    * with the same exact-integer cross-product bit compare. */
  val phashSql: String =
    s"""WITH imgs AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Phash.TwinOffset},
       |    CASE WHEN length(text) > 5
       |         THEN substring(text, 1, length(text) - 5) || 'xxxxx'
       |         ELSE text END
       |  FROM documents),
       |dims AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len,
       |    CAST(length(text) % 64 + 8 AS BIGINT) AS w,
       |    CAST(length(text) % 48 + 8 AS BIGINT) AS h
       |  FROM imgs),
       |px AS (
       |  SELECT doc_id, (g.i // w) * 8 // h AS r, (g.i % w) * 9 // w AS c,
       |    CAST(ascii(substring(text, CAST(g.i % len AS INT) + 1, 1)) AS BIGINT) AS v
       |  FROM dims, UNNEST(generate_series(0, w * h - 1)) AS g(i)),
       |grid AS (
       |  SELECT doc_id, r, c, SUM(v) AS sv, count(*) AS cv
       |  FROM px GROUP BY 1, 2, 3),
       |bits AS (
       |  SELECT doc_id, r * 8 + c AS idx,
       |    COALESCE(nc = c + 1 AND sv * ncv > ns * cv, FALSE) AS bit
       |  FROM (
       |    SELECT doc_id, r, c, sv, cv,
       |      lead(c)  OVER (PARTITION BY doc_id, r ORDER BY c) AS nc,
       |      lead(sv) OVER (PARTITION BY doc_id, r ORDER BY c) AS ns,
       |      lead(cv) OVER (PARTITION BY doc_id, r ORDER BY c) AS ncv
       |    FROM grid)
       |  WHERE c <= 7),
       |sigs AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN bit AND idx < 62
       |         THEN (1::BIGINT << CAST(idx AS INT)) ELSE 0 END) AS BIGINT) AS phash
       |  FROM bits GROUP BY doc_id),
       |bands AS (SELECT doc_id, b AS band, (phash >> (b * 16)) % 65536 AS key
       |          FROM sigs, UNNEST([0, 1, 2, 3]) AS tb(b)),
       |buckets AS (SELECT band, key, ids FROM (
       |    SELECT band, key, list_sort(list(DISTINCT doc_id)) AS ids
       |    FROM bands GROUP BY 1, 2)
       |  WHERE len(ids) > 1 AND len(ids) <= ${DedupOps.MaxBucket}),
       |cand AS (SELECT DISTINCT a, b FROM buckets, UNNEST(ids) AS ta(a), UNNEST(ids) AS tb(b) WHERE a < b)
       |SELECT a, b, CAST(bit_count(xor(sa.phash, sb.phash)) AS BIGINT) AS hamming
       |FROM cand JOIN sigs sa ON sa.doc_id = a JOIN sigs sb ON sb.doc_id = b
       |WHERE bit_count(xor(sa.phash, sb.phash)) <= ${Phash.MaxHamming}
       |ORDER BY a, b""".stripMargin

  object Afp {
    val Frames = 32
    val MaxHamming = 6L
    val TwinOffset = 3000000L
  }

  // ------------------------------------------------------------------
  // Audio fingerprint near-dup: the WAV analog of the dHash pipeline.
  // Acoustic fingerprinters (Shazam/Chromaprint family) band the signal
  // and compare energy across adjacent frames; without FFT libs the
  // two pure-JVM proxies are per-frame amplitude energy Σ|x| (loudness
  // envelope) and first-difference energy Σ|xᵢ−xᵢ₋₁| (a high-pass
  // filter — the standard no-FFT spectral-change proxy). 32 frames × 2
  // staircase families (frame f vs f+1, cross-multiplied exact-integer
  // compare, same discipline as dHash's cell compare) → a 62-bit
  // signature, banded 4×16 and exact-hamming verified like every
  // SimHash-family op here.
  //
  // Samples re-derive from text exactly as [[mediaTable]]'s audio arm
  // encodes them ((byte−128)·256 PCM16, w·h samples with wrap), so the
  // DuckDB oracle replays the identical integer pipeline end to end.
  def audioNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val twin = d.select((col("doc_id") + Afp.TwinOffset).as("doc_id"),
      when(length(col("text")) > 5,
        concat(expr("substring(text, 1, length(text) - 5)"), lit("xxxxx")))
        .otherwise(col("text")).as("text"))
    audioNearDupOf(d.unionByName(twin))
  }

  /** Per-clip 62-bit energy-staircase fingerprints — one mapPartitions
    * pass, 4×32 integer accumulators per clip, no per-sample rows.
    *
    * ASCII-ONLY sampling contract (same convention as the phash arm):
    * the synthetic "waveform" samples `text` via JVM `charAt` — UTF-16
    * code units — while the DuckDB oracle samples via
    * `ascii(substring(...))` — Unicode code points. The two agree
    * exactly on ASCII text (one code unit == one code point == one
    * byte value), which the fixture corpus guarantees; a non-ASCII
    * corpus would diverge on any astral/combining character. If the
    * fixture ever gains non-ASCII text, normalize both sides to a
    * shared iteration (e.g. code-point stepping here, or byte stepping
    * via getBytes(UTF_8) and octet_length in the oracle). */
  def audioSignatures(clips: DataFrame): DataFrame = {
    import clips.sparkSession.implicits._
    val F = Afp.Frames
    clips.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val tlen = text.length
          val len = math.max(tlen, 1)
          val w = tlen % 64 + 8
          val h = tlen % 48 + 8
          val n = w * h
          val sAbs = new Array[Long](F); val cAbs = new Array[Long](F)
          val sDif = new Array[Long](F); val cDif = new Array[Long](F)
          var prev = 0L
          var i = 0
          while (i < n) {
            val c = if (tlen == 0) 0 else text.charAt(i % len).toInt
            val x = (c - 128L) * 256L
            val k = (i.toLong * F / n).toInt
            sAbs(k) += math.abs(x); cAbs(k) += 1
            if (i >= 1) { sDif(k) += math.abs(x - prev); cDif(k) += 1 }
            prev = x
            i += 1
          }
          var sig = 0L
          var f = 0
          while (f < F - 1) {
            if (sAbs(f) * cAbs(f + 1) > sAbs(f + 1) * cAbs(f)) sig |= 1L << f
            if (sDif(f) * cDif(f + 1) > sDif(f + 1) * cDif(f)) sig |= 1L << (F - 1 + f)
            f += 1
          }
          (id, sig)
        }
      }.toDF("doc_id", "afp")
  }

  /** Banded candidates + exact-hamming verify (the SimHash shape). */
  def audioNearDupOf(clips: DataFrame): DataFrame = {
    val sigs = audioSignatures(clips)
    val banded = sigs.select(col("doc_id"), col("afp"),
      expr("posexplode(transform(sequence(0, 3), " +
        "i -> shiftrightunsigned(afp, i*16) % 65536))").as(Seq("band", "key")))
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_set(struct(col("doc_id"), col("afp")))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= DedupOps.MaxBucket)
    buckets
      .select(explode(col("ids")).as("x"), col("ids"))
      .select(col("x"), explode(col("ids")).as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        expr("bit_count(x.afp ^ y.afp)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= Afp.MaxHamming)
      .orderBy(col("a"), col("b"))
  }

  /** Oracle: identical sample/frame/bit/band pipeline from the text
    * bytes, exact integers throughout. */
  val audioNearDupSql: String = {
    val F = Afp.Frames
    s"""WITH clips AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Afp.TwinOffset},
       |    CASE WHEN length(text) > 5
       |         THEN substring(text, 1, length(text) - 5) || 'xxxxx'
       |         ELSE text END
       |  FROM documents),
       |dims AS (
       |  SELECT doc_id, text, CAST(greatest(length(text), 1) AS BIGINT) AS len,
       |    CAST((length(text) % 64 + 8) * (length(text) % 48 + 8) AS BIGINT) AS n
       |  FROM clips),
       |px AS (
       |  SELECT doc_id, g.i AS i, g.i * $F // n AS f,
       |    (ascii(substring(text, CAST(g.i % len AS INT) + 1, 1)) - 128) * 256 AS v,
       |    CASE WHEN g.i >= 1 THEN
       |      (ascii(substring(text, CAST((g.i - 1) % len AS INT) + 1, 1)) - 128) * 256
       |    END AS vprev
       |  FROM dims, UNNEST(generate_series(0, n - 1)) AS g(i)),
       |frames AS (
       |  SELECT doc_id, f,
       |    SUM(abs(v)) AS sabs, count(*) AS cabs,
       |    COALESCE(SUM(abs(v - vprev)), 0) AS sdif, count(vprev) AS cdif
       |  FROM px GROUP BY 1, 2),
       |steps AS (
       |  SELECT doc_id, f, sabs, cabs, sdif, cdif,
       |    lead(sabs) OVER w AS nsabs, lead(cabs) OVER w AS ncabs,
       |    lead(sdif) OVER w AS nsdif, lead(cdif) OVER w AS ncdif
       |  FROM frames
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
       |sigs AS (
       |  SELECT doc_id, CAST(SUM(
       |      CASE WHEN sabs * ncabs > nsabs * cabs
       |           THEN (1::BIGINT << CAST(f AS INT)) ELSE 0 END
       |    + CASE WHEN sdif * ncdif > nsdif * cdif
       |           THEN (1::BIGINT << CAST(${F - 1} + f AS INT)) ELSE 0 END
       |    ) AS BIGINT) AS afp
       |  FROM steps WHERE f < ${F - 1} GROUP BY doc_id),
       |bands AS (SELECT doc_id, b AS band, (afp >> (b * 16)) % 65536 AS key
       |          FROM sigs, UNNEST([0, 1, 2, 3]) AS tb(b)),
       |buckets AS (SELECT band, key, ids FROM (
       |    SELECT band, key, list_sort(list(DISTINCT doc_id)) AS ids
       |    FROM bands GROUP BY 1, 2)
       |  WHERE len(ids) > 1 AND len(ids) <= ${DedupOps.MaxBucket}),
       |cand AS (SELECT DISTINCT a, b FROM buckets, UNNEST(ids) AS ta(a), UNNEST(ids) AS tb(b) WHERE a < b)
       |SELECT a, b, CAST(bit_count(xor(sa.afp, sb.afp)) AS BIGINT) AS hamming
       |FROM cand JOIN sigs sa ON sa.doc_id = a JOIN sigs sb ON sb.doc_id = b
       |WHERE bit_count(xor(sa.afp, sb.afp)) <= ${Afp.MaxHamming}
       |ORDER BY a, b""".stripMargin
  }

  object Vfp {
    val FrameSize = 32
    val NumPerms = 16
    val BandRows = 2 // => 8 bands: high recall at moderate Jaccard
    val BandMult = 1000003L
    val MinJaccardMilli = 500L
    val TwinOffset = 3000000L
  }

  // ------------------------------------------------------------------
  // Video near-dup: the third leg of the multimodal trio. A video is
  // its SET of frame fingerprints (order-free, so trims/appends — the
  // classic re-upload edits — stay similar), compared by Jaccard: the
  // shape video-dedup systems use (frame-hash bag + set resemblance)
  // and exactly the MinHash discipline the text family already ships,
  // applied to frames instead of shingles. Pipeline: non-overlapping
  // 32-byte frames → per-frame PolyHash → per-video 16-perm MinHash
  // signature (one map-side-combined agg) → 8×2 banding under the
  // MaxBucket cap → exact set-Jaccard verify on candidates only
  // (integer milli-units, ≥ [[Vfp.MinJaccardMilli]]).
  //
  // 100 TB shape: the frame explode is linear in corpus bytes with a
  // map-side-combined 16-column min agg straight back to one row per
  // video; everything downstream is signature-sized. Band/row counts
  // trade recall against candidate volume exactly as in the text LSH.
  def videoNearDup(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // perturbed twin: one appended trailer frame (same leading frames)
    val twin = d.select((col("doc_id") + Vfp.TwinOffset).as("doc_id"),
      concat(col("text"), lit("x" * Vfp.FrameSize)).as("text"))
    videoNearDupOf(d.unionByName(twin))
  }

  /** Distinct frame hashes per video: (doc_id, H) rows; videos shorter
    * than one frame contribute nothing (no frames => no identity). */
  def videoFrameHashes(videos: DataFrame): DataFrame = {
    val fs = Vfp.FrameSize
    videos
      .select(col("doc_id"), explode(expr(
        s"""CASE WHEN length(text) >= $fs THEN
           |  array_distinct(transform(sequence(0, CAST(length(text) / $fs AS INT) - 1),
           |                 i -> substring(text, i * $fs + 1, $fs)))
           |ELSE array() END""".stripMargin)).as("frame"))
      .select(col("doc_id"),
        graft.functions.PolyHash.polyHash(col("frame"), 31, DedupOps.HashMod).as("H"))
      .distinct()
  }

  /** Banded MinHash candidates + exact set-Jaccard verify. */
  def videoNearDupOf(videos: DataFrame): DataFrame = {
    val frames = videoFrameHashes(videos).localCheckpoint() // feeds sigs AND verify
    val perms = DedupOps.permAB.take(Vfp.NumPerms)
    val mins = perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("H") + lit(b)) % lit(DedupOps.HashMod)).as(s"m$i")
    }
    val sigs = frames.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val nBands = Vfp.NumPerms / Vfp.BandRows
    val bandCols = (0 until nBands).map { bnd =>
      val key = (0 until Vfp.BandRows).foldLeft(lit(bnd.toLong): org.apache.spark.sql.Column) {
        (acc, r) => (acc * lit(Vfp.BandMult) + col(s"m${bnd * Vfp.BandRows + r}")) % lit(DedupOps.HashMod)
      }
      struct(lit(bnd).as("band"), key.as("key"))
    }
    val banded = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val buckets = banded.groupBy(col("band"), col("key"))
      .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= DedupOps.MaxBucket)
    val cand = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
    val sets = frames.groupBy(col("doc_id"))
      .agg(collect_set(col("H")).as("hs"))
    val sa = sets.select(col("doc_id").as("a"), col("hs").as("hsa"))
    val sb = sets.select(col("doc_id").as("b"), col("hs").as("hsb"))
    cand.join(sa, Seq("a")).join(sb, Seq("b"))
      .withColumn("n_shared", size(array_intersect(col("hsa"), col("hsb"))).cast("long"))
      .withColumn("j_milli",
        expr("1000 * n_shared DIV (size(hsa) + size(hsb) - n_shared)"))
      .filter(col("j_milli") >= Vfp.MinJaccardMilli)
      .select(col("a"), col("b"), col("n_shared"), col("j_milli"))
      .orderBy(col("a"), col("b"))
  }

  /** Oracle: identical frame/hash/minhash/band/Jaccard pipeline. */
  val videoNearDupSql: String = {
    val fs = Vfp.FrameSize
    val mod = DedupOps.HashMod
    def fold(column: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(string_split($column, ''), c -> CAST(ascii(c) AS BIGINT))), " +
        s"(acc, x) -> (acc * 31 + x) % $mod)"
    val perms = DedupOps.permAB.take(Vfp.NumPerms)
    val minCols = perms.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * H + $b) % $mod) AS m$i"
    }.mkString(",\n    ")
    val nBands = Vfp.NumPerms / Vfp.BandRows
    val bandRows = (0 until nBands).map { bnd =>
      val key = (0 until Vfp.BandRows).foldLeft(bnd.toString) { (acc, r) =>
        s"(($acc) * ${Vfp.BandMult} + m${bnd * Vfp.BandRows + r}) % $mod"
      }
      s"SELECT doc_id, $bnd AS band, $key AS key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH vids AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + ${Vfp.TwinOffset}, text || repeat('x', $fs) FROM documents),
       |frames AS (
       |  SELECT DISTINCT doc_id,
       |    ${fold(s"substring(text, CAST(g.i * $fs AS INT) + 1, $fs)")} AS H
       |  FROM vids, UNNEST(generate_series(0, length(text) // $fs - 1)) AS g(i)),
       |sigs AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM frames GROUP BY doc_id),
       |bands AS (
       |  $bandRows),
       |buckets AS (SELECT band, key, ids FROM (
       |    SELECT band, key, list_sort(list(DISTINCT doc_id)) AS ids
       |    FROM bands GROUP BY 1, 2)
       |  WHERE len(ids) > 1 AND len(ids) <= ${DedupOps.MaxBucket}),
       |cand AS (SELECT DISTINCT a, b
       |         FROM buckets, UNNEST(ids) AS ta(a), UNNEST(ids) AS tb(b) WHERE a < b),
       |sets AS (SELECT doc_id, list(DISTINCT H) AS hs FROM frames GROUP BY doc_id),
       |scored AS (
       |  SELECT c.a, c.b,
       |    CAST(len(list_intersect(sa.hs, sb.hs)) AS BIGINT) AS n_shared,
       |    CAST(1000 * len(list_intersect(sa.hs, sb.hs))
       |         // (len(sa.hs) + len(sb.hs) - len(list_intersect(sa.hs, sb.hs))) AS BIGINT)
       |      AS j_milli
       |  FROM cand c JOIN sets sa ON sa.doc_id = c.a JOIN sets sb ON sb.doc_id = c.b)
       |SELECT a, b, n_shared, j_milli FROM scored
       |WHERE j_milli >= ${Vfp.MinJaccardMilli}
       |ORDER BY a, b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (extractFeatures _),
    "media_png_roundtrip" -> (pngRoundtrip _),
    "media_frame_sample" -> (sampleFrames _),
    "media_phash_neardup" -> (phashNearDup _),
    "media_audio_neardup" -> (audioNearDup _),
    "media_video_neardup" -> (videoNearDup _)
  )

  /** Oracle for the feature extractor. The builder's encode→decode paths
    * roundtrip exactly to the source text bytes (BMP gray = byte; WAV
    * sample→byte inverse; raw = bytes), so DuckDB can re-derive every
    * decoded pixel straight from `documents.text` (pure ASCII, verified:
    * ascii(char) = byte) and recompute the features: payload size from
    * the format's header arithmetic, exact mean, histogram entropy in
    * millibits, 8×8 average-pool thumbnail mean in micro-units. */
  val featuresSql: String =
    """WITH dims AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    text, CAST(length(text) AS BIGINT) AS len,
      |    CAST(n_chars % 64 + 8 AS BIGINT) AS w,
      |    CAST(n_chars % 48 + 8 AS BIGINT) AS h
      |  FROM documents),
      |d2 AS (
      |  SELECT *,
      |    CASE media_type WHEN 'video' THEN len ELSE w * h END AS npx,
      |    CASE media_type
      |      WHEN 'image' THEN 54 + (3 * w + (4 - (3 * w) % 4) % 4) * h
      |      WHEN 'audio' THEN 44 + 2 * w * h
      |      ELSE len END AS n_bytes
      |  FROM dims),
      |px AS (
      |  SELECT media_id, npx, greatest(npx // 64, 1) AS stride, g.i AS i,
      |    ascii(substring(text, CAST(g.i % len AS INT) + 1, 1)) AS v
      |  FROM d2, UNNEST(generate_series(0, npx - 1)) AS g(i)),
      |agg AS (
      |  SELECT media_id, CAST(SUM(v) AS DOUBLE) / CAST(npx AS DOUBLE) AS mean_byte
      |  FROM px GROUP BY media_id, npx),
      |hist AS (SELECT media_id, npx, v, count(*) AS c FROM px GROUP BY 1, 2, 3),
      |ent AS (
      |  SELECT media_id,
      |    CAST(round(1000 * SUM(-(CAST(c AS DOUBLE) / npx) * log2(CAST(c AS DOUBLE) / npx))) AS BIGINT) AS entropy_mb
      |  FROM hist GROUP BY media_id),
      |sl AS (
      |  SELECT media_id, i // stride AS k, CAST(SUM(v) AS DOUBLE) / count(*) AS m
      |  FROM px WHERE i // stride < 64 GROUP BY 1, 2),
      |thumb AS (
      |  -- left fold in slice order reproduces the JVM's Array.sum bit-for-
      |  -- bit (slice means are exact rationals, /64 is an exact power-of-2
      |  -- scale), so the rounding below sees the IDENTICAL double — a
      |  -- sum-then-round in arbitrary order was observed one micro-unit
      |  -- off on a value landing exactly on a .5 boundary. Missing slices
      |  -- (npx < 64) contribute exact zeros and can be skipped.
      |  SELECT media_id,
      |    CAST(round(list_reduce(list_prepend(CAST(0 AS DOUBLE), list(m ORDER BY k)),
      |                           (a, x) -> a + x) / 64 * 1000000) AS BIGINT) AS thumb_mean_micro
      |  FROM sl GROUP BY media_id)
      |SELECT d.media_id, d.media_type, d.n_bytes, a.mean_byte, e.entropy_mb, t.thumb_mean_micro
      |FROM d2 d
      |JOIN agg a USING (media_id) JOIN ent e USING (media_id) JOIN thumb t USING (media_id)
      |ORDER BY media_id""".stripMargin

  // The frame-sample op is pure byte algebra and oracle-able.
  // DuckDB has no BLOB substring; the corpus is pure ASCII (verified), so
  // slicing the VARCHAR and md5-ing it hashes the identical bytes.
  val frameSampleSql: String =
    """SELECT media_id, frame_idx, CAST(length(frame) AS BIGINT) AS frame_bytes,
      |  md5(frame) AS frame_md5
      |FROM (
      |  SELECT media_id, (i - 1) AS frame_idx,
      |    substring(payload, (i - 1) * 32 + 1, 32) AS frame
      |  FROM (
      |    SELECT doc_id AS media_id, text AS payload
      |    FROM documents WHERE doc_id % 3 = 2),
      |  LATERAL UNNEST(generate_series(1, CAST(floor(octet_length(encode(payload)) / 32) AS INT))) AS t(i))
      |WHERE frame_idx % 4 = 0
      |ORDER BY media_id, frame_idx""".stripMargin

  val oracle: Map[String, String] = Map(
    "media_features" -> featuresSql,
    "media_png_roundtrip" -> pngRoundtripSql,
    "media_frame_sample" -> frameSampleSql,
    "media_phash_neardup" -> phashSql,
    "media_audio_neardup" -> audioNearDupSql,
    "media_video_neardup" -> videoNearDupSql
  )
}
