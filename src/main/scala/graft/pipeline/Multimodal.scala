package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * IMAGE decode is REAL ([[decodeImages]]: PNG/JPEG/BMP/GIF through the
  * JDK's own javax.imageio — no external codec needed). Audio/video decode
  * remains STUBBED (`decodeStub` produces deterministic fake features from
  * the raw bytes — those codecs are genuinely absent from this JVM). The
  * Spark-side plumbing is identical for both and tested — schema, batch
  * iteration shape (mapPartitions over row batches, the Scala analogue of
  * mapInPandas), and partition sizing so a batch of payloads fits in
  * executor memory.
  *
  * Scale notes: payloads ride in the row (parquet binary); repartitionByBytes
  * bounds per-task memory by average payload size, the decode stage is a
  * narrow transformation (no shuffle), and feature extraction prunes the
  * binary column immediately after so downstream stages never shuffle blobs.
  */
object Multimodal {

  /** media struct: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Wrap a text table into a media table (synthesizes payload bytes from the
    * text column — stands in for real image bytes in tests/fixtures). */
  def synthesizeMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      struct(
        encode(col(textCol), "UTF-8").as("payload"),
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 640).cast(IntegerType).as("width"),
        lit(480).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("media"))

  /** Cap average bytes per task: repartition so each task sees ~`targetBytes`
    * of payload (the knob that keeps decode batches inside executor memory
    * at 100 TB — equivalent to tuning maxPartitionBytes for blob columns). */
  def repartitionByBytes(media: DataFrame, totalBytes: Long, targetBytes: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts, col("doc_id"))
  }

  /** STUB decode + feature extraction — deterministic fake: per-payload
    * checksum and an 8-dim feature derived from byte histogram moments.
    * Signature/batching mirror a real decoder: one partition = one batch of
    * rows, iterator-in/iterator-out (constant memory, pipelined). */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var sum = 0L
          val hist = new Array[Long](8)
          var i = 0
          while (i < bytes.length) {
            sum = (sum * 31 + (bytes(i) & 0xff)) & 0x7fffffffffffffffL
            hist((bytes(i) & 0xff) % 8) += 1
            i += 1
          }
          val n = math.max(1, bytes.length)
          Row(id, bytes.length.toLong, sum, hist.map(h => h.toFloat / n).toSeq)
        }
      }
    spark.createDataFrame(out, featureSchema)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType, containsNull = false))))

  /** Synthesize REAL PNG payloads — deterministic 8×8 grayscale ramps keyed
    * by the id (pixel i carries gray level (id·31 + i) mod 256), encoded by
    * the JDK's own PNG writer. Gives tests and probes true image bytes with
    * zero external codec or data dependency; the decoded pixels are a pure
    * function of the id, so a SQL oracle can re-derive any feature of them
    * without seeing the bytes. */
  def synthesizePngMedia(ids: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col(idCol).cast(LongType)).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val im = new java.awt.image.BufferedImage(8, 8,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var i = 0
        while (i < 64) {
          val g = ((id * 31 + i) % 256).toInt
          im.setRGB(i % 8, i / 8, (g << 16) | (g << 8) | g)
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        Row(id, Row(bos.toByteArray, "image/png", 8, 8, null))
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType), StructField("media", mediaSchema))))
  }

  /** REAL image decode + feature extraction for the formats the JVM decodes
    * natively — PNG, JPEG, BMP, GIF via javax.imageio, which ships with the
    * JDK (no external codec). Per image: true dimensions and an 8-bin
    * luminance histogram (Rec.601 integer weights) over an at-most-64×64
    * subsampled pixel grid, so per-image work is constant regardless of
    * resolution. Same iterator-in/iterator-out partition batching as
    * [[decodeStub]]; an undecodable payload yields a null-dimension row
    * (kept, not dropped — a real pipeline quarantines those downstream).
    * Video/audio decode remains stubbed: THOSE codecs genuinely are absent
    * from the JVM. */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              val hist = new Array[Long](8)
              val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
              var n = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = im.getRGB(x, y)
                  val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                  hist(lum / 32) += 1; n += 1
                  x += sx
                }
                y += sy
              }
              Row(id, w, h, hist.map(v => v.toFloat / math.max(1L, n)).toSeq)
            case None => Row(id, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, imageFeatureSchema)
  }

  /** REAL image resize — deterministic nearest-neighbor sampling (source
    * pixel = floor(dst·srcDim/dstDim), the classic NN map; no AWT scaling
    * hints, whose kernels vary by JDK) re-encoded to PNG by the JDK codec.
    * Payload-in/payload-out: the result is a media frame again, so resize
    * composes with [[decodeImages]]/feature extraction downstream exactly
    * like a real preprocessing pipeline. Undecodable payloads pass through
    * with a null payload (quarantine downstream). Narrow transformation —
    * no shuffle; blobs never leave their partition. */
  def resizeImages(media: DataFrame, dstW: Int, dstH: Int): DataFrame = {
    require(dstW > 0 && dstH > 0, "target dimensions must be positive")
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              val srcW = im.getWidth; val srcH = im.getHeight
              val dst = new java.awt.image.BufferedImage(dstW, dstH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < dstH) {
                var x = 0
                while (x < dstW) {
                  dst.setRGB(x, y, im.getRGB(x * srcW / dstW, y * srcH / dstH))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(dst, "png", bos)
              Row(id, Row(bos.toByteArray, "image/png", dstW, dstH, null))
            case None => Row(id, Row(null, "image/unreadable", null, null, null))
          }
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType), StructField("media", mediaSchema))))
  }

  /** Perceptual average-hash (aHash) of each image — the standard cheap
    * image fingerprint (public pHash-family recipe: grayscale, shrink to
    * 8×8, threshold each cell against the mean): bit i (row-major) is set
    * when cell-i luminance · 64 > Σ luminance (the division-free form of
    * "above the mean" — integer-exact, so a SQL oracle reproduces every
    * bit). Cells come from the same deterministic nearest-neighbor map as
    * [[resizeImages]]; luminance is the integer Rec.601 of
    * [[decodeImages]]. Returned as two 32-bit words in LONG columns
    * (ahash_lo = bits 0–31, ahash_hi = bits 32–63) so downstream Hamming
    * arithmetic stays in codegen'd integer ops — no strings, no UDFs after
    * the decode boundary. Undecodable payloads yield null words (kept).
    * Narrow mapPartitions; blobs never leave their partition. */
  def imageAHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              val lum = new Array[Long](64)
              var sum = 0L
              var i = 0
              while (i < 64) {
                val rgb = im.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
                lum(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                sum += lum(i)
                i += 1
              }
              var lo = 0L; var hi = 0L
              i = 0
              while (i < 64) {
                if (lum(i) * 64 > sum) {
                  if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                }
                i += 1
              }
              Row(id, hi, lo)
            case None => Row(id, null, null)
          }
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ahash_hi", LongType), StructField("ahash_lo", LongType))))
  }

  /** Image DIFFERENCE hash (dHash) on the same 8×8 luminance lattice as
    * [[imageAHash]]: bit (y·7+x) = lum(y, x+1) > lum(y, x) — 56 horizontal
    * gradient bits in one BIGINT (the classic dHash uses a 9×8 grid; the
    * shared-lattice variant keeps the sampling identical to aHash so the
    * two hashes read the SAME pixels and differ only in the statistic).
    * Gradients survive global brightness/contrast shifts that move every
    * aHash bit at once — pipelines keep both and near-dup on either.
    * Composable with [[hammingNearDupPairs]] (hi = 0 — distances live in
    * the low word). Undecodable payloads yield a NULL hash row, like
    * aHash. */
  def imageDHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: Exception => None }
          img match {
            case Some(im) =>
              val w = im.getWidth; val h = im.getHeight
              val lum = new Array[Long](64)
              var i = 0
              while (i < 64) {
                val rgb = im.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
                lum(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                i += 1
              }
              var d = 0L
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 7) {
                  if (lum(y * 8 + x + 1) > lum(y * 8 + x)) d |= 1L << (y * 7 + x)
                  x += 1
                }
                y += 1
              }
              Row(id, d)
            case None => Row(id, null)
          }
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType), StructField("dhash", LongType))))
  }

  /** Image near-duplicate pairs by aHash Hamming distance ≤ `maxHamming` —
    * the visual member of the dedup family (same role MinHash plays for
    * text): re-encoded, resized and re-compressed copies land within a few
    * bits of each other. The 64-bit hash splits into 8 byte-bands, and by
    * pigeonhole any pair within distance ≤ 7 shares at least one unchanged
    * band — candidates come from one (band, value) equi-join, then the true
    * distance (codegen bit_count over XOR) filters. Requires maxHamming ≤ 7
    * so the band guarantee holds.
    *
    * Scale: hashes are 2 longs/image — the join input is (id, band, byte),
    * constant width. Heavy buckets — (band, value) groups beyond
    * `maxBucket` ids, e.g. millions of flat/black images all hashing
    * alike — are DROPPED with the same anti-join guard as the text LSH
    * families, which bounds the candidate volume but forfeits pairs whose
    * every shared band is heavy: recall is 1 only below the cap (set
    * `maxBucket = Int.MaxValue` for the unconditionally-exact join when the
    * corpus is known skew-free). */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int = 7,
      maxBucket: Int = 10000): DataFrame =
    hammingNearDupPairs(hashes, "ahash_hi", "ahash_lo", maxHamming, maxBucket)

  /** Generic 64-bit-fingerprint near-dup join (shared by [[imageAHash]] and
    * [[audioFingerprint]] outputs): 8 byte-bands over the (hi, lo) words,
    * one (band, value) equi-join for candidates — recall 1 for distance ≤ 7
    * by pigeonhole — then the exact bit_count(xor) distance filters. Heavy
    * buckets cap at `maxBucket` like the text LSH families. */
  def hammingNearDupPairs(hashes: DataFrame, hiCol: String, loCol: String,
      maxHamming: Int = 7, maxBucket: Int = 10000,
      idCol: String = "doc_id"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"hammingNearDupPairs: 8 byte-bands guarantee recall only for maxHamming <= 7, got $maxHamming")
    val h = hashes.filter(col(hiCol).isNotNull && col(loCol).isNotNull)
      .select(col(idCol), col(hiCol).as("__hi"), col(loCol).as("__lo"))
    val bandCols = (0 until 8).map { j =>
      val word = if (j < 4) col("__lo") else col("__hi")
      shiftright(word, 8 * (j % 4)).bitwiseAND(lit(255L)).as(s"__b$j")
    }
    val banded = h.select(col(idCol) +: col("__hi") +: col("__lo") +: bandCols: _*)
      .select(col(idCol), col("__hi"), col("__lo"),
        posexplode(array((0 until 8).map(j => col(s"__b$j")): _*)).as(Seq("band", "v")))
    val heavy = banded.groupBy(col("band"), col("v"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBucket)
      .select(col("band"), col("v"))
    val light = banded.join(heavy, Seq("band", "v"), "left_anti")
    val a = light.select(col("band"), col("v"), col(idCol).as("ida"),
      col("__hi").as("ha"), col("__lo").as("la"))
    val b = light.select(col("band"), col("v"), col(idCol).as("idb"),
      col("__hi").as("hb"), col("__lo").as("lb"))
    a.join(b, Seq("band", "v"))
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        (bit_count(col("ha").bitwiseXOR(col("hb"))) +
          bit_count(col("la").bitwiseXOR(col("lb")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("ida", "idb")
  }

  /** 64-bit audio fingerprint from REAL decoded PCM — the audio member of
    * the perceptual-hash family: the signal splits into 64 equal frames,
    * frame energy E_f = Σ|sample|, and bit f (LSB-first into lo then hi,
    * like [[imageAHash]]) is set when E_f · 64 > ΣE — the same
    * division-free mean threshold, so re-encoded/requantized copies land a
    * few bits apart while a SQL oracle reproduces every bit exactly.
    * Trailing samples beyond 64·⌊n/64⌋ are ignored (frames stay equal
    * width); signals shorter than 64 samples and unparsable payloads yield
    * null words. Pair with [[hammingNearDupPairs]] for audio near-dup
    * detection. Narrow mapPartitions — blobs never leave their partition. */
  def audioFingerprint(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian)
            val raw = in.readAllBytes(); in.close()
            val n = raw.length / 2
            require(n >= 64, "audioFingerprint needs >= 64 samples")
            val frameLen = n / 64
            val energy = new Array[Long](64)
            var sum = 0L
            var f = 0
            while (f < 64) {
              var i = f * frameLen
              val end = i + frameLen
              var e = 0L
              while (i < end) {
                val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
                e += math.abs(s.toLong)
                i += 1
              }
              energy(f) = e; sum += e
              f += 1
            }
            var lo = 0L; var hi = 0L
            f = 0
            while (f < 64) {
              if (energy(f) * 64 > sum) {
                if (f < 32) lo |= 1L << f else hi |= 1L << (f - 32)
              }
              f += 1
            }
            Row(id, hi, lo)
          } catch {
            case _: Exception => Row(id, null, null)
          }
        }
      }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType),
      StructField("afp_hi", LongType), StructField("afp_lo", LongType))))
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType),
    StructField("smin", IntegerType),
    StructField("smax", IntegerType),
    StructField("sum_abs", LongType)))

  /** Synthesize REAL WAV payloads — `nSamples` of PCM16LE mono at
    * `sampleRate`, sample i carrying ((id·7919 + i·31) mod 65536) − 32768.
    * The RIFF/WAVE container is written byte-by-byte (the format is just a
    * 44-byte header + little-endian samples), so like [[synthesizePngMedia]]
    * the decoded signal is a pure function of the id that a SQL oracle can
    * re-derive without the bytes. */
  def synthesizeWavMedia(ids: DataFrame, idCol: String = "doc_id",
      nSamples: Int = 256, sampleRate: Int = 8000): DataFrame = {
    val spark = ids.sparkSession
    val out = ids.select(col(idCol).cast(LongType)).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val data = new Array[Byte](nSamples * 2)
        var i = 0
        while (i < nSamples) {
          val s = (((id * 7919 + i.toLong * 31) % 65536) - 32768).toInt
          data(2 * i) = (s & 0xff).toByte
          data(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        val o = new java.io.DataOutputStream(bos)
        def le32(v: Int): Unit = { o.writeByte(v & 0xff); o.writeByte((v >> 8) & 0xff)
          o.writeByte((v >> 16) & 0xff); o.writeByte((v >> 24) & 0xff) }
        def le16(v: Int): Unit = { o.writeByte(v & 0xff); o.writeByte((v >> 8) & 0xff) }
        o.writeBytes("RIFF"); le32(36 + data.length); o.writeBytes("WAVE")
        o.writeBytes("fmt "); le32(16); le16(1); le16(1) // PCM, mono
        le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
        o.writeBytes("data"); le32(data.length); o.write(data)
        Row(id, Row(bos.toByteArray, "audio/wav", null, null,
          java.lang.Long.valueOf(nSamples.toLong * 1000 / sampleRate)))
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", LongType), StructField("media", mediaSchema))))
  }

  /** REAL audio decode for the formats the JVM parses natively — WAV/PCM
    * (and AIFF/AU) through javax.sound.sampled, which ships with the JDK.
    * Per payload: the container-declared sample rate and exact integer
    * signal statistics (count, min, max, Σ|s|) over the decoded PCM16
    * stream — integer features, so engine-exact. Same batching contract and
    * null-row behavior as [[decodeImages]]; only video decode remains
    * stubbed. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select(col("doc_id"), col("media.payload").as("payload"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = in.getFormat
            require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian)
            val raw = in.readAllBytes(); in.close()
            var n = 0L; var mn = Int.MaxValue; var mx = Int.MinValue; var sabs = 0L
            var i = 0
            while (i + 1 < raw.length) {
              val s = ((raw(i) & 0xff) | (raw(i + 1) << 8)).toShort.toInt
              if (s < mn) mn = s
              if (s > mx) mx = s
              sabs += math.abs(s.toLong); n += 1
              i += 2
            }
            Row(id, fmt.getSampleRate.toInt, n, mn, mx, sabs)
          } catch {
            case _: Exception => Row(id, null, null, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, audioFeatureSchema)
  }

  /** Video frame-sampling plan: the timestamps a decoder would extract, one
    * row per sampled frame — `everyMs` spacing across `duration_ms`, capped
    * at `maxFrames` (uniform head sample). Pure expressions (sequence +
    * explode, bounded fan-out); the actual pixel decode happens downstream in
    * the stubbed batch stage. This is the Spark-side plumbing a real video
    * pipeline needs: the explode shape, not the codec. */
  def frameSamplePlan(media: DataFrame, everyMs: Long, maxFrames: Int = 32): DataFrame = {
    require(everyMs > 0 && maxFrames > 0, "need positive sampling interval and cap")
    val dur = col("media.duration_ms")
    // bound the sequence END at the cap, don't slice after generating: a
    // 10-hour payload must never materialize a million-element array to
    // keep 16 entries (and Spark's sequence errors past its array limit)
    val last = least(greatest(dur - 1, lit(0L)), lit(everyMs * (maxFrames - 1)))
    val offsets = sequence(lit(0L), last, lit(everyMs))
    media.filter(dur.isNotNull && dur > 0)
      .select(col("doc_id"), posexplode(offsets).as(Seq("frame_idx", "offset_ms")))
  }

  /** Fixed-size payload chunking (audio/binary windowing): byte ranges
    * [i·chunk, min((i+1)·chunk, n)) per payload — the shape a chunked
    * transcription or fingerprinting stage consumes. Emits ranges, not
    * sliced blobs: the binary column is pruned unless a downstream stage
    * explicitly slices, so chunk planning never amplifies shuffle bytes. */
  def chunkPlan(media: DataFrame, chunkBytes: Int): DataFrame = {
    require(chunkBytes > 0, "chunk size must be positive")
    val n = length(col("media.payload")).cast(LongType)
    val starts = sequence(lit(0L), greatest(n - 1, lit(0L)), lit(chunkBytes.toLong))
    media.filter(n > 0)
      .select(col("doc_id"), n.as("n_bytes"),
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .withColumn("end", least(col("start") + chunkBytes, col("n_bytes")))
  }
}
