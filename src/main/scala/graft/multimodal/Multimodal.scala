package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, and batch feature extraction over them.
  *
  * Model: image/audio/video payloads are `binary` columns + a metadata
  * struct (format, width, height, n_bytes); decode / feature-extract runs
  * as an imperative per-partition pass over the typed Dataset — the Scala
  * analogue of `mapInPandas` (iterator-of-batches in, iterator out, no
  * per-row JVM<->Python hop; here it is a plain `mapPartitions` on a
  * case-class Encoder, which keeps Tungsten row encoding end-to-end).
  *
  * The DECODE step is a deterministic STUB (`FakeCodec`): real image
  * codecs are not available in this environment, so the "pixels" are the
  * payload bytes themselves. Everything around it — schema, binary
  * encoding, partition-batched execution, fixed-width feature vectors —
  * is the real pipeline shape: swap `FakeCodec.decode` for a JNI/codec
  * call and nothing else changes. Scale: per-partition imperative work
  * with bounded per-row state; no shuffle, no driver collection.
  */
object Multimodal {

  /** A media row: payload plus the metadata a real pipeline carries. */
  final case class MediaRecord(
      doc_id: Long, fmt: String, n_bytes: Long, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, n_blocks: Long,
      mean_byte: Double, first_block_mean: Double)

  /** Deterministic stand-in for an image/audio decoder. */
  object FakeCodec {
    val BlockSize = 64

    /** "Decode" a payload into block-mean features: mean byte value per
      * BlockSize chunk (unsigned). Stands in for decode+resize+pool.
      */
    def decode(media: Array[Byte]): (Long, Double, Double) = {
      if (media.isEmpty) return (0L, 0.0, 0.0)
      var sum = 0L
      var i = 0
      while (i < media.length) { sum += media(i) & 0xff; i += 1 }
      val firstLen = math.min(BlockSize, media.length)
      var firstSum = 0L
      i = 0
      while (i < firstLen) { firstSum += media(i) & 0xff; i += 1 }
      val nBlocks = (media.length + BlockSize - 1) / BlockSize
      (nBlocks.toLong,
        sum.toDouble / media.length.toDouble,
        firstSum.toDouble / firstLen.toDouble)
    }
  }

  /** One sampled "video frame", pooled to a fixed-width vector. */
  final case class FrameFeatures(
      doc_id: Long, frame_idx: Long, frame_bytes: Long,
      p0: Double, p1: Double, p2: Double, p3: Double)

  /** Frame-sampling + resize plumbing over the same stubbed codec:
    * the payload is treated as a frame sequence (BlockSize bytes per
    * frame), every SampleEvery-th frame is decoded, and each decoded
    * frame is "resized" by equal-split mean pooling to a fixed
    * Pools-wide vector — the deterministic stand-in for
    * decode -> sample -> resize -> embed. The 1-row-to-n-frames
    * expansion runs iterator-in/iterator-out per partition (the
    * mapInPandas batch shape), so frame explosion never materializes a
    * document's frames in one object, and output rows are fixed-width.
    */
  object FrameSampler {
    val SampleEvery = 4
    val Pools = 4

    def sampleFrames(media: Array[Byte]): Iterator[(Long, Long, Array[Double])] = {
      val n = media.length
      val nFrames = (n + FakeCodec.BlockSize - 1) / FakeCodec.BlockSize
      (0 until nFrames).iterator.filter(_ % SampleEvery == 0).map { i =>
        val s = i * FakeCodec.BlockSize
        val e = math.min(n, s + FakeCodec.BlockSize)
        val fb = e - s
        val pools = Array.tabulate(Pools) { j =>
          val ps = s + j * fb / Pools
          val pe = s + (j + 1) * fb / Pools
          if (pe > ps) {
            var sum = 0L
            var k = ps
            while (k < pe) { sum += media(k) & 0xff; k += 1 }
            sum.toDouble / (pe - ps).toDouble
          } else 0.0
        }
        (i.toLong, fb.toLong, pools)
      }
    }
  }

  /** Partition-batched frame sampling: one input row expands to its
    * sampled frames' fixed-width feature rows.
    */
  def extractFrames(spark: SparkSession, media: DataFrame): Dataset[FrameFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { rec =>
        FrameSampler.sampleFrames(rec.media).map { case (idx, fb, p) =>
          FrameFeatures(rec.doc_id, idx, fb, p(0), p(1), p(2), p(3))
        }
      }
    }
  }

  final case class FrameSig(doc_id: Long, frame_idx: Long, sig: Long)

  /** Per-frame 8-bit visual signature for SHOT detection: every frame
    * (BlockSize bytes — no sampling, boundaries must not be skipped)
    * gets one bit per eighth-chunk, set when the chunk's mean byte is
    * at or above the FRAME mean. Means compare as exact integer
    * cross-products (chunkSum * frameBytes >= frameSum * chunkLen), so
    * the DuckDB oracle is bit-identical — the same discipline as
    * [[PerceptualHash.aHash]], scoped per frame instead of per payload.
    * Consecutive-frame signature Hamming distance is the classic
    * shot-boundary signal: swap the byte plane for decoded luma
    * histograms and this is textbook cut detection.
    */
  object ShotDetector {
    val Chunks = 8

    def frameSigs(media: Array[Byte]): Iterator[(Long, Long)] = {
      val n = media.length
      val nFrames = (n + FakeCodec.BlockSize - 1) / FakeCodec.BlockSize
      (0 until nFrames).iterator.map { i =>
        val s = i * FakeCodec.BlockSize
        val e = math.min(n, s + FakeCodec.BlockSize)
        val fb = e - s
        var fsum = 0L
        var k = s
        while (k < e) { fsum += media(k) & 0xff; k += 1 }
        var sig = 0L
        var j = 0
        while (j < Chunks) {
          val ps = s + j * fb / Chunks
          val pe = s + (j + 1) * fb / Chunks
          if (pe > ps) {
            var cs = 0L
            var m = ps
            while (m < pe) { cs += media(m) & 0xff; m += 1 }
            if (cs * fb >= fsum * (pe - ps)) sig |= (1L << j)
          }
          j += 1
        }
        (i.toLong, sig)
      }
    }
  }

  /** Partition-batched frame signatures: one media row expands to one
    * signature row per frame (iterator-in/iterator-out, like
    * [[extractFrames]] — a document's frames never materialize in one
    * object).
    */
  def frameSignatures(spark: SparkSession, media: DataFrame): Dataset[FrameSig] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { rec =>
        ShotDetector.frameSigs(rec.media).map { case (idx, sig) =>
          FrameSig(rec.doc_id, idx, sig)
        }
      }
    }
  }

  final case class MediaHash(doc_id: Long, phash: Long)

  /** aHash-style PERCEPTUAL hash over the stubbed codec's byte plane:
    * the payload splits into 64 equal block spans (the same j*n/64
    * integer bounds as the frame pooler) and bit j is set when block
    * j's mean byte is at or above the payload's GLOBAL mean. Means are
    * compared as exact integer cross-products (blockSum * n >=
    * totalSum * blockLen — never a double), so the DuckDB oracle is
    * bit-identical. Swap the byte plane for decoded luma and this IS
    * classic image aHash; identical codes bucket perceptually-same
    * media without any pairwise comparison.
    */
  object PerceptualHash {
    val Bits = 64

    def aHash(media: Array[Byte]): Long = {
      val n = media.length
      if (n == 0) return 0L
      var total = 0L
      var i = 0
      while (i < n) { total += media(i) & 0xff; i += 1 }
      var code = 0L
      var j = 0
      while (j < Bits) {
        // long bounds: j * n overflows Int for payloads > ~34 MB — real
        // decoded media sizes (the oracle's BIGINT arithmetic already
        // matches this).
        val s = (j.toLong * n / Bits).toInt
        val e = ((j + 1).toLong * n / Bits).toInt
        if (e > s) {
          var bs = 0L
          var k = s
          while (k < e) { bs += media(k) & 0xff; k += 1 }
          if (bs * n >= total * (e - s)) code |= (1L << j)
        }
        j += 1
      }
      code
    }
  }

  /** Partition-batched perceptual hashing (one code per media row). */
  def perceptualHashes(spark: SparkSession, media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(rec => MediaHash(rec.doc_id, PerceptualHash.aHash(rec.media)))
    }
  }

  /** Attach a synthetic binary payload (UTF-8 bytes of the text) plus
    * metadata — the ingest step that in production reads object-store
    * blobs alongside the row.
    */
  def attachMedia(docs: DataFrame): DataFrame = {
    // NULL text coalesces to an empty payload: a null would propagate
    // into media/n_bytes, break MediaRecord's primitive Long fields at
    // encode time, and NPE inside the codec's executor task — an empty
    // media row (0 blocks, 0 bytes) is the defined answer instead.
    val txt = coalesce(col("text"), lit(""))
    docs.select(
      col("doc_id"),
      lit("fake/raw").as("fmt"),
      octet_length(encode(txt, "UTF-8")).cast("long").as("n_bytes"),
      encode(txt, "UTF-8").as("media"))
  }

  /** Partition-batched feature extraction over the media Dataset. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (nBlocks, meanByte, firstBlockMean) = FakeCodec.decode(rec.media)
        MediaFeatures(rec.doc_id, rec.n_bytes, nBlocks, meanByte, firstBlockMean)
      }
    }
  }

  /** One voice-activity segment of an audio payload. */
  final case class AudioSegment(
      doc_id: Long, seg_idx: Long, start_f: Long, end_f: Long,
      n_frames: Long, mean_energy: Double)

  /** VAD-style segmentation: the audio-curation step that cuts a long
    * recording into voiced spans before transcription/feature work.
    * The payload is framed into FakeCodec.BlockSize-byte windows, each
    * frame's "energy" is its mean byte value, and a segment is a maximal
    * run of consecutive frames at or above the activity threshold —
    * classic energy-gated VAD with the decoder stubbed (a real deploy
    * swaps the byte means for spectral energy; the framing, run
    * detection and per-segment stats are the real pipeline). Activity
    * compares in INTEGERS (frameSum >= threshold * frameLen), so the
    * gate is bit-exact against any SQL replay — no float threshold
    * ambiguity. Segmentation happens INSIDE the per-row decode pass
    * (audio files are one row each), so the 1-row -> n-segment fan-out
    * needs no shuffle and per-row state is one open run. Docs with no
    * active frame emit nothing.
    */
  def segmentAudio(spark: SparkSession, media: DataFrame,
      threshold: Long = 96L): Dataset[AudioSegment] = {
    import spark.implicits._
    val block = FakeCodec.BlockSize
    media.as[MediaRecord].flatMap { rec =>
      val m = rec.media
      val nFrames = (m.length + block - 1) / block
      val out = scala.collection.mutable.ArrayBuffer[AudioSegment]()
      var segStart = -1L
      var segSum = 0L
      var segLen = 0L
      var f = 0
      while (f < nFrames) {
        val lo = f * block
        val hi = math.min(m.length, lo + block)
        var s = 0L
        var i = lo
        while (i < hi) { s += m(i) & 0xff; i += 1 }
        val len = hi - lo
        if (s >= threshold * len) {
          if (segStart < 0) { segStart = f; segSum = 0L; segLen = 0L }
          segSum += s; segLen += len
        } else if (segStart >= 0) {
          out += AudioSegment(rec.doc_id, out.length + 1L, segStart,
            f - 1L, f - segStart, segSum.toDouble / segLen.toDouble)
          segStart = -1L
        }
        f += 1
      }
      if (segStart >= 0)
        out += AudioSegment(rec.doc_id, out.length + 1L, segStart,
          nFrames - 1L, nFrames - segStart,
          segSum.toDouble / segLen.toDouble)
      out
    }
  }
}
