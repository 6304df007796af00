package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video as
  * opaque `binary` with typed metadata, plus decode / feature-extract /
  * resize / frame-sample operators.
  *
  * The Spark-side plumbing is real and tested — schema, partition-balanced
  * batched execution (`mapPartitions` + `grouped(batchSize)`, the JVM
  * analogue of a Pandas-UDF batch), explode-to-frame grain — while the
  * decode kernels are STUBS: deterministic byte-level fakes standing in for
  * image/audio codecs this container doesn't ship. A real kernel (JNI
  * ffmpeg, DJL, ONNX vision model) replaces only the function body marked
  * `// STUB KERNEL`; batch shape and dataflow stay.
  *
  * Scale: decode cost dominates at 100 TB — rows are salted across
  * partitions by media_id (no skew from per-source file ordering), batches
  * amortize model/codec init, and frames explode AFTER the per-media
  * filter so only sampled frames materialize.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int,
                             n_frames: Int)
  final case class MediaRow(media_id: Long, modality: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, modality: String,
                                 features: Array[Float], n_bytes: Long,
                                 content_md5: String)
  final case class Frame(media_id: Long, frame_idx: Int,
                         frame_bytes: Array[Byte])

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** STUB KERNEL: 16-bin byte histogram, L1-normalized — deterministic
    * stand-in for an image/audio embedding model. Replace with a real
    * decoder+encoder; the signature (batch of byte arrays → batch of float
    * vectors) is the real contract.
    */
  private def fakeEmbedBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { b =>
      val hist = new Array[Float](16)
      b.foreach(x => hist((x & 0xff) / 16) += 1f)
      val n = math.max(b.length, 1).toFloat
      hist.map(_ / n)
    }

  /** Decode + feature-extract, batched: one kernel instance per partition,
    * inputs fed in `batchSize` groups (the batch shape a vectorized /
    * Pandas-UDF kernel needs).
    */
  def decodeFeatures(media: Dataset[MediaRow],
                     batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val feats = fakeEmbedBatch(batch.map(_.bytes))
        batch.lazyZip(feats).map { (row, f) =>
          MediaFeatures(row.media_id, row.modality, f,
            row.bytes.length.toLong, md5hex(row.bytes))
        }
      }
    }
  }

  /** STUB KERNEL: "resize" = stride-subsample bytes to w·h (a real impl
    * decodes, resamples pixels, re-encodes). Deterministic, shape-correct.
    */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { row =>
      val target = math.max(w * h, 1)
      val stride = math.max(row.bytes.length / target, 1)
      val out = row.bytes.indices.by(stride).take(target)
        .map(row.bytes).toArray
      row.copy(bytes = out, meta = row.meta.copy(width = w, height = h))
    }
  }

  /** Frame sampling for video rows: split bytes into meta.n_frames chunks,
    * keep every `everyN`-th (sampling BEFORE explode — only kept frames
    * ever materialize). Non-video rows pass through as frame 0.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      if (row.modality != "video" || row.meta.n_frames <= 1)
        Seq(Frame(row.media_id, 0, row.bytes))
      else {
        val n = row.meta.n_frames
        val size = math.max(row.bytes.length / n, 1)
        (0 until n by everyN).map { i =>
          Frame(row.media_id, i,
            row.bytes.slice(i * size, math.min((i + 1) * size, row.bytes.length)))
        }
      }
    }
  }

  /** Balance decode work across the cluster regardless of input file
    * layout (media files arrive grouped by source — hash-repartition by id
    * before the expensive kernel).
    */
  def balanced(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartition(partitions, col("media_id"))
}
