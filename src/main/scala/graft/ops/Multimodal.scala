package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.functions.Sim

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with a typed metadata struct; decode / feature-extract /
 * resize / frame-sample are per-batch transforms.
 *
 * ALL THREE modalities decode from real containers: image payloads are
 * genuine PNG bytes decoded by a full javax.imageio raster decode
 * (ImageCodec), audio payloads are genuine PCM WAV bytes decoded by a full
 * javax.sound.sampled PCM read (AudioCodec), and video payloads are genuine
 * spec-layout AVI containers parsed by a real RIFF chunk walker
 * (VideoCodec) — dimensions, sample rates, frame counts and codec ids are
 * read back from the bytes, not derived. The one remaining stand-in is
 * video FRAME PIXEL decode (the JDK ships no video frame codec; a real
 * deployment plugs ffmpeg in at VideoCodec.decode) and the feature
 * embedding ([[featureStub]], the stand-in for an ML model).
 */
object Multimodal {

  /** Typed metadata schema carried beside every binary payload. */
  val metaSchema = "STRUCT<modality: STRING, width: INT, height: INT, " +
    "sample_rate: INT, n_frames: INT, codec: STRING>"

  /**
   * Deterministic fake feature vector (dim floats) from payload bytes —
   * stands in for an image/audio embedding model. Sequential fold keeps it
   * bit-stable at any parallelism.
   */
  def featureStub(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(2000L)).cast("double") / 1000.0 - 1.0)
        .cast("float"))

  /** Resize: metadata-level transform (real impl would re-encode payload). */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast("double")
    val h = meta.getField("height").cast("double")
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(w, h))
    struct(
      meta.getField("modality").as("modality"),
      // floor (not round): identical across engines — SQL round() tie-break
      // conventions differ (HALF_UP vs banker's), floor never ties
      floor(w * scale).cast("int").as("width"),
      floor(h * scale).cast("int").as("height"),
      meta.getField("sample_rate").as("sample_rate"),
      meta.getField("n_frames").as("n_frames"),
      meta.getField("codec").as("codec"))
  }

  /** Uniform frame sampling: emit one row per sampled frame index. */
  def sampleFrames(df: DataFrame, metaCol: String, every: Int): DataFrame =
    df.withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(coalesce(col(metaCol).getField("n_frames"), lit(1)) - 1, lit(0)),
          lit(every))))

  /**
   * End-to-end multimodal prep over a corpus: attach payloads (here derived
   * deterministically from doc text — the generator analog of a WARC binary
   * column), decode, extract features, resize. The shape of this pipeline —
   * binary in, (meta, features) out, all per-row in the scan stage — is the
   * 100 TB-ready contract.
   */
  def prepare(docs: DataFrame, idCol: String, textCol: String, dim: Int = 16): DataFrame = {
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(xxhash64(col(idCol)), lit(3L)) + 1).cast("int"))
    docs.select(col(idCol), col(textCol))
      .withColumn("modality", modality)
      // every modality carries REAL container bytes: PNG / PCM WAV / AVI
      .withColumn("payload",
        when(col("modality") === "image", png_encode(xxhash64(col(idCol))))
          .when(col("modality") === "audio", wav_encode(xxhash64(col(idCol))))
          .otherwise(avi_encode(xxhash64(col(idCol)))))
      // metadata comes from REAL decodes/parses of the payload bytes —
      // dimensions, sample rate, frame count and codec are read back from
      // the container, not derived (javax.imageio / javax.sound.sampled /
      // the VideoCodec RIFF walker)
      .withColumn("meta", {
        val dec = image_decode(col("payload"))
        val adec = audio_decode(col("payload"))
        val vdec = video_decode(col("payload"))
        when(col("modality") === "image", struct(
          col("modality").as("modality"),
          dec.getField("width").as("width"),
          dec.getField("height").as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("int").as("n_frames"),
          dec.getField("codec").as("codec")))
          .when(col("modality") === "audio", struct(
            col("modality").as("modality"),
            lit(null).cast("int").as("width"),
            lit(null).cast("int").as("height"),
            adec.getField("sample_rate").as("sample_rate"),
            adec.getField("n_frames").as("n_frames"),
            adec.getField("codec").as("codec")))
          .otherwise(struct(
            col("modality").as("modality"),
            vdec.getField("width").as("width"),
            vdec.getField("height").as("height"),
            lit(null).cast("int").as("sample_rate"),
            vdec.getField("n_frames").as("n_frames"),
            vdec.getField("codec").as("codec")))
      })
      .withColumn("features", featureStub(col("payload"), dim))
      .withColumn("meta_resized", resizeMeta(col("meta"), 512))
      .drop(textCol)
  }
}
