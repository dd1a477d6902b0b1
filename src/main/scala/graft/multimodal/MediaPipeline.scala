package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata, processed in per-partition batches.
  *
  * The container has no media codecs, so [[decodeStub]] is a
  * DETERMINISTIC FAKE (clearly marked) standing in for e.g. a JPEG
  * decoder — what is real and tested here is the Spark-side shape:
  *  - schema: payload `BinaryType` + `media_meta` struct column;
  *  - execution: `mapPartitions` so a real decoder amortizes per-batch
  *    init (codec contexts, model weights) across the partition —
  *    the Scala twin of `mapInPandas` batch processing;
  *  - partitioning: narrow (no shuffle), preserves parent partitioning;
  *  - frame sampling / resize as binary→binary transforms with the same
  *    batch shape.
  *
  * Scale notes (100 TB of media): payloads stay in executors end-to-end
  * (no driver collect); decode parallelism = input partitions; payload
  * columns should be pruned before wide shuffles (select meta, join,
  * re-attach by key).
  */
object MediaPipeline {

  case class MediaMeta(format: String, width: Int, height: Int, nFrames: Int)

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("nFrames", IntegerType, nullable = false)))

  /** Attach a synthetic binary payload derived from row content — the
    * stand-in for reading real media bytes from a blob store. */
  def withPayload(df: DataFrame, contentCol: String): DataFrame =
    df.withColumn("media", unhex(md5(col(contentCol))))

  /** ??? REAL DECODER GOES HERE ??? — deterministic fake: derives
    * "dimensions" from the payload bytes. A production build links an
    * actual codec and keeps this exact signature. */
  def decodeStub(bytes: Array[Byte]): MediaMeta = {
    def u(i: Int): Int = bytes(i % bytes.length) & 0xff
    MediaMeta(
      format = if (u(0) % 2 == 0) "img" else "vid",
      width = 256 + (u(1) << 2),
      height = 256 + (u(2) << 2),
      nFrames = 1 + u(3) % 30)
  }

  /** Decode metadata for every row, per-partition batches. Output =
    * input columns + `media_meta` struct. Narrow transform: partitioning
    * and row order are preserved; decoder init amortizes per partition.
    */
  def extractMeta(df: DataFrame, binCol: String = "media"): DataFrame = {
    val schema = df.schema.add("media_meta", metaSchema, nullable = false)
    val idx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      // per-partition init happens HERE exactly once (codec context,
      // model weights, …) — the point of the mapPartitions batch shape
      it.map { r =>
        val m = decodeStub(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(m.format, m.width, m.height, m.nFrames))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Binary→binary transform with the same batch shape: "resize" keeps
    * the first `maxBytes` of the payload (fake; real impl re-encodes). */
  def resizeStub(df: DataFrame, maxBytes: Int, binCol: String = "media"): DataFrame =
    df.withColumn(binCol,
      expr(s"substring($binCol, 1, $maxBytes)").cast(BinaryType))

  /** "Frame sampling": split the payload into fixed-size frames and keep
    * every `stride`-th — exercises array-of-binary columns. */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int,
      binCol: String = "media"): DataFrame = {
    val nFrames = floor((length(col(binCol)) - 1) / lit(frameBytes)).cast("int")
    // empty/null payload guard: nFrames would be -1 and sequence(0,-1)
    // yields a DESCENDING [0,-1] — a ghost empty frame instead of none
    df.withColumn("frames",
      when(col(binCol).isNull || length(col(binCol)) === 0,
        array().cast("array<binary>"))
        .otherwise(filter(
          transform(
            sequence(lit(0), nFrames),
            i => call_function("substring", col(binCol),
              i * frameBytes + 1, lit(frameBytes))),
          (_, i) => i % stride === 0)))
  }
}
