package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded/feature-extracted in distributed batch
  * passes.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE decode (byte statistics instead of
  * pixel decode). Everything around it — the binary column, the metadata
  * struct, the typed Dataset batch shape, the per-partition execution, the
  * partitioning — is the real at-scale plumbing: swap `decodeStub`'s body
  * for an actual codec and nothing else changes. This mirrors how a
  * Python stack would run codecs via `mapInPandas` batches; in Scala the
  * same shape is `Dataset.mapPartitions` over case-class batches.
  */
object MediaOps {

  /** One media record entering the decode stage. */
  final case class MediaBlob(doc_id: Long, fmt: String, n_bytes: Int, payload: Array[Byte])

  /** Decoded features leaving it. */
  final case class MediaFeature(
      doc_id: Long, fmt: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      mean_byte: Double, byte_entropy: Double)

  /** STUB DECODE — deterministic fake. A real deployment replaces the
    * body with an actual image/audio decode; signature and batch shape
    * stay identical. */
  def decodeStub(b: MediaBlob): MediaFeature = {
    val bytes = b.payload
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < bytes.length) { val v = bytes(i) & 0xff; hist(v) += 1; sum += v; i += 1 }
    val n = math.max(1, bytes.length)
    var ent = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) { val p = hist(j).toDouble / n; ent -= p * math.log(p) / math.log(2) }
      j += 1
    }
    // fake "image" geometry derived from payload size; fake frame sampling
    // at one frame per 256 bytes — stands in for fps-based sampling.
    val width = 16 + (bytes.length % 64)
    val height = math.max(1, bytes.length / math.max(1, width))
    MediaFeature(b.doc_id, b.fmt, bytes.length, width, height,
      n_frames = bytes.length / 256 + 1,
      mean_byte = sum.toDouble / n,
      byte_entropy = ent)
  }

  /** q28: binary media pipeline — documents' text bytes standing in for
    * media payloads (binary column + metadata struct), decoded per
    * partition in one narrow pass (no shuffle), features rounded for
    * stable output. The DuckDB oracle recomputes the byte statistics
    * (mean, histogram entropy, fake geometry) from the same bytes
    * (ASCII text ⇒ codepoints == UTF-8 bytes). */
  def q28MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), lit("txt-raw").as("fmt"),
        length(col("text")).cast("int").as("n_bytes"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaBlob]
    blobs.mapPartitions(_.map(decodeStub)).toDF()
      .select(col("doc_id"), col("fmt"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"),
        round(col("mean_byte"), 6).as("mean_byte"),
        round(col("byte_entropy"), 6).as("byte_entropy"))
  }

  val q28Sql: String = {
    import SqlKernels._
    s"""WITH base AS (SELECT doc_id, length(text) AS n FROM documents),
       |codes AS (SELECT doc_id, unnest(${charCodes("text")}) AS c FROM documents),
       |stats AS (SELECT doc_id, sum(c) AS sumc FROM codes GROUP BY doc_id),
       |byc AS (SELECT doc_id, c, count(*) AS cnt FROM codes GROUP BY doc_id, c),
       |ent AS (
       |  SELECT doc_id,
       |    sum(-(cnt::DOUBLE / b.n) * ln(cnt::DOUBLE / b.n) / ln(2::DOUBLE)) AS e
       |  FROM byc JOIN base b USING (doc_id) GROUP BY doc_id)
       |SELECT b.doc_id, 'txt-raw' AS fmt, b.n AS n_bytes,
       |  16 + b.n % 64 AS width,
       |  greatest(1, b.n // (16 + b.n % 64)) AS height,
       |  b.n // 256 + 1 AS n_frames,
       |  round(coalesce(s.sumc, 0)::DOUBLE / greatest(b.n, 1), 6) AS mean_byte,
       |  round(coalesce(ent.e, 0.0), 6) AS byte_entropy
       |FROM base b LEFT JOIN stats s USING (doc_id) LEFT JOIN ent USING (doc_id)""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_media_features" -> (q28MediaFeatures _)
  )

  val oracles: Map[String, String] = Map(
    "q28_media_features" -> q28Sql
  )
}
