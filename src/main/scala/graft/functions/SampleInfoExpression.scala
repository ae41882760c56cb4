package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SAMPLE_INFO(payload): per-sample container metadata for a binary
  * multimodal column — the engine's form of the reference's
  * `sample_info` tensor property (`cpp/tql/tensor_property.hpp:7-12`,
  * surfaced per-sample in python as `sample.sample_info`).
  *
  * Detection order image -> WAV -> MP4 -> NIfTI -> DICOM -> PLY -> STL
  * over the real byte headers (graft.sources.Multimodal parsers — no
  * codec library, pure header walks; medical htypes per
  * `cpp/base/htype.hpp:16-17`, mesh/point_cloud per
  * `cpp/base/htype.hpp:26,35` with the reference's ply/stl
  * compressions, `cpp/codecs/compression.hpp:31-32`).
  * The struct carries the union of the modality fields; fields a
  * format doesn't define are null. Unknown payloads yield
  * format="unknown" with all-null fields rather than failing the batch.
  *
  * CodegenFallback, deliberately: header parsing is per-sample metadata
  * extraction (the reference PRECOMPUTES sample_info at ingest), not a
  * hot query loop — correctness and bounded work matter, codegen does
  * not.
  */
case class SampleInfo(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = SampleInfo.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"SAMPLE_INFO expects a binary payload column, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    val (imgFmt, w, h) = graft.sources.Multimodal.parseImageHeader(b)
    if (imgFmt != "unknown")
      InternalRow(UTF8String.fromString(imgFmt), w, h, null, null, null,
        null, null, null, null, null)
    else {
      val (audFmt, ch, rate, _, frames) = graft.sources.Multimodal.parseAudioHeader(b)
      if (audFmt != "unknown")
        InternalRow(UTF8String.fromString(audFmt), null, null, ch, rate,
          if (rate > 0 && frames > 0) frames.toDouble / rate else null,
          null, null, null, null, null)
      else {
        val (brand, dur, vw, vh) = graft.sources.Multimodal.parseMp4(b)
        if (brand != "unknown")
          InternalRow(UTF8String.fromString(brand),
            if (vw >= 0) vw else null, if (vh >= 0) vh else null,
            null, null, dur, null, null, null, null, null)
        else {
          val m = {
            val n = graft.sources.Multimodal.parseNifti(b)
            if (n._1 != "unknown") n else graft.sources.Multimodal.parseDicom(b)
          }
          if (m._1 != "unknown")
            InternalRow(UTF8String.fromString(m._1),
              if (m._3 >= 0) m._3 else null, if (m._4 >= 0) m._4 else null,
              null, null, null,
              if (m._5 >= 0) m._5 else null,
              if (m._6 >= 0) m._6 else null,
              if (m._2.nonEmpty) UTF8String.fromString(m._2) else null,
              null, null)
          else {
            val g = {
              val p = graft.sources.Multimodal.parsePly(b)
              if (p._1 != "unknown") p else graft.sources.Multimodal.parseStl(b)
            }
            if (g._1 != "unknown")
              InternalRow(UTF8String.fromString(g._1),
                null, null, null, null, null, null, null, null,
                if (g._3 >= 0) g._3 else null,
                if (g._4 >= 0) g._4 else null)
            else {
              // last: document/compressed containers by magic — format
              // always; PDF page count rides the `depth` field
              val (cf, pages) = graft.sources.Multimodal.parseContainer(b)
              InternalRow(UTF8String.fromString(cf),
                null, null, null, null, null,
                if (cf == "pdf" && pages >= 0) pages else null,
                null, null, null, null)
            }
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SampleInfo =
    copy(child = newChild)
}

object SampleInfo {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration", DoubleType, nullable = true),
    // medical (NIfTI/DICOM) fields: slice/frame depth, stored bit
    // width, DICOM modality code (CT/MR/...); PDF payloads reuse
    // `depth` for their page count
    StructField("depth", IntegerType, nullable = true),
    StructField("bits", IntegerType, nullable = true),
    StructField("modality", StringType, nullable = true),
    // geometry (PLY/STL mesh & point-cloud) fields
    StructField("vertices", LongType, nullable = true),
    StructField("faces", LongType, nullable = true)))
}
