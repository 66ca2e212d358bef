package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage — the
  * standard 4x compression for 100 TB vector corpora (float32 → int8 +
  * one float scale per vector). Quantized vectors feed the same ANN
  * operators after [[dequantize]]; recall loss is bounded by the
  * per-element reconstruction error scale/2 (QuantizeSpec measures
  * top-k recall on the planted corpus).
  *
  * Pure Column expressions (per-row transform — embarrassingly parallel,
  * no shuffle). Deterministic and engine-portable: scale and errors are
  * double arithmetic with max/abs (order-independent), so the whole
  * pipeline replays in SQL (q74).
  */
object Quantize {

  private def xd(x: Column): Column = x.cast("double")

  /** Per-vector symmetric scale: max|x| / 127 (0 for empty/zero vectors). */
  def scaleOf(vec: Column): Column =
    coalesce(array_max(transform(vec, x => abs(xd(x)))), lit(0.0)) / 127.0

  /** Quantize to int8 codes: round(x / scale) in [-127, 127]; zero/empty
    * vectors quantize to all-zero codes. */
  def quantize(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0).cast("int")))
      .otherwise(transform(vec, x => round(xd(x) / scale).cast("int")))

  /** Reconstruct doubles from codes: q * scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Quantization quality frame: per vector, the scale and the maximum
    * absolute reconstruction error over dimensions (max is
    * order-independent — cross-engine comparable, unlike a sum).
    * Output: (idCol, scale, max_err). */
  def reconstructionError(df: DataFrame, idCol: String,
                          vecCol: String): DataFrame = {
    val s = scaleOf(col(vecCol))
    val codes = quantize(col(vecCol), s)
    val err = array_max(zip_with(col(vecCol), dequantize(codes, s),
      (x, r) => abs(xd(x) - r)))
    df.select(col(idCol), round(s, 6).as("scale"),
      round(coalesce(err, lit(0.0)), 6).as("max_err"))
  }
}
