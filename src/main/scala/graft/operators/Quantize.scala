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

  /** L2-normalize a vector (zero vectors stay zero). The norm is the
    * deterministic left-fold form ([[Knn.norm]]), so the whole transform
    * replays cross-engine. */
  def l2Normalize(vec: Column): Column = {
    val n = Knn.norm(vec)
    when(n === 0.0, transform(vec, x => x.cast("double")))
      .otherwise(transform(vec, x => x.cast("double") / n))
  }

  /** Matryoshka truncation audit (Kusupati et al. 2022): per vector, the
    * full norm, the norm of the leading `d` dims, and the energy ratio
    * (norm_d^2 / norm^2) — how much of the vector's mass the truncated
    * prefix keeps, which is the whole premise of serving shorter
    * embeddings. Left-fold norms, single-op divisions: hash-verifiable.
    * Output: (idCol, norm, norm_d, energy_ratio). */
  def matryoshkaAudit(df: DataFrame, idCol: String, vecCol: String,
                      d: Int): DataFrame = {
    require(d >= 1, "matryoshkaAudit: d >= 1")
    val n = Knn.norm(col(vecCol))
    val nd = Knn.norm(slice(col(vecCol), 1, d))
    df.select(col(idCol), round(n, 6).as("norm"),
      round(nd, 6).as("norm_d"),
      round(when(n === 0.0, 0.0).otherwise((nd * nd) / (n * n)), 6)
        .as("energy_ratio"))
  }

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
