package graft

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the 10x timing study (VERDICT r9 item 1): writes
  * an sf1-shaped copy of a testdata directory by replicating every table
  * `replicas` times with join-consistent key shifts, so per-family scaling
  * exponents can be MEASURED instead of asserted. The driver's testdata is
  * read-only and fixed at sf<=0.1; this tool derives a larger slice from it
  * without touching it.
  *
  * Design constraints, in order:
  *
  *  1. **Join integrity.** Every foreign key shifts by the SAME per-replica
  *     stride as its primary key (o_custkey with c_custkey, l_orderkey with
  *     o_orderkey, vec_id with doc_id — the suite joins documents to
  *     embeddings on doc_id = vec_id, so the two share one stride). Join
  *     selectivities and per-key fan-outs are therefore EXACTLY those of
  *     the source, replicated: the realistic "same distribution, 10x the
  *     rows" model.
  *  2. **Replica 0 is bit-identical to the source**, so fixture-planted
  *     structures queries rely on (vec_id = 0 probes, doc_id modulus
  *     plantings) still exist.
  *  3. **Cross-replica content must NOT collide.** Naive row replication
  *     would give every document 10 exact copies — dedup/LSH bucket joins
  *     would then grow QUADRATICALLY in the replica count, which is not
  *     how a 10x-larger real corpus behaves. Replica r>0 text goes through
  *     a per-replica alphabet rotation (`translate`, a bijection): every
  *     word changes, so no word shingle, token hash, or signature collides
  *     across replicas, while WITHIN a replica all token-level structure —
  *     duplicate groups, shingle sets, lengths (translate preserves
  *     length, so n_chars stays consistent), frequencies — is preserved
  *     exactly. Known caveat, documented in docs/PLANS_r10.md: rotated
  *     text defeats STOPWORD- and LETTER-CLASS-based heuristics (quality
  *     scores, language ID), so gates keyed on those see replica-0-like
  *     selectivity only on replica 0; families behind such gates get a
  *     conservative (under-) estimate of downstream growth, never a
  *     spurious super-linear one.
  *  4. **Embeddings decorrelate across replicas under a per-replica
  *     ORTHOGONAL transform** (circular shift + fixed sign pattern):
  *     within-replica cosines and norms are preserved exactly (the
  *     transform is the same rigid motion for every vector of the
  *     replica), so LSH/IVF bucket geometry replicates; across replicas
  *     the rotated copies are as uncorrelated as the near-orthogonal base
  *     vectors themselves, so ANN candidate lists grow linearly — the
  *     density growth a 10x corpus in a fixed embedding space shows.
  *
  * Usage: `runMain graft.ScaleData <srcDir> <outDir> [replicas=10]`
  * (defaults: /root/testdata/sf0.1 -> target/scaledata/sf1 x10).
  */
object ScaleData {

  /** Per-replica bijective text rotation: letters and digits each rotate
    * by r within their class. Length-preserving; identity at r=0. */
  def rotateText(text: Column, r: Int): Column = {
    if (r == 0) text
    else {
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      def rot(s: String, k: Int): String = {
        val n = s.length; val m = ((k % n) + n) % n; s.drop(m) + s.take(m)
      }
      translate(text, lower + upper + digits,
        rot(lower, r) + rot(upper, r) + rot(digits, r))
    }
  }

  /** Heaps-law text mode (VERDICT r11 item 3): replica r>0 maps each
    * space-separated token w to rotate(w, g) with g = xxhash64(w, r) mod
    * 3 — a per-replica token map into the 3-shift pool {rot(w,0),
    * rot(w,1), rot(w,2)} (injective for any natural vocabulary: two
    * different words land on the same string only if one is the other's
    * exact alphabet rotation). Corpus-wide distinct-token vocabulary
    * then grows ~x3 at x10 rows — the Heaps-law beta~0.5 a real corpus
    * shows — instead of the default rotation's x10 (the measured 31->310
    * artifact that made every vocabulary-coupled family read
    * superlinear). Unlike a fixed shared-subset rotation, the shift is
    * drawn per (token, replica): two replicas of the same base doc agree
    * on only ~1/3 of token positions, so no cross-replica NEAR-DUP
    * structure is planted (a char-k-gram window survives two replicas
    * with prob ~3^-2 per spanned token — dedup/LSH families still see
    * ~disjoint content, though they are measured under the DEFAULT mode,
    * which guarantees it). Token boundaries: the corpus is single-space
    * separated (TESTDATA.md); split(-1)+array_join preserves leading/
    * trailing empties, so byte layout outside rotated tokens is intact.
    * Identity at r=0 (replica 0 stays bit-identical to the source). */
  def heapsRotateText(text: Column, r: Int): Column =
    if (r == 0) text
    else array_join(
      transform(split(text, " ", -1), t => {
        val g = pmod(xxhash64(t, lit(r)), lit(3L))
        when(g === 1L, rotateText(t, 1))
          .when(g === 2L, rotateText(t, 2))
          .otherwise(t)
      }),
      " ")

  /** Per-replica orthogonal embedding transform: circular-shift the
    * coordinates by (r * 23) mod dim, then flip the sign of every
    * coordinate where (i + r) mod 3 == 0. Both operations are applied
    * identically to every vector of the replica, so all pairwise dot
    * products and norms within a replica are unchanged. Identity at r=0. */
  def rotateEmbedding(v: Column, dim: Int, r: Int): Column = {
    if (r == 0) v
    else {
      val p = (r * 23) % dim
      val shifted =
        if (p == 0) v
        else concat(slice(v, p + 1, dim - p), slice(v, 1, p))
      // transform's index lambda is 0-based
      zip_with(shifted, sequence(lit(0), lit(dim - 1)),
        (x, i) => when(pmod(i + lit(r), lit(3)) === 0, -x).otherwise(x))
    }
  }

  private def shiftKeys(df: DataFrame, r: Int,
                        shifts: Map[String, Long]): DataFrame =
    shifts.foldLeft(df) { case (d, (c, stride)) =>
      d.withColumn(c, col(c) + lit(r * stride))
    }

  /** One scaled table: the union of `replicas` key-shifted (and, for
    * text/embedding columns, content-rotated) copies of the source. */
  def scaledTable(src: DataFrame, name: String, replicas: Int,
                  strides: Map[String, Long],
                  textMode: String = "rotate"): DataFrame = {
    require(textMode == "rotate" || textMode == "heaps",
      s"textMode must be rotate|heaps (got $textMode)")
    def keyShifts(cols: (String, String)*): Map[String, Long] =
      cols.toMap.map { case (c, s) => c -> strides(s) }
    val shifts: Map[String, Long] = name match {
      case "region" | "nation" => Map.empty
      case "customer" => keyShifts("c_custkey" -> "cust")
      case "supplier" => keyShifts("s_suppkey" -> "supp")
      case "part"     => keyShifts("p_partkey" -> "part")
      case "orders"   => keyShifts("o_orderkey" -> "order", "o_custkey" -> "cust")
      case "lineitem" => keyShifts("l_orderkey" -> "order",
        "l_partkey" -> "part", "l_suppkey" -> "supp")
      case "events"   => keyShifts("event_id" -> "event", "user_id" -> "user")
      case "documents" => keyShifts("doc_id" -> "doc")
      case "embeddings" => keyShifts("vec_id" -> "doc")
      case other => sys.error(s"unknown table $other")
    }
    if (shifts.isEmpty) src // fixed-size dimensions do not scale with SF
    else {
      val dim = if (name == "embeddings")
        src.select(size(col("embedding"))).first().getInt(0) else 0
      (0 until replicas).map { r =>
        val shifted = shiftKeys(src, r, shifts)
        name match {
          case "documents" =>
            shifted.withColumn("text",
              if (textMode == "heaps") heapsRotateText(col("text"), r)
              else rotateText(col("text"), r))
          case "embeddings" =>
            shifted.withColumn("embedding",
              rotateEmbedding(col("embedding"), dim, r)
                .cast("array<float>"))
          case _ => shifted
        }
      }.reduce(_ unionByName _)
    }
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "target/scaledata/sf1"
    val replicas = if (args.length > 2) args(2).toInt else 10
    val textMode = if (args.length > 3) args(3) else "rotate"
    // r = 10 would rotate digits onto themselves (identity mod 10) and
    // digit-only tokens would collide across replicas — exactly the
    // quadratic bucket growth the rotation exists to prevent. Tokens with
    // no [a-zA-Z0-9] characters are likewise never rotated; the driver
    // corpus has none, but a different corpus should check before trusting
    // cross-replica disjointness.
    require(replicas >= 1 && replicas <= 10,
      s"replicas must be in 1..10 (got $replicas): rotation is only " +
        "collision-free while r < 10 for digits and r < 26 for letters")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Engine.localSession(cpus, "graft-scaledata")

    def mx(name: String, key: String): Long =
      Tables.load(spark, srcDir, name).agg(max(col(key))).first().getLong(0)
    // stride = max(key)+1 so shifted replicas can never collide; documents
    // and embeddings SHARE a stride because the suite joins doc_id = vec_id
    val strides = Map(
      "cust" -> (mx("customer", "c_custkey") + 1),
      "supp" -> (mx("supplier", "s_suppkey") + 1),
      "part" -> (mx("part", "p_partkey") + 1),
      "order" -> (mx("orders", "o_orderkey") + 1),
      "event" -> (mx("events", "event_id") + 1),
      "user" -> (mx("events", "user_id") + 1),
      "doc" -> (math.max(mx("documents", "doc_id"),
        mx("embeddings", "vec_id")) + 1))

    Tables.names.foreach { name =>
      val src = Tables.load(spark, srcDir, name)
      val out = scaledTable(src, name, replicas, strides, textMode)
      // a handful of similar-size files per table: enough write/read
      // parallelism at this scale without a small-file spray
      val parts = name match {
        case "lineitem" | "events" => 16
        case "region" | "nation" => 1
        case _ => 8
      }
      out.repartition(parts)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
      val n = spark.read.parquet(s"$outDir/$name.parquet").count()
      println(s"[scaledata] $name: ${src.count()} -> $n rows ($replicas replicas)")
    }
    println(s"[scaledata] wrote $outDir")
    spark.stop()
  }
}
