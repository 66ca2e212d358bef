package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.expr.CleaningRules
import graft.operators.Upsert

/** ScalaCheck-generated properties (SURVEY §5.2-3): cleaning idempotence,
  * quality score bounds, upsert idempotence, dedup keep-first stability
  * under repartitioning. Generators are sampled with a fixed seed and run
  * batched through one DataFrame per property to keep Spark round-trips
  * bounded (no scalatestplus bridge in the offline cache). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], n: Int): List[T] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  /** ANSI mode throws on decimal overflow, so out-of-domain fees map to
    * null before the canonical DECIMAL(15,2) cast. */
  private def decimalFee(v: org.apache.spark.sql.Column) =
    when(abs(v) < 1e12, v).cast("decimal(15,2)").cast("string")

  private val dirtyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr,
    Gen.oneOf("", "  ", "NULL", "₹1,2 3.4", "-0.0", "99999999999", "a-b c"),
    Gen.listOfN(3, Gen.alphaNumChar).map(_.mkString(" ")))

  test("cleaning is idempotent: clean(clean(x)) == clean(x)") {
    val samples = sample(dirtyString, 200)
    val df = samples.toDF("v")
    // fee re-cleans through its canonical pipeline form, DECIMAL(15,2) —
    // raw double-to-string would print huge values in scientific notation,
    // whose 'E' gets stripped on re-cleaning (the reference has the same
    // behavior for floats >= 1e16: str() goes scientific)
    val once = df.select(
      CleaningRules.standardizeStudentId(col("v")).value.as("sid"),
      CleaningRules.cleanName(col("v")).value.as("name"),
      CleaningRules.validateEmail(col("v")).value.as("email"),
      CleaningRules.standardizePhone(col("v")).value.as("phone"),
      decimalFee(CleaningRules.cleanNumeric(col("v")).value).as("fee"))
    val twice = once.select(
      CleaningRules.standardizeStudentId(col("sid")).value.as("sid"),
      CleaningRules.cleanName(col("name")).value.as("name"),
      CleaningRules.validateEmail(col("email")).value.as("email"),
      // phone re-cleaning: "+91-XXXXXXXXXX" has 12 digits starting 91 ->
      // normalizes to itself (the reference's 12-digit branch)
      CleaningRules.standardizePhone(col("phone")).value.as("phone"),
      // null fee stays null: clean(junk)=null but clean(null)=0.0 by the
      // reference's missing->0.0 rule, so idempotence holds on the valid
      // domain only
      when(col("fee").isNotNull,
        decimalFee(CleaningRules.cleanNumeric(col("fee")).value)).as("fee"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("quality score is within [0,100] and equals 100 - 10*invalid") {
    val flagSets = sample(Gen.listOfN(8, Gen.oneOf(true, false)), 30)
    val df = Seq(1).toDF("x")
    val got = df.select(flagSets.zipWithIndex.map { case (flags, i) =>
      CleaningRules.qualityScore(flags.map(lit): _*).as(s"q$i")
    }: _*).head()
    flagSets.zipWithIndex.foreach { case (flags, i) =>
      val expected = math.max(0, 100 - 10 * flags.count(!_))
      assert(got.getInt(i) == expected && got.getInt(i) >= 0 && got.getInt(i) <= 100)
    }
  }

  test("upsert is idempotent and key-unique for arbitrary batches") {
    val kv: Gen[(Int, String, Int)] = for {
      k <- Gen.choose(0, 20); v <- Gen.alphaStr; ord <- Gen.choose(0, 100)
    } yield (k, v, ord)
    val existing = sample(kv, 15).toDF("k", "v", "ord")
    val batch = sample(kv, 15).toDF("k", "v", "ord")
    val existingU = Upsert.dedupLastWins(existing, Seq("k"), "ord")
    val once = Upsert.upsert(existingU, batch, Seq("k"), "ord")
    val twice = Upsert.upsert(once, batch, Seq("k"), "ord")
    assert(once.orderBy("k", "v", "ord").collect().toSeq ==
      twice.orderBy("k", "v", "ord").collect().toSeq)
    assert(once.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("keep-first dedup is stable under repartitioning") {
    val rows = (1 to 300).map(i => (i.toLong, s"text-${i % 40}"))
    val df = rows.toDF("id", "text")
    def flags(parts: Int) =
      graft.operators.Dedup.markExactDuplicates(df.repartition(parts), "text", "id")
        .orderBy("id").select("id", "is_duplicate").collect().toSeq
    assert(flags(1) == flags(7) && flags(7) == flags(32))
  }

  test("charNgrams: generated strings — count bound, width, membership") {
    val texts = sample(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.const(""), Gen.const("aaa")), 200)
    val rows = texts.toDF("t")
      .select(col("t"), graft.operators.TextOps.charNgrams(col("t"), 3).as("g"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    rows.foreach { case (t, g) =>
      assert(g.length <= math.max(t.length - 2, 0)) // distinct <= sliding count
      assert(g.forall(_.length == 3))
      assert(g.distinct.length == g.length)
      assert(g.forall(t.contains(_)))
      if (t.length >= 3) assert(g.nonEmpty)
    }
  }

  test("hll merge is commutative and idempotent over generated shards") {
    import graft.operators.Sketch
    val ids = sample(Gen.choose(0L, 5000L), 400)
    val (l, r) = ids.splitAt(200)
    val (ra, rb) = (Sketch.hllRegisters(l.toDF("v"), "v"),
      Sketch.hllRegisters(r.toDF("v"), "v"))
    def est(regs: org.apache.spark.sql.DataFrame) =
      Sketch.hllEstimate(regs, 12).collect().head.toSeq
    assert(est(Sketch.hllMerge(ra, rb)) == est(Sketch.hllMerge(rb, ra)))
    assert(est(Sketch.hllMerge(ra, ra)) == est(ra))
  }

  test("mixture allocation is exact for generated weight vectors") {
    val corpus = (1 to 2000).map(i => (i.toLong, s"s${i % 5}")).toDF("id", "src")
    // generated 5-way weight splits summing to 10000 bp
    val cuts = sample(for {
      a <- Gen.choose(1, 9996); b <- Gen.choose(1, 9997 - a)
      c <- Gen.choose(1, 9998 - a - b); d <- Gen.choose(1, 9999 - a - b - c)
    } yield Seq(a, b, c, d, 10000 - a - b - c - d), 5)
    for (ws <- cuts) {
      val weights = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val n = graft.operators.Split
        .mixtureSample(corpus, "src", "id", weights, total = 137L).count()
      assert(n == 137L, s"weights $weights drew $n != 137")
    }
  }

  test("containment: bounds in [0,1], reflexive slices score 1, monotone") {
    val words = sample(Gen.listOfN(8, Gen.oneOf(
      "red", "blue", "green", "gold", "iron", "salt", "wind", "moon"))
      .map(_.mkString(" ")), 60)
    val docs = words.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    // add a contiguous 5-word slice of every 10th doc as a planted quote
    val planted = docs.collect { case (id, t) if id % 10 == 0 =>
      (id + 1000L, t.split(" ").slice(2, 7).mkString(" "))
    }
    val df = (docs ++ planted).toDF("id", "text")
    val pairs = graft.operators.Dedup
      .containmentPairs(df, "id", "text", k = 3, threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.forall(p => p._3 >= 0.0 && p._3 <= 1.0))
    // every planted quote is fully contained in its source
    for ((qid, _) <- planted) {
      val src = qid - 1000L
      assert(pairs.exists(p => p._1 == qid && p._2 == src && p._3 == 1.0),
        s"quote $qid not contained in $src")
    }
  }

  test("span dedup conserves counts: kept <= total, distinct digests survive once") {
    val spanGen = Gen.listOfN(4, Gen.oneOf("sp a", "sp b", "sp c", "sp d", "sp e"))
    val rows = sample(spanGen, 50).zipWithIndex
      .map { case (sp, i) => (i.toLong, sp) }
    val df = rows.toDF("id", "spans")
    val out = graft.operators.Dedup
      .dropDuplicateSpans(df, "id", col("spans"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == rows.size)               // no doc rows lost
    assert(out.forall(r => r._3 <= r._2))         // kept <= total
    // total kept across the corpus == number of DISTINCT spans
    val distinctSpans = rows.flatMap(_._2).distinct.size
    assert(out.map(_._3).sum == distinctSpans.toLong)
  }

  test("encoding scrub is idempotent and its outputs carry no control bytes") {
    // random text with mojibake sequences and control bytes spliced in:
    // fix(fix(x)) == fix(x) (repaired outputs can never re-form a bad
    // sequence — no replacement emits â/Ã/Â), and the clean text is
    // control-free by construction
    val noise = Gen.oneOf(
      graft.operators.TextOps.mojibakeTable.map(_._1) ++
        Seq[String]("", "", "", "", " ", "word", "é…"))
    val gen = Gen.listOfN(6, noise).map(_.mkString("x"))
    val df = sample(gen, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = graft.operators.TextOps.fixEncoding(df, "id", "text")
    val twice = graft.operators.TextOps.fixEncoding(
      once.withColumnRenamed("text_clean", "text"), "id", "text")
    val joined = once.select(col("id"), col("text_clean").as("a"))
      .join(twice.select(col("id"), col("text_clean").as("b"),
        col("n_ctrl_removed"), col("mojibake_fixed")), "id")
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
    assert(joined.filter(col("n_ctrl_removed") =!= 0).count() == 0)
    assert(joined.filter(col("mojibake_fixed")).count() == 0)
    assert(once.filter(col("text_clean")
      .rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\x80-\\x9F]"))
      .count() == 0)
  }

  test("url host: lowercase, no separators, domain is a host suffix") {
    val gen = for {
      scheme <- Gen.oneOf("https://", "http://", "", "ftp://")
      user <- Gen.oneOf("", "u:p@", "user@")
      host <- Gen.oneOf("WWW.Ex.COM", "a.b.co.uk", "x.io", "one",
        "deep.sub.domain.org", "files.net.")
      port <- Gen.oneOf("", ":8080")
      path <- Gen.oneOf("", "/p/q?r=1#frag", "/")
    } yield scheme + user + host + port + path
    val df = sample(gen, 200).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val audited = graft.operators.UrlOps.urlAudit(df, "id", "url", Seq())
    assert(audited.filter(col("host").rlike("[/:@?#]") ||
      col("host") =!= lower(col("host")) || col("host").rlike("\\.$"))
      .count() == 0)
    // the registrable domain is always a dot-suffix of (or equal to) host
    assert(audited.filter(!col("host").endsWith(col("domain"))).count() == 0)
    assert(audited.filter(!col("domain").endsWith(col("tld"))).count() == 0)
  }

  test("line corrections: count invariants and gate consistency hold") {
    val line = Gen.oneOf("plain words in a line here", "42 07.", "loading…",
      "NAVIGATION MENU HOME", "12 likes", "good line of text", "")
    val gen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, line).map(_.mkString("\n")))
    val df = sample(gen, 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = graft.operators.TextOps.lineCorrections(df, "id", "text")
    assert(got.filter(col("n_dropped") > col("n_lines") ||
      col("n_dropped") < 0).count() == 0)
    assert(got.filter(col("keep_doc") =!= (col("drop_ratio") <= 0.2))
      .count() == 0)
    // reassembled text has exactly n_lines - n_dropped lines (when any)
    val kept = got.withColumn("n_kept",
      when(col("text_clean") === "", 0)
        .otherwise(size(split(col("text_clean"), "\n", -1))))
    assert(kept.filter(col("n_kept") =!=
      (col("n_lines") - col("n_dropped"))).count() == 0)
  }

  test("group-aware split: every pair co-located under generated pair sets") {
    val ids = (1L to 60L)
    val docs = ids.map(i => (i, s"d$i")).toDF("id", "text")
    val pairGen = for {
      a <- Gen.choose(1L, 60L); b <- Gen.choose(1L, 60L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val pairs = sample(pairGen, 25).distinct
    val got = graft.operators.Split
      .groupAwareSplit(docs, "id", pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    for ((a, b) <- pairs)
      assert(got(a) == got(b), s"pair ($a,$b) straddles splits")
  }

  test("sft assembly: turn spans PARTITION the assembled text exactly") {
    // random sessions: spans must be contiguous, non-overlapping, start
    // at 0, and their total length must equal the assembled string's
    val evGen = for {
      u <- Gen.choose(1L, 5L)
      m <- Gen.choose(0, 20 * 60) // minutes offset keeps sessions mixed
      t <- Gen.oneOf("view", "click", "signup", "purchase", "error")
    } yield (u, new java.sql.Timestamp(1700000000000L + m * 60000L), t)
    val rows = sample(evGen, 120).zipWithIndex
      .map { case ((u, ts, t), i) => (u, ts, t, i.toLong) }
    val out = graft.operators.Sessionize.sftAssemble(
        rows.toDF("user_id", "ts", "event_type", "event_id"),
        "user_id", "ts", "event_type", "event_id",
        Seq("view", "click", "signup"))
      .orderBy("user_id", "session_seq", "turn_idx").collect()
    out.groupBy(r => (r.getLong(0), r.getLong(1))).foreach { case (_, turns) =>
      val sorted = turns.sortBy(_.getInt(2))
      assert(sorted.head.getAs[Long]("t_start") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("t_end") == b.getAs[Long]("t_start"))
        case _ => ()
      }
      // one digest per session
      assert(turns.map(_.getAs[String]("assembled_digest")).toSet.size == 1)
    }
  }

  test("dedup ladder + token ledger: counts reconcile stage over stage") {
    val textGen = Gen.oneOf(
      Gen.const("the of and a to in it is that for shared body text here"),
      Gen.const("THE of and a to in it is that for shared body text here!"),
      Gen.listOfN(12, Gen.oneOf("the", "of", "and", "data", "word", "body"))
        .map(_.mkString(" ")))
    val docs = sample(textGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pairs = Seq((0L, 7L), (3L, 9L)).toDF("id_a", "id_b")
    val lad = graft.operators.Dedup.dedupLadder(docs, "doc_id", "text", pairs)
      .orderBy("rung").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // chain: survivors of rung i == docs_in of rung i+1; removed+surv==in
    lad.foreach { case (in, rem, sur) => assert(in == rem + sur) }
    assert(lad(0)._3 == lad(1)._1 && lad(1)._3 == lad(2)._1)
    val led = graft.operators.Dedup.tokenLedger(docs, "doc_id", "text",
        pairs, minQuality = 0).orderBy("stage").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // tokens monotone non-increasing down the ladder
    led.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3 && a._2 >= b._2)
      case _ => ()
    }
  }

  test("trimmed stats: both robust means stay inside the cut interval") {
    val vGen = Gen.oneOf(Gen.choose(1, 100), Gen.const(100000)) // heavy tail
    val vals = sample(vGen, 150).zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("g", "v")
    graft.operators.Robust.trimmedStats(vals, "g", "v").collect().foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo_cut"), r.getAs[Double]("hi_cut"))
      assert(r.getAs[Double]("trimmed_mean") >= lo &&
        r.getAs[Double]("trimmed_mean") <= hi)
      assert(r.getAs[Double]("winsorized_mean") >= lo &&
        r.getAs[Double]("winsorized_mean") <= hi)
    }
  }
}
