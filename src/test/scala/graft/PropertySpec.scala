package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Formatters

/** Property-based laws for the LOCKED scalar semantics (SURVEY §5.3):
  * totality (never throw, null/"" channels on failure), idempotence of the
  * normalizers, and output-shape invariants — sampled from scalacheck
  * generators and evaluated through the real Spark expressions.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic scalacheck samples (fixed seed — reproducible CI). */
  private def samples[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  private val nastyStrings: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.numStr,
    Gen.const(""),
    Gen.const(" "),
    Gen.const(" pad "),
    Gen.const("1e308"),
    Gen.const("-0.0"),
    Gen.const("NaN"),
    Gen.const("Infinity"),
    Gen.const("12.34.56"),
    Gen.const("  42  "),
    Gen.oneOf("多字节", "héllo wörld", "a/b c", "100%", "$1,000.50"))

  test("safeNumeric is total: arbitrary strings yield a double or null, never an error") {
    val df = samples(nastyStrings, 400).toDF("s")
      .select(col("s"), Formatters.safeNumeric(col("s")).as("d"))
    val rows = df.collect()   // would throw under ANSI cast semantics
    assert(rows.length == 400)
    rows.foreach { r =>
      if (!r.isNullAt(1)) assert(!r.getDouble(1).isNaN || r.getString(0).trim.equalsIgnoreCase("nan"))
    }
  }

  test("formatPercent is total and shaped: '' or optional-sign digits + '%'") {
    val rows = samples(nastyStrings, 400).toDF("s")
      .select(Formatters.formatPercent(col("s")).as("p")).collect()
    rows.foreach { r =>
      val p = r.getString(0)
      assert(p == "" || p.matches("-?\\d+%"), s"bad percent shape: '$p'")
    }
  }

  test("formatCurrency is total and shaped: '' or $-prefixed grouped number") {
    val doubles = Gen.oneOf(
      Gen.choose(-1e9, 1e9),
      Gen.choose(-100.0, 100.0),
      Gen.oneOf(0.0, -0.0, 1000.0, 1000.5, 999999.99, 0.005))
    val rows = samples(doubles, 400).map(_.toString).toDF("s")
      .select(Formatters.formatCurrency(col("s")).as("c")).collect()
    rows.foreach { r =>
      val c = r.getString(0)
      assert(c == "" || c.matches("\\$-?[\\d,]+(\\.\\d{2})?"), s"bad currency shape: '$c'")
    }
  }

  test("sanitizeName is idempotent and never emits separators") {
    val df = samples(nastyStrings, 400).toDF("s")
    val rows = df.select(
        Formatters.sanitizeName(col("s")).as("once"),
        Formatters.sanitizeName(Formatters.sanitizeName(col("s"))).as("twice"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "sanitize ∘ sanitize = sanitize")
      assert(!r.getString(0).exists(ch => ch == ' ' || ch == '/'))
    }
  }

  test("digitClamp is idempotent and emits only [0-9.]") {
    val rows = samples(nastyStrings, 400).toDF("s")
      .select(
        Formatters.digitClamp(col("s")).as("once"),
        Formatters.digitClamp(Formatters.digitClamp(col("s"))).as("twice"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), "clamp ∘ clamp = clamp")
      assert(r.getString(0).forall(ch => ch.isDigit || ch == '.'))
    }
  }

  test("cleanText is idempotent and NBSP-free") {
    val rows = samples(nastyStrings, 400).toDF("s")
      .select(
        Formatters.cleanText(col("s")).as("once"),
        Formatters.cleanText(Formatters.cleanText(col("s"))).as("twice"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(!r.getString(0).contains(" "))
      assert(r.getString(0) == r.getString(0).trim)
    }
  }

  test("formatDate is total: arbitrary strings render 'Month DD, YYYY' (today on bad parse)") {
    val rows = samples(nastyStrings, 200).toDF("s")
      .select(Formatters.formatDate(col("s")).as("d")).collect()
    rows.foreach { r =>
      assert(r.getString(0).matches("[A-Z][a-z]+ \\d{2}, \\d{4}"), s"bad date shape: '${r.getString(0)}'")
    }
  }

  test("islands decomposition matches a plain-Scala oracle on arbitrary month sets") {
    // A customer's month set is an arbitrary subset of a small integer range,
    // so runs of every length (and singleton gaps) are well represented.
    val monthSet: Gen[Set[Long]] =
      Gen.someOf(0L to 40L).map(_.toSet).suchThat(_.nonEmpty)
    val perCustomer: List[Set[Long]] = samples(monthSet, 60)

    val rows = perCustomer.zipWithIndex.flatMap { case (mos, custkey) =>
      mos.toList.map(mo => (custkey.toLong, mo))
    }
    val got = operators.Analytics
      .streaksOfMonths(rows.toDF("o_custkey", "mo_idx"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap

    perCustomer.zipWithIndex.foreach { case (mos, custkey) =>
      // reference islands: a new run starts wherever the gap exceeds 1
      val sorted = mos.toList.sorted
      val breaks = sorted.zip(sorted.drop(1)).count { case (a, b) => b - a > 1 }
      val nStreaks = breaks + 1L
      val maxStreak = {
        var best = 1L; var cur = 1L
        sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
          if (b - a == 1) { cur += 1; best = math.max(best, cur) } else cur = 1
        }
        best
      }
      val (gs, ga, gm) = got(custkey.toLong)
      assert(gs == nStreaks, s"cust $custkey streaks: got $gs want $nStreaks for $sorted")
      assert(ga == mos.size.toLong, s"cust $custkey active months")
      assert(gm == maxStreak, s"cust $custkey max streak: got $gm want $maxStreak for $sorted")
    }
  }

  test("large-star/small-star components equal a union-find on arbitrary graphs") {
    // Graph shapes that stress the alternation: long paths (worst-case
    // diameter), dense clumps, isolated nodes, self-loops, duplicate and
    // reversed edges.
    val rnd = new scala.util.Random(4242L)
    (1 to 5).foreach { trial =>
      val n = 30 + rnd.nextInt(70)
      val ids = (0 until n).map(_ => rnd.nextInt(10000).toLong).distinct
      val nEdges = rnd.nextInt(2 * ids.length)
      val edges = (0 until nEdges).map { _ =>
        (ids(rnd.nextInt(ids.length)), ids(rnd.nextInt(ids.length)))
      } ++ ids.sliding(7, 7).flatMap(g => g.zip(g.tail))   // planted paths
      val vertices = ids.toDF("doc_id")
      val pairs = edges.toDF("doc_a", "doc_b")
      val got = operators.TextOps.ccLargeSmallStar(vertices, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = ids.map(d => d -> find(d)).toMap
      assert(got == want, s"trial $trial: n=${ids.length} edges=${edges.length}")

      // ccAdaptive's driver-side union-find path (edge count under the
      // local threshold) must agree with the distributed loop bit-for-bit
      val gotLocal = operators.TextOps.ccAdaptive(vertices, pairs, edges.length.toLong)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotLocal == want, s"trial $trial local path: n=${ids.length}")
    }
  }

  test("BPE pair counts equal a driver-side recount on random corpora") {
    // random words over a small alphabet (forces heavy pair collisions and
    // repeated words — the frequency weighting must actually matter), mixed
    // with punctuation-bearing and single-char words
    val rnd = new scala.util.Random(777L)
    (1 to 3).foreach { trial =>
      val alphabet = "abcde.!"
      def word() = (0 until (1 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = (0 until 40).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(12))).map(_ => word()).mkString(" "))
      }
      val got = operators.TextOps.bpePairCountsOf(docs.toDF("doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

      // driver-side BPE pair count: word frequencies, then per-word
      // character pairs + terminal </w>, weighted by frequency
      val freq = docs.flatMap(_._2.toLowerCase.trim.split("\\s+"))
        .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size.toLong)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      freq.foreach { case (w, f) =>
        val syms = w.map(_.toString) :+ "</w>"
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val want = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .take(operators.TextOps.BpeTopK)
        .zipWithIndex
        .map { case (((l, r), c), i) => (i + 1L, l, r, c) }
      assert(got.toSeq == want, s"trial $trial: got=${got.take(3).toSeq} want=${want.take(3)}")
      assert(got.nonEmpty)
    }
  }

  /** q148 canonicalization laws (all non-ASCII via explicit escapes so the
    * fixtures survive any editor/terminal encoding). */
  private val unicodeStrings: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.asciiPrintableStr,
    Gen.const(""),
    Gen.const("caf\u00e9"),                      // NFC e-acute
    Gen.const("cafe\u0301"),                     // NFD e + combining acute
    Gen.const("A\u030a"),                        // NFD A + combining ring
    Gen.const("\u212b"),                         // ANGSTROM SIGN (NFC -> C5)
    Gen.const("a\u00a0b\u2028c"),               // NBSP + line separator
    Gen.const("x\u200by"),                       // zero-width space
    Gen.const("\t mixed \r\n ws \u3000"),
    Gen.const("ctrl\u0001\u0002chars"),
    Gen.listOfN(12, Gen.oneOf('a', 'e', '\u0301', '\u030a', ' ', '\t',
      '\u00a0', '\u200b', '\u00e9')).map(_.mkString))

  test("unicodeCanon is idempotent and emits none of the collapse set") {
    import graft.functions.UnicodeCanon
    val df = samples(unicodeStrings, 300).toDF("s")
      .select(col("s"), UnicodeCanon(col("s")).as("c1"))
      .select(col("s"), col("c1"), UnicodeCanon(col("c1")).as("c2"))
    df.collect().foreach { r =>
      val (c1, c2) = (r.getString(1), r.getString(2))
      assert(c1 == c2, s"not idempotent on ${r.getString(0).codePoints().toArray.mkString(",")}")
      val collapseExtras = "\u00a0\u1680\u2000\u200b\u2028\u2029\u202f\u205f\u3000\ufeff"
      assert(!c1.exists(ch => ch != ' ' && (ch.isControl || ch.isWhitespace ||
        collapseExtras.contains(ch))),
        s"collapse-set char survived in: " + c1.codePoints().toArray.mkString(","))
      assert(!c1.startsWith(" ") && !c1.endsWith(" "))
    }
  }

  test("NFC/NFD/whitespace twins share canon_h48 and dedup to one survivor") {
    import graft.functions.{PortableHash, UnicodeCanon}
    // four renderings of the same visible document
    val twins = Seq(
      (1L, "caf\u00e9 au lait"),                       // NFC
      (2L, "cafe\u0301 au lait"),                      // NFD
      (3L, "caf\u00e9\u00a0au\u2028lait"),           // exotic whitespace
      (4L, " cafe\u0301  au\tlait ")                  // NFD + ragged ASCII ws
    ).toDF("doc_id", "text")
    val keyed = twins.select(col("doc_id"),
      PortableHash.h48(UnicodeCanon(col("text"))).as("canon_h48"))
    assert(keyed.select(col("canon_h48")).distinct().count() == 1L,
      "all four renderings must share one canonical hash")
    // the q34-style keep-first dedup collapses them to one survivor
    val survivors = keyed.groupBy(col("canon_h48"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .collect()
    assert(survivors.length == 1 && survivors.head.getLong(1) == 1L &&
      survivors.head.getLong(2) == 4L)
    // control: WITHOUT the canon tier the same four fingerprints are distinct
    val rawKeys = twins.select(PortableHash.h48(col("text"))).distinct().count()
    assert(rawKeys == 4L, s"control failed: raw hashes collapsed to $rawKeys")
  }
}
