package graft

import org.apache.spark.sql.functions._
import graft.functions.PortableHash._

/** The cross-engine hash toolkit: ranges, JVM-twin equality, edge cases. */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  /** JVM twin of h48 (same fold as Multimodal's decoder stub). */
  private def h48Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 12).foldLeft(0L)((a, c) => a * 16 + Character.digit(c, 16))
  }

  test("h48 matches the JVM reference fold and stays in [0, 2^48)") {
    val rnd = new scala.util.Random(42)
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "日本語テキスト") ++
      Seq.fill(200)(rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val got = inputs.toDF("s").select(col("s"), h48(col("s")).as("h")).collect()
    got.foreach { r =>
      val (s, h) = (r.getString(0), r.getLong(1))
      assert(h == h48Jvm(s), s"h48 mismatch for '$s'")
      assert(h >= 0 && h < (1L << 48))
    }
  }

  test("native H48 expression equals the built-in composition everywhere") {
    val rnd = new scala.util.Random(7)
    val inputs = Seq("", "x", "多字节 mixed ascii") ++
      Seq.fill(300)(rnd.alphanumeric.take(rnd.nextInt(60)).mkString)
    val bad = inputs.toDF("s")
      .select(h48(col("s")).as("native"), h48Builtin(col("s")).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(bad == 0)
  }

  test("native PolyFp expression equals the built-in fold on the normalized domain") {
    // the fingerprint runs on regexp-normalized [a-z0-9 ] text — cover that
    // domain plus real documents end-to-end
    val rnd = new scala.util.Random(11)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
    val synth = Seq("", "a", " ") ++
      Seq.fill(200)(Seq.fill(rnd.nextInt(120))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val badSynth = synth.toDF("s")
      .select(polyFingerprint(col("s")).as("native"),
        polyFingerprintBuiltin(col("s")).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(badSynth == 0)
    val docs = Tables.documents(spark, sf001)
      .select(regexp_replace(lower(col("text")), "[^a-z0-9 ]", "").as("s"))
    val badDocs = docs
      .select(polyFingerprint(col("s")).as("native"),
        polyFingerprintBuiltin(col("s")).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(badDocs == 0)
  }

  test("native DotProduct expression is bit-equal to the built-in fold on real embeddings") {
    import graft.functions.DotProduct
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val builtinDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    // self-pairs plus a shifted-pair join: exercises many (a, b) combinations
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") % 37 === col("b.vec_id") % 37)
    val bad = pairs.select(
        DotProduct(col("a.v"), col("b.v")).as("native"),
        builtinDot(col("a.v"), col("b.v")).as("builtin"))
      .filter(col("native") =!= col("builtin")).count()
    assert(bad == 0)
    // null / shape semantics match: mismatched lengths and null elements -> NULL
    val odd = Seq((Seq(1.0, 2.0), Seq(1.0)), (Seq(1.0), Seq(2.0))).toDF("x", "y")
    val r = odd.select(DotProduct(col("x"), col("y")).as("d")).collect()
    assert(r(0).isNullAt(0) && r(1).getDouble(0) == 2.0)
  }

  test("shingles: fewer than n tokens yields empty; order preserved") {
    val r = Seq("a b c d", "a b", "x").toDF("t")
      .select(shingles(tokens(col("t"))).as("s")).collect()
    assert(r(0).getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0).isEmpty)
    assert(r(2).getSeq[String](0).isEmpty)
  }

  test("permuted stays within [0, M31) and varies across permutation indices") {
    val df = Seq.tabulate(64)(j => (j.toLong, 123456789L)).toDF("j", "h")
    val vals = df.select(permuted(col("j"), col("h")).as("p")).collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < M31))
    assert(vals.distinct.length > 32, "permutations should differ")
  }

  test("polyFingerprint is deterministic and bounded") {
    def run() = Seq("some normalized text").toDF("t")
      .select(polyFingerprint(col("t"))).collect()(0).getLong(0)
    val (a, b) = (run(), run())
    assert(a == b && a >= 0 && a < MFp)
  }

  test("native ShingleHashes equals the composed tokens→shingles→h48 pipeline") {
    // real corpus text plus the tokenizer edge cases: leading/trailing
    // non-space whitespace (trim strips only 0x20), separator runs,
    // fewer-than-n tokens, empty and separator-only strings, multi-byte UTF-8
    val docs = Tables.documents(spark, sf001).select(col("text"))
      .union(Seq("a b c d", " x\ty  z w ", "\tlead", "trail\n", "one two",
        "", "\t\n", "é ü ño pair über", "a  b c").toDF("text"))
    for (n <- Seq(2, 3, 8)) {
      val both = docs.select(
        graft.functions.ShingleHashes(col("text"), n, M31).as("fast"),
        coalesce(transform(shingles(tokens(col("text")), n),
          s => h48(s) % M31), array().cast("array<long>")).as("slow"))
      assert(both.filter(col("fast") =!= col("slow")).count() == 0,
        s"n=$n mismatch")
    }
  }

  test("native MinHashSig equals the exploded groupBy-min signature") {
    // min over the shingle MULTISET (per-row native) must equal min over
    // the DISTINCT set (the batch aggregate), for the exact permuted()
    // arithmetic, across real corpus text and tokenizer edge cases
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .union(Seq((90001L, "one two"), (90002L, ""), (90003L, "a b c a b c a b c"))
        .toDF("doc_id", "text"))
    val perms = 64
    val fast = docs.select(col("doc_id"),
      graft.functions.MinHashSig(col("text"), 3, M31, perms).as("sig"))
    val sh = docs.select(col("doc_id"),
        explode(graft.functions.ShingleHashes(col("text"), 3, M31)).as("shash"))
      .distinct()
    val minAggs = (0 until perms).map(j =>
      min(permuted(lit(j), col("shash"))).as(s"m$j"))
    val slow = sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(j => col(s"m$j")): _*).as("sig"))
    // docs with no shingles: native yields empty array, aggregate yields no row
    val fastNonEmpty = fast.filter(size(col("sig")) > 0)
    assert(fastNonEmpty.count() == slow.count())
    assert(fastNonEmpty.join(slow, "doc_id")
      .filter(fastNonEmpty("sig") =!= slow("sig")).count() == 0)
    assert(fast.filter(size(col("sig")) === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(90001L, 90002L))
  }

  test("capped MinHashSig equals the anti-joined aggregate signature") {
    // exclusion-set variant: dropping hot shingles inside the expression
    // must equal anti-joining them out of the exploded rows before the
    // aggregate — including docs whose EVERY shingle is excluded (empty
    // array vs no aggregate row) and InSortedLongs membership itself
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
      .union(Seq((90001L, "aa bb cc aa bb cc"), (90002L, "xx yy zz"))
        .toDF("doc_id", "text"))
    val perms = 64
    val shAll = docs.select(col("doc_id"),
        explode(graft.functions.ShingleHashes(col("text"), 3, M31)).as("shash"))
      .distinct()
    // exclude the top-df shingles plus ALL of doc 90001's (forcing it empty)
    val hot = shAll.groupBy(col("shash")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shash")).limit(50)
      .select("shash").collect().map(_.getLong(0)) ++
      shAll.filter(col("doc_id") === 90001L).select("shash").collect().map(_.getLong(0))
    val excl = hot.distinct.sorted
    val fast = docs.select(col("doc_id"),
      graft.functions.MinHashSigCapped(col("text"), 3, M31, perms, excl).as("sig"))
    val sh = shAll.filter(!graft.functions.InSortedLongs(col("shash"), excl))
    val minAggs = (0 until perms).map(j =>
      min(permuted(lit(j), col("shash"))).as(s"m$j"))
    val slow = sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until perms).map(j => col(s"m$j")): _*).as("sig"))
    val fastNonEmpty = fast.filter(size(col("sig")) > 0)
    assert(fastNonEmpty.count() == slow.count())
    assert(fastNonEmpty.join(slow, "doc_id")
      .filter(fastNonEmpty("sig") =!= slow("sig")).count() == 0)
    assert(fast.filter(size(col("sig")) === 0)
      .filter(col("doc_id") === 90001L).count() == 1)
    // InSortedLongs agrees with isInCollection on the same list
    assert(shAll.filter(graft.functions.InSortedLongs(col("shash"), excl) =!=
      col("shash").isInCollection(excl)).count() == 0)
  }

  test("native SymDeleteHashes equals the composed deletion-variant pipeline") {
    val names = Tables.customer(spark, sf001).select(col("c_name").as("s")).limit(200)
      .union(Seq("", "a", "ab", "abc", "aa bb", "éxü", "name with  spaces").toDF("s"))
    val name = col("s")
    val len = length(name)
    def del1(i: org.apache.spark.sql.Column) =
      concat(name.substr(lit(1), i - 1), name.substr(i + 1, len - i))
    def del2(i: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      concat(name.substr(lit(1), i - 1), name.substr(i + 1, j - i - 1),
        name.substr(j + 1, len - j))
    val composed = array_sort(array_distinct(transform(array_distinct(concat(
      array(name),
      transform(sequence(lit(1), len), i => del1(i)),
      flatten(transform(sequence(lit(1), len - 1),
        i => transform(sequence(i + 1, len), j => del2(i, j)))))),
      v => h48(v))))
    val both = names.select(
      array_sort(graft.functions.SymDeleteHashes(name)).as("fast"),
      composed.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("suffix-window deletion variants stay a COMPLETE ed<=2 candidate filter") {
    // The q107 blocking key restricts deletions to the last FuzzyWindow code
    // points. Completeness claim: ANY pair within Levenshtein distance 2
    // still shares a window-variant hash (edits outside the window leave the
    // suffix windows equal up to a <= net-indel boundary shift; edits inside
    // are covered by the deletion cores). Exercise it adversarially: random
    // strings over a 3-letter alphabet (dense repeats), random edit
    // positions including the exact window boundary, all 9 edit-type pairs.
    val window = graft.operators.Relational.FuzzyWindow
    val rnd = new scala.util.Random(4107)
    val alpha = "abc"
    def randStr(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rnd.nextInt(s.length); s.updated(i, alpha(rnd.nextInt(alpha.length)))
      case 1 if s.nonEmpty => // delete
        val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1)
      case _ => // insert
        val i = rnd.nextInt(s.length + 1)
        s.take(i) + alpha(rnd.nextInt(alpha.length)) + s.drop(i)
    }
    def hashes(s: String): Set[Long] = {
      val arr = graft.functions.SymDeleteHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), window)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val cases = for {
      len <- Seq(1, 3, window - 1, window, window + 1, window + 5, 25)
      _ <- 1 to 60
    } yield {
      val x = randStr(len)
      val y = edit(if (rnd.nextBoolean()) edit(x) else x)
      (x, y)
    }
    cases.foreach { case (x, y) =>
      assert(hashes(x).intersect(hashes(y)).nonEmpty,
        s"ed<=2 pair lost by window blocking: '$x' vs '$y'")
    }
  }

  test("native SignSketch equals the composed per-plane literal formulation") {
    import graft.operators.SimilarityOps.{BandBits, Bands, Dim, Planes}
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // the pre-SignSketch formulation: one DotProduct per plane against a
    // 64-double literal array, bits OR'd via when/sum
    def composed(prefix: String, bands: Int, bits: Int): org.apache.spark.sql.Column =
      array((0 until bands).map { b =>
        (0 until bits).map { j =>
          val w = array((0 until Dim).map { i =>
            lit(graft.functions.SignSketch.weights(prefix, bands * bits, Dim)((b * bits + j) * Dim + i))
          }: _*)
          when(graft.functions.DotProduct(col("v"), w) >= 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce(_ + _)
      }: _*)
    val both = e.select(
      graft.functions.SignSketch(col("v"), "bplane", Bands, BandBits, Dim).as("fast"),
      composed("bplane", Bands, BandBits).as("slow"),
      graft.functions.SignSketch(col("v"), "plane", 1, Planes, Dim).getItem(0).as("fastb"),
      composed("plane", 1, Planes).getItem(0).as("slowb"))
    assert(both.filter(col("fast") =!= col("slow") || col("fastb") =!= col("slowb")).count() == 0)
    // and the weight derivation matches the oracle-side tables
    assert((0 until Planes).forall(p => (0 until Dim).forall(i =>
      graft.operators.SimilarityOps.planeWeights(p)(i).toDouble ==
        graft.functions.SignSketch.weights("plane", Planes, Dim)(p * Dim + i))))

    // NaN semantics: Spark's nanSafeCompareDoubles makes NaN >= 0 TRUE in the
    // composed form (and in the DuckDB oracle); the native sign test must set
    // the bit for a NaN accumulator too, not follow raw Java `>= 0`.
    val weird = Seq(
      Array.fill(Dim)(1.0).updated(3, Double.NaN),
      Array.fill(Dim)(Double.NaN),
      Array.tabulate(Dim)(i => if (i % 2 == 0) 1e308 else -1e308), // overflow games
      Array.fill(Dim)(-0.0)
    ).map(v => Tuple1(v)).toDF("v")
    val w = weird.select(
      graft.functions.SignSketch(col("v"), "bplane", Bands, BandBits, Dim).as("fast"),
      composed("bplane", Bands, BandBits).as("slow"))
    assert(w.filter(col("fast") =!= col("slow")).count() == 0,
      "NaN/Inf vectors must bucket identically to the composed Column form")
  }
}
