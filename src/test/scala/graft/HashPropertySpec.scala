package graft

import graft.functions.ColumnFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based parity for the native codegen hash expressions vs
  * their interpreted HOF reference forms, over ARBITRARY Unicode —
  * including the whitespace/multibyte/astral edge cases no fixture
  * list would enumerate. A failure here means eval/codegen/HOF have
  * drifted, which would silently rot every dedup oracle. Generation
  * is SEEDED (deterministic) per the repo's determinism contract. */
class HashPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // tokens drawn from ASCII, Latin-1, CJK, and astral planes, joined
  // by 1-2 spaces, with optional leading/trailing space
  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.listOfN(3, Gen.choose(0x00e0, 0x00ff)).map(_.map(_.toChar).mkString),
    Gen.listOfN(3, Gen.choose(0x4e00, 0x9fff)).map(_.map(_.toChar).mkString),
    Gen.listOfN(2, Gen.choose(0x1f300, 0x1f64f))
      .map(_.flatMap(Character.toChars(_)).mkString))
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    toks <- Gen.listOfN(n, tokenGen)
    sep <- Gen.oneOf(" ", "  ")
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ")
  } yield lead + toks.mkString(sep) + trail

  private def samples(gen: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: PolyHashExpr == polyHashHof on 200 arbitrary unicode strings") {
    val strs = samples(textGen, 200)
    assert(strs.nonEmpty)
    strs.toDF("s")
      .select(polyHash(col("s")).as("fast"), polyHashHof(col("s")).as("ref"))
      .collect()
      .foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("property: TokenHashesExpr == transform(split) HOF on 200 arbitrary strings") {
    val strs = samples(textGen, 200)
    strs.toDF("s")
      .select(tokenHashesNative(col("s")).as("fast"), tokenHashes(col("s")).as("ref"))
      .collect()
      .foreach { r =>
        assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
          r.getAs[scala.collection.Seq[Long]]("ref"))
      }
  }

  test("property: CanonicalNormExpr == the regex pipeline on 300 arbitrary strings") {
    // extra generator weight on punctuation/uppercase/digit mixes —
    // the characters the normalization actually acts on
    val punctTok: Gen[String] = Gen.listOfN(6, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('.', ',', '!', '?', ';', '-', '_', '\'', '"'),
      Gen.oneOf('A', 'Z', 'Q', '0', '9'), Gen.choose(0x00c0, 0x00ff).map(_.toChar)))
      .map(_.mkString)
    val mixGen: Gen[String] = for {
      n <- Gen.choose(0, 8)
      toks <- Gen.listOfN(n, Gen.oneOf(tokenGen, punctTok))
      sep <- Gen.oneOf(" ", "  ", "   ")
      lead <- Gen.oneOf("", " ", "  ")
      trail <- Gen.oneOf("", " ", ". ")
    } yield lead + toks.mkString(sep) + trail
    val strs = samples(mixGen, 300) ++ Seq("", " ", "  .  ", "A.B", "ΑΒΓ Kk")
    strs.toDF("s")
      .select(llm.Dedup.canonicalNorm(col("s")).as("fast"),
        llm.Dedup.canonicalNormRegex(col("s")).as("ref"))
      .collect()
      .foreach(r => assert(r.getString(0) === r.getString(1),
        s"native canonicalNorm drifted from the regex pipeline"))
  }

  test("property: CharNgramsExpr == transform(sequence, substring) on 200 strings") {
    val hof = transform(
      sequence(lit(1), length(col("s")) - 2),
      i => substring(col("s"), i, lit(3)))
    samples(textGen, 200).toDF("s")
      .select(charNgrams(col("s"), 3).as("fast"),
        when(length(col("s")) >= 3, hof).otherwise(array()).as("ref"))
      .collect()
      .foreach { r =>
        assert(r.getAs[scala.collection.Seq[String]]("fast") ===
          r.getAs[scala.collection.Seq[String]]("ref"))
      }
  }

  test("property: ShingleHashes3Expr == transform HOF on 100 token arrays") {
    val multiTok = for {
      n <- Gen.choose(3, 10)
      toks <- Gen.listOfN(n, tokenGen.suchThat(_.nonEmpty))
    } yield toks.mkString(" ")
    val strs = samples(multiTok, 100)
    assert(strs.nonEmpty)
    strs.toDF("s")
      .select(tokenHashesNative(col("s")).as("th"))
      .select(shingleHashes3Native(col("th")).as("fast"),
        shingleHashes3(col("th")).as("ref"))
      .collect()
      .foreach { r =>
        assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
          r.getAs[scala.collection.Seq[Long]]("ref"))
      }
    // below 3 tokens the native form is a defined empty array
    val short = Seq("", "a", "a b").toDF("s")
      .select(shingleHashes3Native(tokenHashesNative(col("s"))).as("sh"))
      .collect()
    short.foreach(r => assert(r.getAs[scala.collection.Seq[Long]]("sh").isEmpty))
  }

  test("property: AlignTermsExpr == the unrolled seededHash/floor Column algebra") {
    // the alignment gate's native loop vs the 3·dim-term unrolled
    // tree it replaced (round-16 optimization) — including a NULL
    // element (sum must null out) and a short array (whole struct
    // null). dim intentionally small so the unrolled side stays cheap.
    val dim = 6
    val rnd = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      val h = math.abs(rnd.nextLong()) % 1000000007L
      val len = if (i % 7 == 0) dim - 1 else dim + rnd.nextInt(3)
      val emb = (0 until len).map { j =>
        if (i % 11 == 3 && j == i % dim) null
        else java.lang.Float.valueOf((rnd.nextFloat() * 2f) - 0.5f)
      }
      (h, emb)
    }
    val df = rows.toDF("h", "emb")
    val longEnough = size(col("emb")) >= dim
    val terms = (0 until dim).map { j =>
      val t = pmod(seededHash(col("h"), j), lit(1000L))
      // when() guards the ANSI out-of-bounds on short arrays (the
      // query filters size >= dim before indexing; the test must too)
      val m = floor(when(longEnough, col("emb")(j)).cast("double")
        * lit(1000.0)).cast("long")
      (m * t, m * m, t * t)
    }
    val got = df
      .withColumn("at", alignTerms(col("h"), col("emb"), dim))
      .select(
        col("at.dot"), col("at.na2"), col("at.nb2"),
        longEnough.as("long_enough"),
        terms.map(_._1).reduce(_ + _).as("rdot"),
        terms.map(_._2).reduce(_ + _).as("rna2"),
        terms.map(_._3).reduce(_ + _).as("rnb2"))
      .collect()
    assert(got.nonEmpty)
    var exact = 0
    got.foreach { r =>
      if (!r.getBoolean(3)) // short array: whole struct null
        assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
      else if (r.isNullAt(5)) {
        // a NULL element nulls the unrolled na2 — the query filter
        // (na2 > 0 AND nb2 > 0) drops the row on EITHER side; the
        // native struct nulls whole (nb2 included, which the unrolled
        // form leaves non-null since t never touches the embedding)
        assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
      } else {
        Seq(0 -> 4, 1 -> 5, 2 -> 6).foreach { case (a, b) =>
          assert(!r.isNullAt(a) && r.getLong(a) === r.getLong(b), s"$r")
        }
        exact += 1
      }
    }
    assert(exact >= 50, s"want a meaningful exact-parity population, got $exact")
  }

  test("property: MinHashSigExpr == seeded-min HOF pipeline on 100 token arrays") {
    // ≥3 non-empty tokens so the HOF's shingle sequence is well-defined
    val multiTok = for {
      n <- Gen.choose(3, 10)
      toks <- Gen.listOfN(n, tokenGen.suchThat(_.nonEmpty))
    } yield toks.mkString(" ")
    val strs = samples(multiTok, 100)
    assert(strs.nonEmpty)
    strs.toDF("s")
      .select(tokenHashesNative(col("s")).as("th"))
      .select(
        minhashSigNative(col("th"), 16).as("fast"),
        transform(
          sequence(lit(0), lit(15)),
          p => array_min(transform(shingleHashes3(col("th")), h => seededHash(h, p))))
          .as("ref"))
      .collect()
      .foreach { r =>
        assert(r.getAs[scala.collection.Seq[Long]]("fast") ===
          r.getAs[scala.collection.Seq[Long]]("ref"))
      }
  }
}
