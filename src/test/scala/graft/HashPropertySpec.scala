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
