package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/** The structured-predicate contract (round-20, VERDICT r19 item 1/2): the
  * THREE consumers of a [[PartitionPredicate]] — the per-tuple evaluator
  * ([[PartitionPredicate.compile]]), the native checkpoint Column
  * ([[PartitionPredicate.compileColumn]] over both base shapes), and the
  * Iceberg bound-overlap test ([[PartitionPredicate.mayOverlapBounds]]) —
  * must never disagree. Property-pinned over randomized layouts: junk
  * values, nulls, absent keys, NaN, supplementary-plane strings.
  * Generators are sampled directly (the scalatest–scalacheck bridge isn't
  * in the offline resolver), same pattern as graft.ext.PropertySpec. */
class PartitionPredicateSpec extends SparkSpec {

  private def forSamples[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(f)

  private val partCols = Seq("g", "k", "d")
  private val types: Map[String, DataType] =
    Map("g" -> StringType, "k" -> IntegerType, "d" -> DoubleType)
  private val typeOf: String => DataType = types(_)

  // tuple-value generators: deliberately hostile (junk, null, absent,
  // NaN, empty, leading zeros, supplementary-plane characters)
  private val gVal: Gen[String] = Gen.oneOf(
    Gen.oneOf("a", "b", "p13", "", "x", "𐀀x", "z"),
    Gen.alphaNumStr.map(_.take(6)), Gen.const(null: String))
  private val kVal: Gen[String] = Gen.oneOf(
    Gen.choose(-9, 20).map(_.toString), Gen.const("05"), Gen.const("1.5"),
    Gen.const("x"), Gen.const(""), Gen.const(null: String))
  private val dVal: Gen[String] = Gen.oneOf(
    Gen.choose(-40, 40).map(i => (i / 4.0).toString), Gen.const("NaN"),
    Gen.const("1e2"), Gen.const("junk"), Gen.const(null: String))
  private val tupleGen: Gen[Map[String, String]] = for {
    g <- gVal; k <- kVal; d <- dVal
    keep <- Gen.listOfN(3, Gen.prob(0.8)) // some keys absent entirely
  } yield Seq("g" -> g, "k" -> k, "d" -> d).zip(keep)
    .collect { case (kv, true) => kv }.toMap

  // predicate generators: validation-passing values only
  private val gLit: Gen[String] =
    Gen.oneOf("a", "b", "p13", "", "x", "𐀀x", "m")
  private val kLit: Gen[String] =
    Gen.oneOf(Gen.choose(-9, 20).map(_.toString), Gen.const("05"))
  private val dLit: Gen[String] = Gen.choose(-40, 40).map(i => (i / 4.0).toString)
  private def litFor(c: String): Gen[String] =
    c match { case "g" => gLit; case "k" => kLit; case _ => dLit }
  private val predGen: Gen[PartitionPredicate] = for {
    c <- Gen.oneOf(partCols)
    v1 <- litFor(c); v2 <- litFor(c); v3 <- litFor(c)
    loInc <- Gen.prob(0.5); hiInc <- Gen.prob(0.5)
    useLo <- Gen.prob(0.7); useHi <- Gen.prob(0.7)
    p <- Gen.oneOf[PartitionPredicate](
      PartitionPredicate.EqualTo(c, v1),
      PartitionPredicate.In(c, Seq(v1, v2, v3).distinct),
      PartitionPredicate.Range(c, Some(v1).filter(_ => useLo),
        Some(v2).filter(_ => useHi), loInc, hiInc))
  } yield p
  private val predsGen: Gen[Seq[PartitionPredicate]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, predGen))

  test("utf8Compare orders by Unicode code point where String.compareTo does not (ADVICE r19)") {
    val supp = "𐀀" // U+10000 — UTF-8 f0 90 80 80
    val bmp = ""        // U+E000  — UTF-8 ee 80 80
    assert(supp.compareTo(bmp) < 0, "UTF-16 code-unit order (the bug)")
    assert(PartitionPredicate.utf8Compare(supp, bmp) > 0,
      "code-point order: supplementary plane sorts ABOVE U+E000")
    assert(PartitionPredicate.utf8Compare("a", "b") < 0)
    assert(PartitionPredicate.utf8Compare("ab", "a") > 0)
    assert(PartitionPredicate.utf8Compare("", "") == 0)
  }

  test("validation refuses loudly: unknown column, non-partition table, uncastable value, NaN value, null value, unsupported type") {
    def compileOn(p: PartitionPredicate) =
      PartitionPredicate.compile("t", Seq(p), partCols, typeOf)
    val e1 = intercept[IllegalArgumentException] {
      PartitionPredicate.compile("t",
        Seq(PartitionPredicate.EqualTo("nope", "1")), partCols, typeOf)
    }
    assert(e1.getMessage.contains("nope") && e1.getMessage.contains("g, k, d"))
    val e2 = intercept[IllegalArgumentException] {
      PartitionPredicate.compile("t",
        Seq(PartitionPredicate.EqualTo("x", "1")), Seq.empty, typeOf)
    }
    assert(e2.getMessage.contains("<none>"))
    val e3 = intercept[IllegalArgumentException] {
      compileOn(PartitionPredicate.EqualTo("k", "not-a-number"))
    }
    assert(e3.getMessage.contains("not-a-number") && e3.getMessage.contains("int"))
    val e4 = intercept[IllegalArgumentException] {
      compileOn(PartitionPredicate.Range("d", Some("NaN"), None))
    }
    assert(e4.getMessage.contains("NaN"))
    val e5 = intercept[IllegalArgumentException] {
      compileOn(PartitionPredicate.EqualTo("g", null))
    }
    assert(e5.getMessage.contains("null value"))
    val e6 = intercept[UnsupportedOperationException] {
      PartitionPredicate.compile("t",
        Seq(PartitionPredicate.EqualTo("b", "0101")), Seq("b"), _ => BinaryType)
    }
    assert(e6.getMessage.contains("binary"))
  }

  test("evaluator semantics: typed comparison, null/absent/junk/NaN match nothing, date and boolean domains") {
    def ev(p: PartitionPredicate, pv: Map[String, String]): Boolean =
      PartitionPredicate.compile("t", Seq(p), partCols, typeOf)(pv)
    // typed, not lexicographic: "05" == "5" on an int column
    assert(ev(PartitionPredicate.EqualTo("k", "05"), Map("k" -> "5")))
    assert(ev(PartitionPredicate.EqualTo("k", "5"), Map("k" -> "05")))
    assert(ev(PartitionPredicate.Range("k", Some("9"), Some("11")), Map("k" -> "10")),
      "int 10 is inside [9, 11] — a lexicographic compare would exclude it")
    // null value, absent key, junk, NaN: never a match — even for Range(None, None)
    for (pv <- Seq(Map("k" -> (null: String)), Map.empty[String, String],
        Map("k" -> "junk"))) {
      assert(!ev(PartitionPredicate.EqualTo("k", "5"), pv))
      assert(!ev(PartitionPredicate.Range("k", None, None), pv))
    }
    assert(!ev(PartitionPredicate.Range("d", Some("-1e308"), None), Map("d" -> "NaN")),
      "NaN matches nothing (Spark's own comparisons would order it largest)")
    assert(ev(PartitionPredicate.Range("d", None, None), Map("d" -> "0.5")))
    // inclusivity flags
    assert(!ev(PartitionPredicate.Range("k", Some("5"), None, loInclusive = false),
      Map("k" -> "5")))
    assert(ev(PartitionPredicate.Range("k", Some("5"), None), Map("k" -> "5")))
    // date + boolean domains (Delta partition shapes)
    val dTypes: String => DataType =
      Map("dt" -> DateType, "flag" -> BooleanType)
    def evD(p: PartitionPredicate, pv: Map[String, String]): Boolean =
      PartitionPredicate.compile("t", Seq(p), Seq("dt", "flag"), dTypes)(pv)
    assert(evD(PartitionPredicate.Range("dt", Some("2025-01-01"), Some("2025-01-31")),
      Map("dt" -> "2025-01-15")))
    assert(!evD(PartitionPredicate.Range("dt", Some("2025-01-01"), Some("2025-01-31")),
      Map("dt" -> "2025-02-01")))
    assert(evD(PartitionPredicate.EqualTo("flag", "true"), Map("flag" -> "true")))
    assert(!evD(PartitionPredicate.EqualTo("flag", "true"), Map("flag" -> "false")))
  }

  test("EQUIVALENCE PIN: the native Column (parsed-struct AND map-fallback shapes) keeps exactly the evaluator's rows") {
    // the Delta half of VERDICT r19 item 2: filtering a checkpoint-shaped
    // DataFrame through compileColumn must keep precisely the adds the
    // per-tuple evaluator keeps — over hostile random layouts (junk
    // values, nulls, absent keys, NaN) and random conjunctions, for BOTH
    // base shapes (add.partitionValues_parsed present / map-only).
    val parsedT = StructType(partCols.map(c => StructField(c, types(c))))
    val mapT = MapType(StringType, StringType, valueContainsNull = true)
    val addParsed = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", mapT),
      StructField("partitionValues_parsed", parsedT)))
    val addMapOnly = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", mapT)))
    val layout = for {
      n <- Gen.choose(1, 12)
      pvs <- Gen.listOfN(n, tupleGen)
      preds <- predsGen
    } yield (pvs, preds)
    forSamples(layout, n = 25) { case (pvs, preds) =>
      val eval = PartitionPredicate.compile("t", preds, partCols, typeOf)
      val expected = pvs.zipWithIndex
        .collect { case (pv, i) if eval(pv) => s"p$i" }.toSet
      for ((addT, parsed) <- Seq((addParsed, true), (addMapOnly, false))) {
        val rows: Seq[Row] = pvs.zipWithIndex.map { case (pv, i) =>
          val add =
            if (parsed)
              Row(s"p$i", pv, Row.fromSeq(partCols.map(c =>
                DeltaExport.parsedExternal(types(c), pv.getOrElse(c, null)))))
            else Row(s"p$i", pv)
          Row(add)
        } :+ Row(null) // a protocol/meta-style row: add IS NULL survives
        val df = spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(rows).asJava),
          StructType(Seq(StructField("add", addT))))
        val pred = PartitionPredicate.compileColumn(
          preds, typeOf, PartitionPredicate.checkpointBase(addT, typeOf))
        val kept = df.filter(col("add").isNull || pred)
          .collect().flatMap(r => Option(r.getStruct(0)).map(_.getString(0)))
          .toSet
        assert(kept == expected,
          s"shape parsed=$parsed diverged for preds=$preds:\n" +
            s"native=$kept\nevaluator=$expected\ntuples=$pvs")
      }
    }
  }

  test("PRUNING LEMMA: mayOverlapBounds=false implies NO tuple in the bounded set matches; truncated bounds stay conservative") {
    // the Iceberg half of VERDICT r19 item 2: a manifest is pruned only
    // when provably disjoint — for random value sets (nulls and NaN
    // included, excluded from bounds exactly as the writer excludes
    // them) and random predicates, a pruned bound interval must contain
    // no matching value. Also: WIDENED bounds (the truncation direction
    // foreign writers may take) never flip a kept manifest to pruned.
    val colGen = Gen.oneOf(partCols)
    val setGen = for {
      c <- colGen
      vs <- Gen.nonEmptyListOf(
        c match { case "g" => gVal; case "k" => kVal; case _ => dVal })
      p <- Gen.oneOf(
        litFor(c).map(v => PartitionPredicate.EqualTo(c, v): PartitionPredicate),
        Gen.listOfN(2, litFor(c))
          .map(v => PartitionPredicate.In(c, v): PartitionPredicate),
        Gen.zip(litFor(c), litFor(c)).map { case (a, b) =>
          PartitionPredicate.Range(c, Some(a), Some(b)): PartitionPredicate })
    } yield (c, vs, p)
    forSamples(setGen, n = 120) { case (c, vs, p) =>
      val dt = types(c)
      val eval = PartitionPredicate.compile("t", Seq(p), partCols, typeOf)
      // bounds the way the writer computes them: over cast-able, non-null,
      // non-NaN values, min/max in the typed order, serialized back to the
      // canonical string form deserializeBound would produce
      val typed = vs.filter(_ != null)
        .map(s => s -> PartitionPredicate.sparkCast(dt, s))
        .collect { case (s, v) if v != null &&
          !(dt == DoubleType && v.asInstanceOf[Double].isNaN) => (s, v) }
      val bounds: Option[(String, String)] =
        if (typed.isEmpty) None
        else {
          def canonical(v: Any): String = v.toString
          val sorted = typed.map(_._2).sortWith((a, b) =>
            PartitionPredicate.compare(dt, a, b).exists(_ < 0))
          Some((canonical(sorted.head), canonical(sorted.last)))
        }
      val (lo, hi) = bounds.map(b => (Some(b._1), Some(b._2)))
        .getOrElse((None, None))
      val overlap = PartitionPredicate.mayOverlapBounds("t", p, dt, lo, hi)
      if (!overlap)
        vs.foreach { raw =>
          assert(!eval(Map(c -> raw)),
            s"pruned bounds [$lo, $hi] but value '$raw' matches $p")
        }
      // widening (truncation direction) never prunes MORE: if kept with
      // exact bounds, still kept with a widened interval
      if (overlap && dt == StringType && lo.isDefined && hi.isDefined) {
        val widened = PartitionPredicate.mayOverlapBounds("t", p, dt,
          lo.map(_.dropRight(1)), hi.map(_ + "￿"))
        assert(widened, s"widened bounds pruned a kept manifest for $p")
      }
      // absent bounds always keep
      assert(PartitionPredicate.mayOverlapBounds("t", p, dt, None, None))
    }
  }
}
