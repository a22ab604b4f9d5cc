package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, element_at, isnan, lit, not}
import org.apache.spark.sql.types._

/** STRUCTURED partition predicates for the interop read legs
  * ([[IcebergExport.read]], [[DeltaExport.read]]) — the round-19 weak
  * mark: the opaque `Map[String, String] => Boolean` closure can only be
  * consulted per-tuple, so an Iceberg range query (`dt BETWEEN a AND b`)
  * pruned ZERO manifests from the field-507 summaries (exact-tuple bounds
  * only) and the Delta checkpoint pushdown rode a UDF invisible to
  * parquet. A conjunction of these forms is inspectable: Iceberg evaluates
  * Range/In/EqualTo against each manifest-list entry's lower/upper bounds
  * (metadata work ∝ query, not table), and Delta compiles them to native
  * `Column` comparisons the parquet scan can push down. The opaque closure
  * remains available for anything the ADT cannot express — both readers
  * AND the two forms together.
  *
  * SEMANTICS (identical on every path — evaluator, Iceberg pruning, Delta
  * native compile; [[PartitionPredicateSpec]] property-pins the agreement):
  *   - values are the readers' STRING partition values, compared in the
  *     COLUMN'S TYPE domain: the tuple value and the predicate value are
  *     both cast with Spark's own TRY string cast (the exact semantics
  *     of the compiled `Column` form, via Catalyst's `Cast`), so `"05"`
  *     equals `"5"` on an int column and string columns compare in UTF-8
  *     unsigned-byte order (Unicode code-point order — the order Iceberg
  *     serializes bounds in; `String.compareTo` would mis-order
  *     supplementary characters against U+E000..U+FFFF).
  *   - a NULL / absent partition value matches NOTHING (SQL comparison
  *     semantics). Match-null logic needs the opaque closure.
  *   - a tuple value that does not cast to the column's type matches
  *     NOTHING (SQL: `CAST('x' AS INT) = 5` is NULL → filter false).
  *   - NaN matches NOTHING (it orders nowhere; Iceberg excludes NaN from
  *     bounds for the same reason). A NaN PREDICATE value refuses loudly
  *     at validation — a predicate that provably matches nothing is a
  *     caller bug, not a query.
  *   - predicates may name only partition columns of supported scalar
  *     types; anything else refuses loudly by name at read time.
  */
sealed trait PartitionPredicate extends Serializable {
  /** The partition column this predicate constrains. */
  def col: String
}

object PartitionPredicate {

  /** `col = value` (in the column's type domain). */
  final case class EqualTo(col: String, value: String) extends PartitionPredicate

  /** `col IN (values)`. An empty list matches nothing (well-defined, like
    * SQL's empty IN-list rewrite). */
  final case class In(col: String, values: Seq[String]) extends PartitionPredicate

  /** `lo <(=) col <(=) hi`; an absent side is unbounded. `Range(c, None,
    * None)` is `c IS NOT NULL`. An inverted range matches nothing. */
  final case class Range(
      col: String,
      lo: Option[String],
      hi: Option[String],
      loInclusive: Boolean = true,
      hiInclusive: Boolean = true) extends PartitionPredicate

  /** The partition-value types predicates support — the union of what the
    * two interop readers themselves scope to. Date and float serve the
    * DELTA leg only (Delta serializes dates as `yyyy-MM-dd`, which the
    * TRY cast parses); the Iceberg leg REFUSES date/float identity
    * partitions by name before predicates ever apply (its tuple strings
    * are raw Avro values — a date partition would surface as epoch-days
    * digits there, which is exactly the stringify-cast misread its type
    * gate exists to prevent). */
  private[sinks] def supported(dt: DataType): Boolean = dt match {
    case StringType | IntegerType | LongType | ShortType | ByteType |
         DoubleType | FloatType | BooleanType | DateType => true
    case _ => false
  }

  /** Unsigned UTF-8 byte comparison — Unicode code-point order, the order
    * Iceberg writes string bounds in (and what a spec-strict foreign
    * reader compares with). */
  private[sinks] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Spark's TRY string cast (ANSI rules, null on error), evaluated
    * eagerly — the EXACT semantics of the compiled `Column` form
    * (`.try_cast(dt)` on a string), so the closure evaluator and the
    * native Delta path can never disagree on what a value means. TRY
    * rather than LEGACY because the sessions this engine builds run
    * ANSI-on (Spark 4 default): a plain `.cast` in the compiled form
    * would THROW mid-scan on a malformed foreign partition value, where
    * the evaluator's rule is no-match. Null result = does-not-cast. */
  private[sinks] def sparkCast(dt: DataType, s: String): Any =
    if (s == null) null
    else if (dt == StringType) s
    else org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType),
      dt, None, org.apache.spark.sql.catalyst.expressions.EvalMode.TRY)
      .eval(null)

  /** Typed three-way comparison in `dt`'s domain. None = incomparable
    * (either side NaN) — callers must treat None as "no match" when
    * filtering and "cannot rule out" when pruning. */
  private[sinks] def compare(dt: DataType, a: Any, b: Any): Option[Int] =
    dt match {
      case StringType =>
        Some(utf8Compare(a.asInstanceOf[String], b.asInstanceOf[String]))
      case DoubleType | FloatType =>
        val x = a.asInstanceOf[Number].doubleValue()
        val y = b.asInstanceOf[Number].doubleValue()
        if (x.isNaN || y.isNaN) None
        else Some(java.lang.Double.compare(x, y))
      case BooleanType =>
        Some(java.lang.Boolean.compare(
          a.asInstanceOf[Boolean], b.asInstanceOf[Boolean]))
      case _ => // integral + date (catalyst internal: boxed integrals)
        Some(java.lang.Long.compare(
          a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue()))
    }

  private def isNaN(v: Any): Boolean = v match {
    case d: java.lang.Double => d.isNaN
    case f: java.lang.Float => f.isNaN
    case _ => false
  }

  /** Parse-and-validate one predicate VALUE against its column type;
    * refuses loudly (these are caller-written constants — a value that
    * cannot cast, or casts to NaN, makes the predicate provably match
    * nothing and is a bug worth naming, unlike tuple DATA which follows
    * SQL null-cast semantics). */
  private def typedValue(table: String, c: String, dt: DataType, s: String): Any = {
    require(s != null,
      s"partition predicate on '$c' carries a null value — structured " +
        "predicates never match NULL; use the partitionFilter closure for " +
        "null-matching logic")
    val v = sparkCast(dt, s)
    if (v == null) throw new IllegalArgumentException(
      s"partition predicate value '$s' does not cast to ${dt.simpleString} " +
        s"(column '$c' of $table)")
    if (isNaN(v)) throw new IllegalArgumentException(
      s"partition predicate value '$s' on '$c' of $table is NaN, which " +
        "orders nowhere and matches nothing")
    v
  }

  /** A predicate's column values, parsed+validated. */
  private def typedValues(
      table: String, dt: DataType, p: PartitionPredicate): Seq[Any] = p match {
    case EqualTo(c, v) => Seq(typedValue(table, c, dt, v))
    case In(c, vs) => vs.map(typedValue(table, c, dt, _))
    case Range(c, lo, hi, _, _) =>
      (lo.toSeq ++ hi.toSeq).map(typedValue(table, c, dt, _))
  }

  /** Validate `preds` against a reader's partition spec and COMPILE them
    * to a per-tuple evaluator (predicate values pre-parsed once; tuple
    * values cast per call). The evaluator is a plain serializable closure
    * — it ships into the Iceberg distributed manifest scan. Throws loudly
    * on an unknown column, an unsupported column type, or an invalid
    * value; an empty `preds` compiles to keep-everything. */
  private[sinks] def compile(
      table: String,
      preds: Seq[PartitionPredicate],
      partCols: Seq[String],
      typeOf: String => DataType): Map[String, String] => Boolean = {
    if (preds.isEmpty) return _ => true
    val checked: Seq[(PartitionPredicate, DataType, Seq[Any])] = preds.map { p =>
      if (!partCols.contains(p.col)) throw new IllegalArgumentException(
        s"partition predicate names '${p.col}', not a partition column of " +
          s"$table (partition columns: ${
            if (partCols.isEmpty) "<none>" else partCols.mkString(", ")})")
      val dt = typeOf(p.col)
      if (!supported(dt)) throw new UnsupportedOperationException(
        s"partition predicate on '${p.col}' of $table: column type " +
          s"${dt.simpleString} is out of scope for structured predicates " +
          "(string/integral/float/double/boolean/date) — use the " +
          "partitionFilter closure")
      (p, dt, typedValues(table, dt, p))
    }
    pv => checked.forall { case (p, dt, vals) =>
      val tuple = sparkCast(dt, pv.getOrElse(p.col, null))
      if (tuple == null || isNaN(tuple)) false
      else p match {
        case EqualTo(_, _) => compare(dt, tuple, vals.head).contains(0)
        case In(_, _) => vals.exists(v => compare(dt, tuple, v).contains(0))
        case Range(_, lo, hi, loInc, hiInc) =>
          val loOk = lo.isEmpty || {
            val c = compare(dt, tuple, vals.head)
            c.exists(x => x > 0 || (x == 0 && loInc))
          }
          val hiOk = hi.isEmpty || {
            val hv = vals.last
            val c = compare(dt, tuple, hv)
            c.exists(x => x < 0 || (x == 0 && hiInc))
          }
          loOk && hiOk
      }
    }
  }

  /** Can a value range `[lo, hi]` (both inclusive, either side absent =
    * unknown) possibly contain a value matching `p`? The Iceberg
    * manifest-pruning question: `lo`/`hi` are a field_summary's
    * deserialized bounds; prune ONLY when disjointness is PROVEN —
    * an absent bound, an unparseable bound, or an incomparable (NaN)
    * bound keeps the manifest. `contains_null`/`contains_nan` need no
    * consultation here: null and NaN values match no structured
    * predicate, so only the bounded non-null values decide whether any
    * file could match. Truncation-safe: a truncated lower is still <= all
    * values and a truncated upper >= all, so proofs against them remain
    * proofs. */
  private[sinks] def mayOverlapBounds(
      table: String,
      p: PartitionPredicate,
      dt: DataType,
      lo: Option[String],
      hi: Option[String]): Boolean = {
    val loT = lo.map(sparkCast(dt, _)).filter(v => v != null && !isNaN(v))
    val hiT = hi.map(sparkCast(dt, _)).filter(v => v != null && !isNaN(v))
    // provably-below: v < lo; provably-above: v > hi
    def below(v: Any): Boolean = loT.exists(l => compare(dt, v, l).exists(_ < 0))
    def above(v: Any): Boolean = hiT.exists(h => compare(dt, v, h).exists(_ > 0))
    p match {
      case EqualTo(c, s) =>
        val v = typedValue(table, c, dt, s)
        !(below(v) || above(v))
      case In(c, vs) =>
        vs.exists { s =>
          val v = typedValue(table, c, dt, s)
          !(below(v) || above(v))
        }
      case Range(c, plo, phi, loInc, hiInc) =>
        // disjoint iff predicate-interval entirely above hi or below lo
        val entirelyAbove = plo.exists { s =>
          val v = typedValue(table, c, dt, s)
          hiT.exists(h => compare(dt, v, h).exists(x => x > 0 || (x == 0 && !loInc)))
        }
        val entirelyBelow = phi.exists { s =>
          val v = typedValue(table, c, dt, s)
          loT.exists(l => compare(dt, v, l).exists(x => x < 0 || (x == 0 && !hiInc)))
        }
        !(entirelyAbove || entirelyBelow)
    }
  }

  /** Compile `preds` to a NATIVE `Column` over a Delta checkpoint's `add`
    * struct — the form parquet row-group stats can prune and codegen can
    * inline (the round-19 weak mark's Delta half: the UDF form filtered
    * row-by-row but was opaque to the scan). `base` resolves a partition
    * column to a typed Column: the caller prefers the checkpoint's
    * `add.partitionValues_parsed` struct (a NESTED FIELD — pushdown-able)
    * when present, falling back to `element_at` on the string map
    * (codegen-inlined, not pushdown-able — documented honestly). The
    * float/double `!isnan` guard pins the NaN-matches-nothing semantics
    * the evaluator has (Spark's own comparisons order NaN largest, which
    * would diverge). Caller guarantees `preds` already validated via
    * [[compile]]. */
  private[sinks] def compileColumn(
      preds: Seq[PartitionPredicate],
      typeOf: String => DataType,
      base: String => Column): Column = {
    require(preds.nonEmpty, "compileColumn needs a non-empty conjunction")
    preds.map { p =>
      val dt = typeOf(p.col)
      val b = base(p.col)
      val core = p match {
        case EqualTo(_, v) => b === lit(v).try_cast(dt)
        case In(_, vs) =>
          // explicit typed OR-chain, NOT .isin(strings): isin would leave
          // the literal/column type reconciliation to coercion rules (a
          // numeric-vs-string IN widens both sides), which could diverge
          // from the evaluator's cast-the-string-to-the-column-type rule
          if (vs.isEmpty) lit(false)
          else vs.map(v => b === lit(v).try_cast(dt)).reduce(_ || _)
        case Range(_, lo, hi, loInc, hiInc) =>
          val loC = lo.map(v =>
            if (loInc) b >= lit(v).try_cast(dt) else b > lit(v).try_cast(dt))
          val hiC = hi.map(v =>
            if (hiInc) b <= lit(v).try_cast(dt) else b < lit(v).try_cast(dt))
          (loC.toSeq ++ hiC.toSeq).reduceOption(_ && _)
            .getOrElse(b.isNotNull)
      }
      dt match {
        case DoubleType | FloatType => core && not(isnan(b))
        case _ => core
      }
    }.reduce(_ && _)
  }

  /** The `base` resolver for a Delta checkpoint scan (see
    * [[compileColumn]]): `add.partitionValues_parsed.<c>` when the
    * checkpoint carries the typed struct (our own exports do; so do
    * foreign writers with stats-as-struct enabled), else
    * `element_at(add.partitionValues, c)` cast to the column type. */
  private[sinks] def checkpointBase(
      addType: StructType, typeOf: String => DataType): String => Column = {
    val parsedCols: Set[String] =
      addType.fields.find(_.name == "partitionValues_parsed").map(_.dataType) match {
        case Some(st: StructType) => st.fieldNames.toSet
        case _ => Set.empty
      }
    c =>
      if (parsedCols.contains(c)) col(s"add.partitionValues_parsed.$c")
      else element_at(col("add.partitionValues"), lit(c)).try_cast(typeOf(c))
  }
}
