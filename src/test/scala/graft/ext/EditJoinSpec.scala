package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  // deterministic base strings + planted small edits
  private def fixture = {
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefgh"
    val bases = (0 until 20).map(_ =>
      (0 until 60).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val rows = bases.zipWithIndex.flatMap { case (s, i) =>
      val edited = s.updated(rnd.nextInt(s.length), 'z') // 1 substitution
      val far = s.reverse // unrelated shape
      Seq((i * 3L, s), (i * 3L + 1, edited), (i * 3L + 2, far))
    }
    rows.toDF("id", "s")
  }

  private def brute(maxDist: Int) = {
    val df = fixture
    val a = df.toDF("id_a", "s_a")
    val b = df.toDF("id_b", "s_b")
    a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", levenshtein($"s_a", $"s_b").as("dist"))
      .filter($"dist" <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("matches brute force exactly at maxDist 2 (strings ≥ (k+1)·q)") {
    val got = EditJoin.join(fixture, "id", "s", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = brute(2)
    assert(expect.nonEmpty, "fixture must plant at least one close pair")
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("distance values are exact and bounded by maxDist") {
    val rows = EditJoin.join(fixture, "id", "s", maxDist = 4).collect()
    assert(rows.forall(_.getInt(2) <= 4))
    // each planted single-substitution pair appears with dist exactly 1
    val planted = rows.filter(r => r.getLong(1) == r.getLong(0) + 1 && r.getLong(0) % 3 == 0)
    assert(planted.nonEmpty && planted.forall(_.getInt(2) == 1))
  }

  test("short strings below the pigeonhole bound are not silently dropped") {
    // maxDist=10, q=3 ⇒ guarantee needs length ≥ 33. These are all shorter,
    // and several pairs share ZERO q-grams (e.g. "aaaaaa" vs "bbbbbb"), so a
    // gram-prefix join alone can never emit them — brute force is the law.
    val df = Seq(
      (1L, "aaaaaa"), (2L, "bbbbbb"), (3L, "aaaab"), (4L, ""),
      (5L, "zzzz"), (6L, "kitten"), (7L, "sitting"), (8L, "x"),
      (9L, "abcdefghijklmnop"), (10L, "abcdefghijklmnoq")
    ).toDF("id", "s")
    val maxDist = 10
    val got = EditJoin.join(df, "id", "s", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = df.toDF("id_a", "s_a"); val b = df.toDF("id_b", "s_b")
    val expect = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", levenshtein($"s_a", $"s_b").as("dist"))
      .filter($"dist" <= maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expect.exists { case (x, y, _) => Set(x, y) == Set(1L, 2L) },
      "fixture must contain a zero-shared-gram pair the gram join misses")
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("no Window is partitioned by the gram column (skew audit)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = EditJoin.join(fixture, "id", "s", maxDist = 2)
      .queryExecution.optimizedPlan
    val gramWindows = plan.collect {
      case w: LWindow if w.partitionSpec.exists(_.references.exists(
        _.name.toLowerCase == "gram")) => w
    }
    assert(gramWindows.isEmpty,
      "gram-frequency must come from groupBy+rejoin, not a Window over gram")
  }
}
