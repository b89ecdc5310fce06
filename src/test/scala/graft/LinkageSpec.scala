package graft

import org.apache.spark.sql.functions._

import graft.operators.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: plain Levenshtein DP over CODE POINTS (the
    * unit Spark's levenshtein counts — a UTF-16 DP would disagree on
    * astral chars).
    */
  private def lev(as: String, bs: String): Int = {
    val a = as.codePoints().toArray
    val b = bs.codePoints().toArray
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def bruteForce(probe: Seq[(Long, String)], cat: Seq[(Long, String)],
                         k: Int): Set[(Long, Long, Int)] =
    (for ((pi, ps) <- probe; (ci, cs) <- cat; d = lev(ps, cs) if d <= k)
      yield (pi, ci, d)).toSet

  private def run(probe: Seq[(Long, String)], cat: Seq[(Long, String)],
                  k: Int): Set[(Long, Long, Int)] =
    Linkage.editDistanceJoin(
        probe.toDF("pid", "ps"), "pid", "ps",
        cat.toDF("cid", "cs"), "cid", "cs", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("editDistanceJoin equals brute force on an adversarial mix " +
      "(insert/delete/substitute, tiny and empty strings, k=1..3)") {
    // strings engineered to cross segment boundaries every way: shared
    // tokens (hot segments), pure inserts, edits at ends, tiny strings
    val cat = Seq(
      1L -> "red widget", 2L -> "red widgets", 3L -> "blue widget",
      4L -> "red gadget", 5L -> "xy", 6L -> "", 7L -> "a",
      8L -> "prefix red widget", 9L -> "widget", 10L -> "red")
    val probe = Seq(
      101L -> "red widget",   // exact
      102L -> "redwidget",    // delete space
      103L -> "red widgget",  // insert
      104L -> "red widgte",   // transpose = 2 subs
      105L -> "rd wdget",     // 2 deletes
      106L -> "x",            // tiny
      107L -> "",             // empty
      108L -> "xyz",          // tiny vs tiny catalog
      109L -> "ed widget",    // delete at position 0
      110L -> "red widgeTTT") // tail growth
    for (k <- 1 to 3)
      assert(run(probe, cat, k) == bruteForce(probe, cat, k),
        s"mismatch at k=$k")
  }

  test("editDistanceJoin is recall-exact under skewed shared segments") {
    // catalog where one token is shared by every entity (degenerate-hot
    // segment content) — recall must not depend on bucket heat
    val cat = (0L until 60L).map(i => i -> s"acme part $i")
    val probe = (0L until 60L).map(i => (1000 + i) -> s"acme prt $i")
    assert(run(probe, cat, 2) == bruteForce(probe, cat, 2))
  }

  test("length classes overlap: pairs straddling shortLen are never lost") {
    // shortLen = 16: pairs with one side <= 16 and the other > 16 must be
    // caught by the k-wide class overlap (FastSS on one side only would
    // lose them); repetitive LONG strings exercise the marker sliver
    val cat = Seq(
      1L -> "abcdefghijklmnop",    // len 16 (SHORT boundary)
      2L -> "abcdefghijklmnopqr",  // len 18 (LONG)
      3L -> "aaaaaaaaaaaaaaaaaaaa", // len 20 repetitive (degenerate LONG)
      4L -> "abcdefghijklm")       // len 13 (SHORT)
    val probe = Seq(
      101L -> "abcdefghijklmnopq",  // len 17: within 1 of ids 1 and 2
      102L -> "aaaaaaaaaaaaaaaaaa", // len 18: within 2 of id 3
      103L -> "abcdefghijklmn")     // len 14: within 1 of id 4
    val got = Linkage.editDistanceJoin(
        probe.toDF("pid", "ps"), "pid", "ps",
        cat.toDF("cid", "cs"), "cid", "cs", k = 2, shortLen = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteForce(probe, cat, 2))
    assert(got.contains((101L, 1L, 1)) && got.contains((101L, 2L, 1)) &&
      got.contains((102L, 3L, 2)))
  }

  test("deletion keys are code-point exact: non-BMP and multibyte text") {
    // an astral emoji (surrogate pair in UTF-16, 4 bytes in UTF-8) and
    // accented chars — byte- or unit-level deletion keys would miss these
    val cat = Seq(1L -> "héllo wörld 🚀 x", 2L -> "наш дом 好", 3L -> "zzz")
    val probe = Seq(
      101L -> "héllo wörld 🚀 x",   // exact
      102L -> "héllo wörld x",      // emoji + space deleted (2 edits)
      103L -> "héllo wörld 🚀xx",   // sub space -> x, append x
      104L -> "наш дом 好好",       // insert one CJK char
      105L -> "наша дом")           // insert + delete the CJK tail
    for (k <- 1 to 2)
      assert(run(probe, cat, k) == bruteForce(probe, cat, k),
        s"mismatch at k=$k")
  }

  test("q137 fixture slice: blocking equals brute force at sf0.001") {
    val q = SparkEntry.queries("q137_editdist_linkage")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force replay of the derivation + quadratic join on the driver
    val cat = Tables.part(spark, sf0001)
      .select(col("p_partkey"), concat(col("p_brand"), lit(" "),
        col("p_name"), lit(" #"), col("p_partkey").cast("string")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dirty = cat.map { case (id, s) =>
      val p = (id % (s.length - 6) + 2).toInt
      val d = (id % 4) match {
        case 0 => s
        case 1 => s.substring(0, p - 1) + s.substring(p)
        case 2 => s.substring(0, p - 1) + "x" + s.substring(p)
        case _ => s.substring(0, p - 1) + "x" + s.substring(p, p + 1) +
          (if (p + 2 <= s.length) s.substring(p + 2) else "")
      }
      (id, d)
    }
    val brute = (for ((pi, ps) <- dirty; (ci, cs) <- cat;
                      d = lev(ps, cs) if d <= 2)
      yield (pi, ci, d.toLong)).toSet
    assert(q == brute && q.nonEmpty)
  }
}
