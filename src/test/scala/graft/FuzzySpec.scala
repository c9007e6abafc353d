package graft

import org.apache.spark.sql.functions._
import graft.text.Fuzzy

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dist = lev(sa, sb) if dist <= k
    } yield (ia, ib, dist)).toSet
  }

  test("fuzzyPairs: hand-built pairs incl. short and empty strings") {
    val rows = Seq(
      (1L, "hello world"), (2L, "hallo world"),  // dist 1
      (3L, "hello werld!"),                      // dist 2 from #1
      (4L, "completely different"),
      (5L, "ab"), (6L, "ac"), (7L, ""),          // short-path: 1, and ''->'ab' = 2
      (8L, "hel")                                // dist to 'hello world' is 8 — out
    )
    val out = Fuzzy.fuzzyPairs(rows.toDF("id", "s"), "id", "s", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(out == brute(rows, 2))
    assert(out.contains((1L, 2L, 1)) && out.contains((1L, 3L, 2)))
    assert(out.contains((5L, 6L, 1)) && out.contains((5L, 7L, 2)) && out.contains((6L, 7L, 2)))
  }

  test("fuzzyPairs: differential vs brute force on mutated strings (no false negatives)") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abcdefgh"
    def randStr(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String): String = rnd.nextInt(3) match {
      case 0 if s.nonEmpty => val i = rnd.nextInt(s.length); s.take(i) + s.drop(i + 1) // del
      case 1 => val i = rnd.nextInt(s.length + 1); s.take(i) + alphabet(rnd.nextInt(8)) + s.drop(i) // ins
      case _ if s.nonEmpty => val i = rnd.nextInt(s.length); s.updated(i, alphabet(rnd.nextInt(8))) // sub
      case _ => s
    }
    val originals = (0 until 60).map(i => (i.toLong, randStr(6 + rnd.nextInt(15))))
    val mutated = originals.map { case (i, s) => (i + 1000L, mutate(mutate(s))) }
    val rows = originals ++ mutated
    val out = Fuzzy.fuzzyPairs(rows.toDF("id", "s"), "id", "s", maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    val expected = brute(rows, 2)
    assert(out == expected, s"missing=${expected -- out} extra=${out -- expected}")
    assert(expected.nonEmpty) // the law must actually bite
  }

  test("fuzzyPairs: q=3 and maxDist=1 parameterizations agree with brute force") {
    val rows = Seq((1L, "abcdefghij"), (2L, "abcdefghix"), (3L, "abcdefgxij"),
      (4L, "zbcdefghij"), (5L, "abcdefghijkl"))
    for ((k, q) <- Seq((1, 3), (2, 3), (1, 2))) {
      val out = Fuzzy.fuzzyPairs(rows.toDF("id", "s"), "id", "s", k, q)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
      assert(out == brute(rows, k), s"k=$k q=$q")
    }
  }

  test("consolidateValues: typos fold to the frequent canonical, ties break lexically, single-hop") {
    val df = (Seq.fill(50)("Marketing") ++ Seq.fill(2)("Marketng") ++ Seq.fill(1)("Marketing.") ++
      Seq.fill(10)("Sales") ++ Seq.fill(10)("Salex") ++       // tie: Sales < Salex
      Seq.fill(5)("Operations") :+ null.asInstanceOf[String])
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Fuzzy.consolidateValues(df, "v", maxDist = 2, outCol = "vc")
      .groupBy("vc").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out(Some("Marketing")) == 53L, s"typo variants fold in: $out")
    assert(out(Some("Sales")) == 20L, "equal-count pair folds to the lexicographically smaller")
    assert(out(Some("Operations")) == 5L, "isolated value unchanged")
    assert(out(None) == 1L, "null passes through")
    assert(!out.keys.flatten.exists(Set("Marketng", "Marketing.", "Salex")), s"variants gone: $out")
  }

  test("fuzzyPairs plan: no cartesian product / broadcast nested loop") {
    val df = Seq((1L, "hello"), (2L, "hallo")).toDF("id", "s")
    val findings = graft.core.PlanLint.lint(Fuzzy.fuzzyPairs(df, "id", "s", 2))
      .filter(f => f.rule == "cartesian_product" || f.rule == "broadcast_nested_loop")
    assert(findings.isEmpty, findings.mkString(", "))
  }
}
