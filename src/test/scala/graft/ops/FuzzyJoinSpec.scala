package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deleteVariants(d=1) is the string plus every single deletion") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deleteVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head()
    assert(got.toSet == Set("abc", "bc", "ac", "ab"))
  }

  test("deleteVariants handles the empty string") {
    val g1 = Seq("").toDF("s")
      .select(FuzzyJoin.deleteVariants(col("s"), 1).as("v"))
      .as[Seq[String]].head()
    assert(g1 == Seq(""))
    val g2 = Seq("x").toDF("s")
      .select(FuzzyJoin.deleteVariants(col("s"), 2).as("v"))
      .as[Seq[String]].head()
    assert(g2.toSet == Set("x", ""))
  }

  test("editDistanceJoin(d=1) equals brute force on random strings") {
    val rnd = new scala.util.Random(7)
    def word() = (1 to 3 + rnd.nextInt(6))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val left = (1 to 60).map(i => (i.toLong, word()))
    val right = (1 to 60).map(i => (i.toLong + 1000, word()))
    val got = FuzzyJoin.editDistanceJoin(
        left.toDF("lid", "ls"), right.toDF("rid", "rs"), "ls", "rs", 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val want = (for {
      (lid, ls) <- left; (rid, rs) <- right
      d = lev(ls, rs) if d <= 1
    } yield (lid, rid, d)).toSet
    assert(got == want)
  }

  test("editDistanceJoin(d=2) equals brute force (delete-2 pigeonhole)") {
    val rnd = new scala.util.Random(21)
    def word() = (1 to 4 + rnd.nextInt(4))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val left = (1 to 40).map(i => (i.toLong, word()))
    val right = (1 to 40).map(i => (i.toLong + 1000, word()))
    val got = FuzzyJoin.editDistanceJoin(
        left.toDF("lid", "ls"), right.toDF("rid", "rs"), "ls", "rs", 2)
      .select("lid", "rid", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val want = (for {
      (lid, ls) <- left; (rid, rs) <- right
      d = lev(ls, rs) if d <= 2
    } yield (lid, rid, d)).toSet
    assert(got == want)
  }

  test("null keys match nothing; the blocked plan has no cartesian") {
    val l = Seq((1L, "abc"), (2L, null)).toDF("lid", "ls")
    val r = Seq((9L, "abc")).toDF("rid", "rs")
    val out = FuzzyJoin.editDistanceJoin(l, r, "ls", "rs", 1)
    assert(out.select("lid").as[Long].collect().toSeq == Seq(1L))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
  test("duplicate input rows preserve brute-force join multiplicity") {
    // the blocking runs over DISTINCT key strings and rejoins the
    // original frames, so two identical left rows each produce their
    // pair — exactly what a crossJoin + levenshtein would emit
    val l = Seq((1L, "abc"), (1L, "abc"), (2L, "abd")).toDF("lid", "ls")
    val r = Seq((9L, "abc")).toDF("rid", "rs")
    val got = FuzzyJoin.editDistanceJoin(l, r, "ls", "rs", 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)]
      .collect().toSeq.sorted
    assert(got == Seq((1L, 9L, 0), (1L, 9L, 0), (2L, 9L, 1)), got.toString)
  }
}
