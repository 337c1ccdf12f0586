package graft

import graft.ops.Graphs
import org.apache.spark.sql.functions._

import scala.util.Random

/** Property nets for the iterative graph operators: components against
  * a driver-side union-find and lineage closure against a plain
  * pointer walk, over random graphs that include deep chains (the
  * pointer-jumping regime) and dense blobs (the 2-3 round regime).
  */
class GraphsSpec extends SparkSpec {

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // min node id per component, only for nodes that appear in edges
    val present = edges.flatMap(e => Seq(e._1, e._2)).distinct
    present.map(v => v -> {
      var r = v.toInt
      while (parent(r) != r) r = parent(r)
      // find the min id in that root's component among present nodes
      r.toLong
    }).toMap.map { case (v, r) =>
      v -> present.filter(p => { var q = p.toInt; while (parent(q) != q) q = parent(q); q == r }).min
    }
  }

  test("property: connectedComponents equals union-find on random graphs") {
    import spark.implicits._
    val rnd = new Random(99)
    for (round <- 1 to 6) {
      val n = 40 + round * 10
      val edges: Seq[(Long, Long)] =
        if (round % 3 == 0) {
          // adversarial: one long chain (diameter n) + a few blobs
          (0L until (n - 1).toLong).map(i => (i, i + 1))
        } else {
          Seq.fill(n)( (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong) )
            .filter(e => e._1 != e._2)
        }
      val expected = unionFind(n, edges)
      val got = Graphs.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"round $round (${edges.length} edges)")
    }
  }

  test("property: lineageClosure equals the pointer walk on random forests") {
    import spark.implicits._
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val n = 60
      // random forest: node i's parent is a random j < i (or root)
      val parents: Map[String, Option[String]] = (0 until n).map { i =>
        s"t$i" -> (if (i == 0 || rnd.nextInt(5) == 0) None
                   else Some(s"t${rnd.nextInt(i)}"))
      }.toMap
      def walk(id: String): Seq[String] = {
        var cur: Option[String] = Some(id)
        var acc = List.empty[String]
        while (cur.isDefined) { acc = cur.get :: acc; cur = parents(cur.get) }
        acc
      }
      val df = parents.toSeq.map { case (id, p) => (id, p.orNull) }
        .toDF("id", "parent")
      val got = Graphs.lineageClosure(df, "id", "parent")
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
      parents.keys.foreach { id =>
        assert(got(id) === walk(id).toList, s"lineage of $id")
      }
    }
  }
}
