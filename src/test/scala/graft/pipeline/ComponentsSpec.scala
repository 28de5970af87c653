package graft.pipeline

import graft.SparkSpec

/** Star-contraction connected components vs a driver-side union-find oracle
  * (plus hand-checked shapes that stress the contraction: long chains force
  * many rounds of naive propagation; high-degree stars force the large-star
  * rewiring; mixed components must not merge). */
class ComponentsSpec extends SparkSpec {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val rows = Components.connectedComponents(pairs.toDF("aid", "bid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // a node must carry exactly ONE label — a non-converged star set would
    // emit several, and .toMap alone would silently keep the last
    assert(rows.map(_._1).distinct.length == rows.length,
      s"multi-labeled output: ${rows.sorted.toSeq}")
    rows.toMap
  }

  /** Reference union-find on the driver. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain collapses to its minimum") {
    val r = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("star centered on the LARGEST id still roots at the minimum") {
    val r = cc(Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)))
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 1L))
  }

  test("disjoint components stay disjoint") {
    val r = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(r(2L) == 1L && r(11L) == 10L && r(12L) == 10L && r(21L) == 20L)
    assert(r.values.toSet == Set(1L, 10L, 20L))
  }

  test("empty pair list yields empty components") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("aid", "bid")
    assert(Components.connectedComponents(empty).collect().isEmpty)
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val r = cc(Seq((3L, 3L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(r == Map(1L -> 1L, 2L -> 1L))
  }

  test("matches union-find on a pseudo-random graph") {
    // deterministic LCG; ~120 edges over 80 nodes → several multi-node
    // components of varied shape
    var seed = 0x5DEECE66DL
    def next(bound: Int): Long = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      math.floorMod(seed >>> 33, bound.toLong)
    }
    val pairs = Seq.fill(120)((next(80), next(80))).filter(p => p._1 != p._2)
    val expected = unionFind(pairs)
    assert(cc(pairs) == expected)
  }

  test("reliable-checkpoint mode computes identical components") {
    import spark.implicits._
    // same contraction, but per-round truncation goes through a RELIABLE
    // checkpoint dir (the executor-loss story for the 100 TB run) — results
    // must be identical to the localCheckpoint default, and the checkpoint
    // dir must actually receive data
    val ckDir = graft.core.Scratch.dir("cc_reliable_spec")
    val fs = new org.apache.hadoop.fs.Path(ckDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(ckDir), true)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("aid", "bid")
    val reliable = Components.connectedComponents(
        pairs, checkpointDir = Some(ckDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = Components.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reliable == local)
    assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
    val ckFiles = fs.listFiles(new org.apache.hadoop.fs.Path(ckDir), true)
    assert(ckFiles.hasNext, "reliable mode must write checkpoint data")
  }

  test("dropIds keeps exactly one doc (the min) per cluster") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("aid", "bid")
    val dropped = Components.dropIds(pairs).collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 3L, 9L))
  }
}
