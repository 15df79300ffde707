package graft

import java.nio.file.Files

import graft.functions.ZOrder
import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits exactly (hand-computed)") {
    // x = 0b101 -> bits 0,4; y = 0b011 -> bits 1,3  =>  1+2+8+16 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), bits = 3).as("z"))
      .as[Long].head()
    assert(got == 27L)
    // single column degenerates to the identity
    val id = Seq(12345L).toDF("x")
      .select(ZOrder.zvalue(Seq(col("x")), bits = 21).as("z"))
      .as[Long].head()
    assert(id == 12345L)
  }

  test("zvalue is monotone within an axis-aligned box (locality sanity)") {
    // within a 2^k-aligned box, all z-values fall inside one contiguous
    // z-range: the box [8,11] x [4,7] is the 4x4 cell at (8,4)
    val cells = for { x <- 8L to 11L; y <- 4L to 7L } yield (x, y)
    val zs = cells.toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), bits = 8))
      .as[Long].collect()
    assert(zs.max - zs.min == 15, "16 cells must occupy one z-range of 16")
  }

  test("zvalueChecked nulls out-of-domain rows instead of garbage") {
    val r = Seq((5L, 3L), (-1L, 3L), (1L << 22, 3L))
      .toDF("x", "y")
      .select(ZOrder.zvalueChecked(Seq(col("x"), col("y")), bits = 21).as("z"))
      .collect().map(r => Option(r.get(0)))
    assert(r(0).isDefined && r(1).isEmpty && r(2).isEmpty)
  }

  test("planCompaction: hand groups, boundary spill bound, " +
    "distributed == single-window witness") {
    // bytes 5,5,5,5 at target 10: cum0 = 0,5,10,15 -> groups 0,0,1,1
    val hand = Layout.planCompaction(
      Seq(("a", 5L), ("b", 5L), ("c", 5L), ("d", 5L)).toDF("file", "bytes"),
      targetBytes = 10L)
      .select("file", "group_id").as[(String, Long)].collect().toSeq
    assert(hand == Seq(("a", 0L), ("b", 0L), ("c", 1L), ("d", 1L)))
    // corpus-scale fixture: one pseudo-file per doc
    val files = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(concat(lit("f"),
        lpad(col("doc_id").cast("string"), 12, "0")).as("file"),
        col("n_chars").cast("long").as("bytes"))
    val got = Layout.planCompaction(files, targetBytes = 3000L)
    // distributed prefix sums == the single window the op refuses
    val w = org.apache.spark.sql.expressions.Window.orderBy("file")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val want = files
      .withColumn("cum0", coalesce(sum("bytes").over(w), lit(0L)))
      .select(col("file"), col("bytes"),
        expr("cum0 DIV 3000").as("group_id"), col("cum0"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // every group is at most target + its boundary file's spill
    val maxBytes = files.agg(max("bytes")).as[Long].head()
    val over = got.groupBy("group_id").agg(sum("bytes").as("gb"))
      .filter(col("gb") > lit(3000L) + maxBytes)
    assert(over.isEmpty)
    // and groups are contiguous in file order
    val nonMono = got.orderBy("file").select("group_id").as[Long]
      .collect().sliding(2).exists(p => p.length == 2 && p(0) > p(1))
    assert(!nonMono)
  }

  test("z-ordered layout: same rows, far fewer files touched by a 2-D box") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val nDir = Files.createTempDirectory("graft-natural").toString
    val nFiles = 16
    Layout.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), zDir, nFiles)
    // the baseline a single-column lake gives you: clustered by the
    // unrelated l_orderkey, so partkey/suppkey stats are useless
    Layout.writeSorted(li, Seq("l_orderkey"), nDir, nFiles)

    // correctness is layout-invariant: same multiset of rows
    val a = spark.read.parquet(zDir)
    assert(a.count() == li.count())
    assert(a.exceptAll(li).isEmpty && li.exceptAll(a).isEmpty)

    // pruning witness: a selective 2-D range box must intersect far
    // fewer z-ordered files than naturally-ordered files
    val maxP = li.agg(max("l_partkey")).as[Long].head()
    val maxS = li.agg(max("l_suppkey")).as[Long].head()
    val box = Map(
      "l_partkey" -> (0L, maxP / 8),
      "l_suppkey" -> (0L, maxS / 8))
    val zTouched = Layout.filesIntersecting(spark, zDir, box)
    val nTouched = Layout.filesIntersecting(spark, nDir, box)
    assert(nTouched == nFiles,
      s"orderkey-sorted layout should prune nothing, touched $nTouched")
    assert(zTouched * 2 <= nTouched,
      s"z-order should halve files touched at worst: $zTouched vs $nTouched")

    // and the box query itself returns identical rows on both layouts
    def boxQuery(path: String) = spark.read.parquet(path)
      .filter(col("l_partkey").between(0L, maxP / 8) &&
        col("l_suppkey").between(0L, maxS / 8))
    assert(boxQuery(zDir).exceptAll(boxQuery(nDir)).isEmpty &&
      boxQuery(nDir).exceptAll(boxQuery(zDir)).isEmpty)
  }
}
