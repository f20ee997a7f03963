package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bit-parity guards for the native kernels against their declarative
  * Column formulations — a kernel change that drifts from the composed
  * form would silently alter gate results, so the equivalence itself is
  * pinned here on randomized inputs. */
class KernelParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic pseudo-random ASCII corpus: words of 1-7 chars, 0-60
  // words per doc, plus crafted edge cases (empty words via double spaces,
  // leading/trailing spaces, short strings)
  private def corpus: Seq[String] = {
    var seed = 987654321L
    def next(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound + bound) % bound).toInt
    }
    val rand = (0 until 40).map { _ =>
      val nWords = next(60)
      (0 until nWords).map { _ =>
        val len = 1 + next(7)
        (0 until len).map(_ => ('a' + next(26)).toChar).mkString
      }.mkString(" ")
    }
    rand ++ Seq("", "a", "a b", "a b c", "a  b  c", " lead", "trail ",
      "x y z w v u t", "abcdefgh", "same same same same")
  }

  test("winnow kernel is bit-identical to the declarative formulation") {
    val s = spark; import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // declarative reference: gram strHash, 4-window min, distinct
    val grams = docs.filter(length(col("text")) >= 8)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), length(col("text")) - lit(4)),
          i => col("text").substr(i, lit(5)))))
      .withColumnRenamed("col", "g")
      .withColumn("hg",
        (graft.queries.Parity.strHash(col("g")) * lit(2654435761L)) % 1000003L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, 3)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val expected = grams
      .withColumn("wm", min(col("hg")).over(w))
      .withColumn("maxp", max(col("pos")).over(wAll))
      .filter(col("pos") <= col("maxp") - 3)
      .select(col("doc_id"), col("wm")).distinct()
      .as[(Long, Long)].collect().toSet
    val got = docs
      .select(col("doc_id"),
        explode(graft.functions.Winnow.of(col("text"))).as("wm"))
      .as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("shingle kernel: count and distinctness invariants vs split()") {
    val s = spark; import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val counts = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("nw"),
        size(graft.functions.ShingleHash.of(col("text"))).as("nsh"))
      .as[(Long, Int, Int)].collect()
    counts.foreach { case (id, nw, nsh) =>
      assert(nsh == math.max(0, nw - 2), s"doc $id: $nw words, $nsh shingles")
    }
    // distinct cardinality equals distinct string-shingle cardinality
    // (no kernel hash collisions on this corpus)
    val strDistinct = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("w")) - lit(3)),
        i => concat_ws(" ",
          element_at(col("w"), i + lit(1)),
          element_at(col("w"), i + lit(2)),
          element_at(col("w"), i + lit(3))))).as("sh"))
      .distinct().groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val hashDistinct = docs
      .select(col("doc_id"),
        explode(graft.functions.ShingleHash.of(col("text"))).as("sh"))
      .distinct().groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(hashDistinct == strDistinct)
  }

  test("chargram kernel matches the portable strHash of substr trigrams") {
    val s = spark; import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val kernel = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        posexplode(graft.functions.CharGramHash.of(col("text"))))
      .withColumnRenamed("col", "h")
      .as[(Long, Int, Long)].collect().toSet
    val reference = docs.filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), length(col("text")) - lit(2)),
          i => graft.queries.Parity.strHash(col("text").substr(i, lit(3))))))
      .withColumnRenamed("col", "h")
      .as[(Long, Int, Long)].collect().toSet
    assert(kernel == reference)
  }

  test("shingle distinct kernel = set of the plain kernel's hashes") {
    val s = spark; import s.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val plain = docs.select(col("doc_id"),
        explode(graft.functions.ShingleHash.of(col("text"))).as("h"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val dedup = docs.select(col("doc_id"),
        explode(graft.functions.ShingleHash.distinctOf(col("text"))).as("h"))
      .as[(Long, Long)].collect()
    // distinct variant emits each hash exactly once...
    assert(dedup.distinct.length == dedup.length)
    // ...and exactly the set the plain kernel produces
    assert(dedup.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap == plain)
  }

  test("jaccard length bound drops no qualifying pair (exactness)") {
    // jaccardPairs prunes candidates with t·max(|A|,|B|) > min(|A|,|B|)
    // inside the self-join; this pins that the bound is EXACT by comparing
    // against the unfiltered formulation on real data at sf0.001.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val filtered = graft.queries.DedupOps.jaccardPairs(docs, 0.5)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: same index, no length predicate, sizes joined post-agg
    val sh0 = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHash.distinctOf(col("text"))).as("s"))
    val cap = docs.agg(greatest(lit(5L),
      floor(count(lit(1)) / lit(100)).cast("long")).as("cap"))
    val hot = sh0.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(cap)).filter(col("df") > col("cap")).select(col("s"))
    val sh = sh0.join(broadcast(hot), Seq("s"), "left_anti")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val reference = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(filtered == reference)
    assert(reference.nonEmpty, "fixture must exercise the pair path")
  }
}
