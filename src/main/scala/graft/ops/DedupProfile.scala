package graft.ops

// Scratch profiler for dedup_banding_recall_eval subtrees (dev-only).
import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.types.DoubleType

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name%-18s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }

    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      val d = Tables.documents(spark, dir)
      val shRows = d
        .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(array_distinct(expr(
          "transform(sequence(1, size(toks)-2), " +
            "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))).as("shingle"))
      val sh = Dedup.dropHotBuckets(
          shRows.withColumn("ph", expr("graft_poly_hash(shingle)")),
          Dedup.MaxShingleDf, col("shingle"))
        .persist()
      t("sh")(sh.count())
      val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n")).persist()
      val shk = sh.select(col("doc_id"), col("ph"), col("shingle"))
      val truth = shk.as("a").join(shk.as("b").hint("shuffle_hash"),
          col("a.ph") === col("b.ph") &&
            col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("common"))
        .join(broadcast(counts.select(col("doc_id").as("d1"), col("n").as("n1"))), "d1")
        .join(broadcast(counts.select(col("doc_id").as("d2"), col("n").as("n2"))), "d2")
        .filter(col("common").cast(DoubleType) /
          (col("n1") + col("n2") - col("common")).cast(DoubleType) >= 0.8)
        .select(col("d1"), col("d2"))
        .persist()
      t("truth")(truth.count())
      val BandP = 1000000007L
      def bandA(i: Int): Long = ((i + 1) * 40503L) % BandP
      def bandB(i: Int): Long = ((i + 1) * 69069L) % BandP
      val sigCols = (0 until Dedup.NumHashes).map(i =>
        min((lit(bandA(i)) * col("ph") + lit(bandB(i))) % lit(BandP)).as(s"s$i"))
      val sigs = sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
        .persist()
      t("sigs")(sigs.count())
      val schemesBR = Seq((8, 8), (16, 4), (32, 2))
      val maxR = 8
      val bandStructsAll = schemesBR.flatMap { case (b, r) =>
        (0 until b).map { k =>
          struct(lit(b).as("bands"), lit(k).as("band"),
            struct((0 until maxR).map { j =>
              (if (j < r) col(s"s${r * k + j}") else lit(-1L)).as(s"x$j")
            }: _*).as("key"))
        }
      }
      val bndAll = sigs
        .select(col("doc_id"), explode(array(bandStructsAll: _*)).as("bb"))
        .select(col("doc_id"), col("bb.bands").as("bands"),
          col("bb.band").as("band"), col("bb.key").as("key"))
      val capped = Dedup.dropHotBuckets(bndAll, Dedup.MaxBucketSize,
        col("bands"), col("band"), col("key"))
      val candAll = capped.as("x").join(capped.as("y").hint("shuffle_hash"),
          col("x.bands") === col("y.bands") &&
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.bands").as("bands"),
          col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
        .persist()
      t("candAll")(candAll.count())
      val cost = candAll.groupBy(col("bands")).agg(count(lit(1)).as("cand_pairs"))
      val rec = truth
        .crossJoin(broadcast(spark.range(1)
          .select(explode(array(schemesBR.map(s => lit(s._1)): _*)).as("bands"))))
        .join(candAll.withColumn("hit", lit(1)), Seq("bands", "d1", "d2"),
          "left_outer")
        .groupBy(col("bands"))
        .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_recalled"))
      t("rec+cost")(rec.join(broadcast(cost), Seq("bands")).collect())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
