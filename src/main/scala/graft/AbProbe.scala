package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch interleaved A/B timing harness (round 16): runs two query
  * variants alternately and reports min-of-N for each, so host drift
  * hits both sides equally. Not part of any query path; delete-safe.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).headOption.getOrElse("std")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Standardise
    import graft.queries.RefSurface

    def stdOld(): DataFrame = {
      val raw = RefSurface.rawBooks(spark, sfDir)
        .withColumn("title", Standardise.trimmed(col("title")))
      Standardise.dedupFirst(raw,
          key = Seq(col("title")),
          order = Seq(col("l_orderkey"), col("l_linenumber"),
            col("author"), col("book_type"), col("price"), col("rating")))
        .select(
          col("title"), col("author"), col("book_type"),
          Standardise.parsePrice(col("price")).as("price"),
          Standardise.extractRating(col("rating")).as("rating"),
          Standardise.parseCount(col("rating_count")).as("rating_count"))
        .orderBy(col("title"))
    }
    def stdNew(): DataFrame = RefSurface.standardiseBooks(spark, sfDir)

    import graft.operators.TextOps
    import graft.sources.Tables

    def bpeTrain(checkpointBest: Boolean): DataFrame = {
      val BPE_MERGES = 10
      val wf = Tables.documents(spark, sfDir)
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      var vf = wf.select(
        concat(lit("||"), regexp_replace(col("w"), "(.)", "$1||")).as("sym"),
        col("freq")).localCheckpoint(true)
      var merges: DataFrame = null
      for (r <- 1 to BPE_MERGES) {
        val best0 = vf
          .select(col("freq"),
            filter(split(col("sym"), "\\|\\|"), x => x =!= "").as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(col("freq"), col("ts"),
            explode(expr("sequence(1, size(ts) - 1)")).as("i"))
          .select(element_at(col("ts"), col("i")).as("lhs"),
            element_at(col("ts"), col("i") + 1).as("rhs"), col("freq"))
          .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("lhs"), col("rhs")).limit(1)
          .select(lit(r).as("merge_rank"), col("lhs"), col("rhs"), col("cnt"))
        val best = if (checkpointBest) best0.localCheckpoint(true) else best0
        merges = if (merges == null) best else merges.union(best)
        vf = vf.crossJoin(broadcast(best))
          .select(
            replace(col("sym"),
              concat(lit("|"), col("lhs"), lit("||"), col("rhs"), lit("|")),
              concat(lit("|"), col("lhs"), col("rhs"), lit("|"))).as("sym"),
            col("freq"))
          .localCheckpoint(true)
      }
      merges
        .select(col("merge_rank"), col("lhs"), col("rhs"),
          concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
        .orderBy(col("merge_rank"))
    }

    def dsir(fused: Boolean): DataFrame = {
      val nBuckets = 65536
      val docs = Tables.documents(spark, sfDir)
      val perDoc = docs
        .select(col("doc_id").as("doc_id"), (col("lang") === "en").as("is_tgt"),
          explode(TextOps.words(col("text"))).as("word"))
        .select(col("doc_id"), col("is_tgt"),
          (TextOps.h31(col("word")) % nBuckets).as("b"))
        .groupBy(col("doc_id"), col("is_tgt"), col("b"))
        .agg(count(lit(1)).cast("decimal(10,0)").as("n"))
        .persist()
      val hist =
        if (fused)
          perDoc.groupBy(col("b")).agg(
            sum(col("n")).cast("long").as("cr"),
            coalesce(sum(when(col("is_tgt"), col("n"))).cast("long"), lit(0L))
              .as("ct"))
        else {
          val raw = perDoc.groupBy(col("b")).agg(sum(col("n")).cast("long").as("cr"))
          val tgt = perDoc.filter(col("is_tgt"))
            .groupBy(col("b")).agg(sum(col("n")).cast("long").as("ct"))
          raw.join(tgt, Seq("b"), "left").na.fill(0L, Seq("ct"))
        }
      val tots = hist.agg(sum(col("cr")).cast("long").as("tr"),
        sum(col("ct")).cast("long").as("tt"))
      val lw = hist.crossJoin(broadcast(tots)).select(col("b"),
        (log((col("ct") + 1).cast("double") / (col("tt") + nBuckets).cast("double"))
            .cast("decimal(20,12)")
          - log((col("cr") + 1).cast("double") / (col("tr") + nBuckets).cast("double"))
            .cast("decimal(20,12)")).as("dlw"))
      val scored = perDoc.join(broadcast(lw), Seq("b"))
        .groupBy(col("doc_id")).agg(sum(col("n") * col("dlw")).as("logw"))
      scored.orderBy(col("logw").desc, col("doc_id")).limit(100)
        .select(col("doc_id"), round(col("logw").cast("double"), 6).as("importance"))
        .orderBy(col("doc_id"))
    }

    def ccLabels(seeded: Boolean): DataFrame = {
      val pairs = graft.queries.DedupQueries
        .queries.find(_.name == "dedup_minhash_lsh").get
        .build(spark, sfDir).select(col("id_a"), col("id_b"))
      val maxIter = 20
      val edges = pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(true)
      var labels =
        if (seeded)
          edges.groupBy(col("src").as("id"))
            .agg(least(min(col("dst")), first(col("src"))).as("lbl"))
            .select(col("id"), col("lbl"))
            .localCheckpoint(true)
        else
          edges.select(col("src").as("id")).distinct()
            .withColumn("lbl", col("id"))
            .localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val nbrMin = edges
          .join(labels.select(col("id").as("dst"), col("lbl").as("dst_lbl")), "dst")
          .groupBy(col("src")).agg(min(col("dst_lbl")).as("nbr_lbl"))
        val next = labels
          .join(nbrMin.select(col("src").as("id"), col("nbr_lbl")), Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("nbr_lbl"), col("lbl"))).as("lbl"),
            (col("nbr_lbl") < col("lbl")).cast("int").as("chg"))
          .localCheckpoint(true)
        val changed = next.agg(coalesce(sum(col("chg")), lit(0L))).head().getLong(0)
        labels = next.select(col("id"), col("lbl"))
        converged = changed == 0
        iter += 1
      }
      System.err.println(s"[abprobe] cc seeded=$seeded rounds=$iter")
      labels.select(col("id"), col("lbl").as("cluster")).orderBy(col("id"))
    }

    import graft.operators.Quantizer

    def trainedCentroidsOld(vecs: DataFrame, nCent: Int,
        iters: Int = 2, dims: Int = 64): DataFrame = {
      val QuantScale = 1000
      var cent = vecs.filter(col("vec_id") < nCent)
        .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))
        .localCheckpoint()
      for (_ <- 0 until iters) {
        val assigned = Quantizer.assignNearest(spark, vecs, cent)
          .select(col("vec_id"), col("emb"), col("c_id"))
        val means = assigned
          .select(col("c_id"), posexplode(col("emb")).as(Seq("pos", "v")))
          .select(col("c_id"), col("pos"),
            floor(col("v") * QuantScale).cast("long").as("q"))
          .groupBy(col("c_id"), col("pos"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
          .withColumn("cv",
            col("sq").cast("double") / (col("n") * lit(QuantScale.toDouble)))
          .groupBy(col("c_id"))
          .agg(transform(
            sort_array(collect_list(struct(col("pos"), col("cv")))),
            s => s.getField("cv")).as("new_emb"))
        cent = cent.join(means, Seq("c_id"), "left")
          .select(col("c_id"),
            coalesce(col("new_emb"), col("c_emb")).as("c_emb"))
          .localCheckpoint()
      }
      cent
    }

    // 128-dim Lloyd A/B (the mfd fused-space shape: dims past the
    // whole-stage-codegen maxFields default)
    def c128(old: Boolean): DataFrame = {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          concat(col("embedding").cast("array<double>"),
            col("embedding").cast("array<double>")).as("emb"))
        .localCheckpoint()
      val cent = if (old) trainedCentroidsOld(e, 16, dims = 128)
        else Quantizer.trainedCentroids(spark, e, 16, dims = 128)
      cent.select(col("c_id")).orderBy(col("c_id"))
    }

    // pure Lloyd A/B on the image corpus (dims=64, NC=1024 — the emc shape)
    def emcLike(old: Boolean): DataFrame = {
      val e = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val cent = if (old) trainedCentroidsOld(e, 1024, dims = 64)
        else Quantizer.trainedCentroids(spark, e, 1024, dims = 64)
      cent.select(col("c_id")).orderBy(col("c_id"))
    }

    val (a, b): (() => DataFrame, () => DataFrame) = which match {
      case "std" => (stdOld _, stdNew _)
      case "tbt" => (() => bpeTrain(true), () => bpeTrain(false))
      case "dsr" => (() => dsir(false), () => dsir(true))
      case "cc"  => (() => ccLabels(false), () => ccLabels(true))
      case "emc" => (() => emcLike(true), () => emcLike(false))
      case "c128" => (() => c128(true), () => c128(false))
      case other => sys.error(s"unknown probe $other")
    }
    def run(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    run(a); run(b) // warmups
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 7) { as += run(a); bs += run(b) }
    System.err.println(f"[abprobe] A reps=${as.map(x => f"$x%.2f").mkString(",")} min=${as.min}%.2f")
    System.err.println(f"[abprobe] B reps=${bs.map(x => f"$x%.2f").mkString(",")} min=${bs.min}%.2f")
    spark.stop()
  }
}
