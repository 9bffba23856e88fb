package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase probe for the current dbscanGrid shape at the gate point (r14). */
object Scratch16 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").count()
    graft.sources.Tables.load(spark, sfDir)
    graft.sources.Tables.names.foreach(n => spark.table(n).cache())
    spark.table("embeddings").count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[s16] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val df = spark.table("embeddings")
    val epsFx = 200000L
    val minPts = 6
    val proj = t("jl build") {
      graft.operators.Similarity.jlProject(df, "vec_id", "embedding", 64, 2)
    }
    val pts = t("pts ckpt+count") {
      val p = graft.operators.Caching.checkpoint(
        graft.operators.Caching.persist(proj.groupBy(col("id"))
          .agg(max(when(col("j") === 0, col("out_fx"))).as("x"),
            max(when(col("j") === 1, col("out_fx"))).as("y"))
          .select(col("id"), col("x"), col("y"),
            expr(s"(x - pmod(x, ${epsFx}L)) div ${epsFx}L").as("cx"),
            expr(s"(y - pmod(y, ${epsFx}L)) div ${epsFx}L").as("cy"))),
        eager = true)
      println("  |pts| = " + p.count()); p
    }
    val fwd = Seq((0L, 1L), (1L, -1L), (1L, 0L), (1L, 1L))
    val probes = pts.select(col("id"), col("x"), col("y"),
      explode(array(fwd.map { case (dx, dy) =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy")) }: _*))
        .as("c"))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("c.cx"), col("c.cy"))
    val ptsB = pts.select(col("id").as("id_b"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val inBall = abs(col("xa") - col("xb")) <= epsFx &&
      abs(col("ya") - col("yb")) <= epsFx
    val cross = probes.join(ptsB, Seq("cx", "cy")).where(inBall)
      .select(col("id_a"), col("id_b"))
    val same = pts.select(col("id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"), col("cx"), col("cy"))
      .join(ptsB, Seq("cx", "cy"))
      .where(col("id_a") < col("id_b") && inBall)
      .select(col("id_a"), col("id_b"))
    val half = graft.operators.Caching.persist(cross.unionAll(same))
    val nbrs = t("nbrs ckpt+count") {
      val n = graft.operators.Caching.checkpoint(half.unionAll(
        half.select(col("id_b").as("id_a"), col("id_a").as("id_b"))),
        eager = true)
      println("  |nbrs| = " + n.count()); n
    }
    val cores = t("cores ckpt+count") {
      val c = graft.operators.Caching.checkpoint(pts.select(col("id"))
        .join(nbrs.groupBy(col("id_a").as("id"))
          .agg(count(lit(1)).as("nn")), Seq("id"), "left")
        .where(coalesce(col("nn"), lit(0L)) + 1 >= minPts)
        .select(col("id")), eager = true)
      println("  |cores| = " + c.count()); c
    }
    val coreEdges = nbrs
      .join(cores.withColumnRenamed("id", "id_a"), "id_a")
      .join(cores.withColumnRenamed("id", "id_b"), "id_b")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    t("coreEdges count") { println("  |coreEdges| = " + coreEdges.count()) }
    val fams = t("CC") {
      val f = graft.operators.Dedup.connectedComponents(coreEdges,
          engineDefault = "tworule")
        .select(col("doc_id").as("id"), col("family_id"))
      println("  |fams| = " + f.count()); f
    }
    spark.stop()
  }
}
