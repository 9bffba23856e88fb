package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: stage-by-stage wall-clock of dbscanGrid's internals. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SCRATCH_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.load(spark, "/root/testdata/sf0.1")
    val emb = spark.table("embeddings").cache()
    emb.count()
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[t] $tag ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    val epsFx = 200000L
    val proj = graft.operators.Similarity.jlProject(
      emb, "vec_id", "embedding", 64, outDim = 2)
    t("jlProject")(proj.count())
    val pts = proj.groupBy(col("id"))
      .agg(max(when(col("j") === 0, col("out_fx"))).as("x"),
        max(when(col("j") === 1, col("out_fx"))).as("y"))
      .select(col("id"), col("x"), col("y"),
        expr(s"(x - pmod(x, ${epsFx}L)) div ${epsFx}L").as("cx"),
        expr(s"(y - pmod(y, ${epsFx}L)) div ${epsFx}L").as("cy")).cache()
    t("pts")(pts.count())
    println("[t] cells " + pts.groupBy("cx", "cy").count()
      .agg(max("count"), count(lit(1))).collect().mkString)
    val offsets = Seq(-1L, 0L, 1L)
    val probes = pts.select(col("id"), col("x"), col("y"),
      explode(array(offsets.flatMap(dx => offsets.map(dy =>
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy")))): _*))
        .as("c"))
      .select(col("id").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        col("c.cx"), col("c.cy"))
    val nbrs = probes.join(
        pts.select(col("id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"), col("cx"), col("cy")),
        Seq("cx", "cy"))
      .where(col("id_a") =!= col("id_b") &&
        abs(col("xa") - col("xb")) <= epsFx &&
        abs(col("ya") - col("yb")) <= epsFx)
      .select(col("id_a"), col("id_b")).cache()
    t("nbrs")(println("  nbr rows=" + nbrs.count()))
    val cores = pts.select(col("id"))
      .join(nbrs.groupBy(col("id_a").as("id"))
        .agg(count(lit(1)).as("nn")), Seq("id"), "left")
      .where(coalesce(col("nn"), lit(0L)) + 1 >= 6)
      .select(col("id")).cache()
    t("cores")(println("  cores=" + cores.count()))
    val coreEdges = nbrs
      .join(cores.withColumnRenamed("id", "id_a"), "id_a")
      .join(cores.withColumnRenamed("id", "id_b"), "id_b")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    t("coreEdges")(println("  edges=" + coreEdges.count()))
    val fams = graft.operators.Dedup.connectedComponents(coreEdges)
    t("connectedComponents")(fams.count())
    t("full dbscanGrid")(graft.operators.Similarity.dbscanGrid(
      emb, "vec_id", "embedding", 64, epsFx, 6).count())
    spark.stop()
  }
}
