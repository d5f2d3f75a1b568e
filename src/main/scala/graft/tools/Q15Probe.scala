package graft.tools
import graft.functions.fns
import org.apache.spark.sql.functions._
object Q15Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.BenchCdc.session(32)
    val dir = "/root/testdata/sf0.1"
    def t[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"$n: ${(System.nanoTime()-t0)/1e9}%.1f s"); r }
    val sh = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id"), col("lang"),
      array_distinct(fns.wordShingles(fns.wsTokens(col("text")), 3)).as("sh"))
    t("shingle_count")(println(sh.count()))
    t("shingle_count2")(println(sh.count()))
    val banded = sh.select(col("doc_id"), posexplode(fns.minhashBands(col("sh"), 64, 2, 7L)))
      .withColumnsRenamed(Map("pos"->"band","col"->"band_hash"))
    t("banded_count")(println(banded.count()))
    t("banded_count2")(println(banded.count()))
    val cand = banded.as("a").join(banded.as("b"),
      col("a.band")===col("b.band") && col("a.band_hash")===col("b.band_hash") && col("a.doc_id")<col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    t("cand_raw")(println(cand.count()))
    t("cand_distinct")(println(cand.distinct().count()))
    spark.stop()
  }
}
