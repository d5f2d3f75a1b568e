package graft

import graft.functions.GraftFunctions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-text surface of the custom expressions: registered names must be
  * callable from spark.sql and agree with the Column API results. */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions run and agree with the Column API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "sphinx of black quartz judge my vow right now again")
    ).toDF("id", "text")
    df.createOrReplaceTempView("t_sqlfns")

    val viaSql = spark.sql(
      """SELECT id,
        |  simhash64(split(trim(text), '\\s+')) AS sh,
        |  size(hashed_word_shingles(text, 3)) AS n_sh,
        |  size(minhash_bands(split(trim(text), '\\s+'), 64, 2, 7) ) AS n_bands,
        |  sorted_jaccard(hashed_word_shingles(text, 3), hashed_word_shingles(text, 3)) AS self_j
        |FROM t_sqlfns""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .sortBy(_._1)

    val viaApi = df.select(col("id"),
        graft.functions.fns.simhash64(graft.functions.fns.wsTokens(col("text"))).as("sh"),
        size(graft.functions.fns.hashedWordShingles(col("text"), 3)).as("n_sh"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)

    viaSql.zip(viaApi).foreach { case ((id1, sh1, nsh1, nbands, selfJ), (id2, sh2, nsh2)) =>
      assert(id1 == id2 && sh1 == sh2 && nsh1 == nsh2)
      assert(nbands == 32)
      assert(selfJ == 1.0)
    }

    // cosine + hyperplane over float arrays from SQL
    val c = spark.sql(
      """SELECT round(cosine_sim(cast(array(1.0, 2.0) AS array<float>),
        |                        cast(array(2.0, 4.0) AS array<float>)), 9) AS cs,
        |       hyperplane_bucket(cast(array(1.0, -1.0) AS array<float>), 4, 11) AS hb
        |""".stripMargin).collect().head
    assert(c.getDouble(0) == 1.0)
    assert(c.getInt(1) >= 0 && c.getInt(1) < 16)

    // cube cell from SQL text ≡ scalar kernel
    val cc = spark.sql("SELECT cube_cell(47.5, 8.5, 9) AS cell").collect().head.getLong(0)
    assert(cc == graft.ops.GeoCells.cellOf(47.5, 8.5, 9))
  }

  test("non-literal knob arguments are rejected with a clear error") {
    GraftFunctions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT minhash_bands(array('a'), cast(id AS int), 2, 7) FROM range(1)").collect())
    assert(e.getMessage.contains("literal"))
  }
}
