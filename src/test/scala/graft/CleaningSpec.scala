package graft

import graft.operators.Cleaning
import org.apache.spark.sql.functions._

/** Regression tests for the silver cleaning semantics against worked
  * examples from `/root/reference/processor/cleaner.py:24-78`. */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def cleaned(raw: String): String = {
    GraftExtensions.register(spark) // cleanContent resolves graft_clean_content
    Seq(raw).toDF("c").select(Cleaning.cleanContent(col("c"))).as[String].head()
  }

  test("native cleaner passes null through and empties to empty, like the chain") {
    GraftExtensions.register(spark)
    val df = Seq((1, Option("  ")), (2, Option("")), (3, Option.empty[String]))
      .toDF("i", "c")
      .select(col("i"), Cleaning.cleanContent(col("c")).as("n"),
        Cleaning.cleanContentColumns(col("c")).as("chain"))
    val rows = df.orderBy("i").collect()
    assert(rows.map(r => Option(r.get(1))).toSeq === Seq(Some(""), Some(""), None))
    rows.foreach(r => assert(Option(r.get(1)) === Option(r.get(2))))
  }

  test("advertisement blocks are stripped (case-insensitive, multi-line)") {
    assert(cleaned("Intro ADVERTISEMENT buy\nthings SCROLL TO CONTINUE WITH CONTENT outro")
      === "Intro outro")
  }

  test("Pilihan Redaksi section is stripped up to the next capital or digit") {
    assert(cleaned("News here. Pilihan Redaksi: foo bar Next sentence.")
      === "News here. Next sentence.")
  }

  test("Lihat Juga lines are stripped to end of line") {
    assert(cleaned("Before Lihat Juga : some link here\nAfter") === "Before After")
  }

  test("photo and CNN credit parentheticals are stripped") {
    assert(cleaned("x (ANTARA FOTO/Sigid) y (CNN Indonesia/Adhi) z") === "x y z")
  }

  test("Gambas video embeds are stripped") {
    assert(cleaned("a [Gambas:Video CNN] b") === "a b")
  }

  test("whitespace is collapsed and trimmed") {
    assert(cleaned("  a \n\n\n b\t c  ") === "a b c")
  }

  test("leading dateline is stripped") {
    assert(cleaned("Jakarta, CNN Indonesia -- Body text") === "Body text")
  }

  test("title cleanup collapses newlines and whitespace") {
    val r = Seq("A\ntitle   here ").toDF("t")
      .select(Cleaning.cleanTitle(col("t"))).as[String].head()
    assert(r === "A title here")
  }

  test("articleId is the md5 of the link (reference id scheme)") {
    val r = Seq("https://example.com/x").toDF("l")
      .select(Cleaning.articleId(col("l"))).as[String].head()
    assert(r === java.security.MessageDigest.getInstance("MD5")
      .digest("https://example.com/x".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("parseDate handles ISO, dd/MM/yyyy and dd-MM-yyyy, else null") {
    val r = Seq("2024-03-05 10:30:00", "05/03/2024", "05-03-2024", "garbage")
      .toDF("d").select(Cleaning.parseDate(col("d")).cast("string"))
      .collect().map(_.getString(0))
    assert(r(0) === "2024-03-05 10:30:00")
    assert(r(1) === "2024-03-05 00:00:00")
    assert(r(2) === "2024-03-05 00:00:00")
    assert(r(3) === null)
  }

  test("dedupKeepFirst keeps exactly one row per key, lowest tiebreak") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "k")
    val out = Cleaning.dedupKeepFirst(df, col("k"), col("id"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "a"), (3L, "b")))
  }
}
