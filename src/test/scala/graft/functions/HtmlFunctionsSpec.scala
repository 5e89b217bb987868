package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def blocksOf(html: String): Seq[String] = {
    val df = Seq(html).toDF("h")
    df.select(HtmlFunctions.htmlBlocks(col("h")).as("b"))
      .collect().head.getSeq[String](0)
  }

  test("blocks split on p/br/div/h*, tags stripped, whitespace squeezed") {
    val html = "<html><body><h1>Title  here</h1>" +
      "<p>first   paragraph</p><br>line after break" +
      "<div>in a div</div><p><b>bold</b> tail</p></body></html>"
    assert(blocksOf(html) ==
      Seq("Title here", "first paragraph", "line after break", "in a div", "bold tail"))
  }

  test("tables collapse to [tabela]; entities and NBSP clean up") {
    val html = "<p>before</p><table><tr><td>a</td><td>b</td></tr></table>" +
      "<p>x&nbsp;&amp; y</p>"
    assert(blocksOf(html) == Seq("before", "[tabela]", "x & y"))
  }

  test("empty and dots-only paragraphs are dropped (irrelevant filter)") {
    val html = "<p>keep</p><p>   </p><p>...</p><p>. . .</p><p>also keep</p>"
    assert(blocksOf(html) == Seq("keep", "also keep"))
  }

  test("CR removed, LF becomes space inside a block; htmlText joins with LF") {
    val df = Seq("<p>a\r\nb</p><p>c</p>").toDF("h")
    val r = df.select(HtmlFunctions.htmlText(col("h")).as("t")).collect().head.getString(0)
    assert(r == "a b\nc")
  }

  test("compressInterTag squeezes pretty-printed markup") {
    val df = Seq("<p>a</p>\n   <p>b</p>").toDF("h")
    val r = df.select(HtmlFunctions.compressInterTag(col("h")).as("t"))
      .collect().head.getString(0)
    assert(r == "<p>a</p><p>b</p>")
  }
}
