package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** W3: cross-page paragraph merge — the reference decides whether the last
  * line of page i and the first line of page i+1 belong to one paragraph
  * and splices them without a paragraph break
  * (/root/reference/mac/demo_gradio_m1.py:183-269: `should_merge_pages` /
  * `merge_ocr_contents` / `extract_context`).
  *
  * The reference delegates the judgment to an LLM with explicit heuristics
  * in its prompt (terminal punctuation; Chinese punctuation at the start of
  * the next line; titles never merge — demo_gradio_m1.py:192-197). We
  * implement those stated heuristics as a deterministic predicate.
  *
  * The splice itself (merge_ocr_contents) is an inherently sequential fold
  * per document, so it runs as a typed `mapGroups` per url — pages per
  * document are bounded (u16), the url groups distribute via the hash
  * shuffle, and everything upstream stays relational.
  */
object PageMerge {

  private val TerminalPunct = Set('。', '？', '！', '.', '?', '!', '"', '”', '’', '」', '』', ':', '：', ';', '；')
  private val CjkOpenPunct = Set('，', '。', '、', '；', '：', '）', '」', '』', '…')

  /** extract_context (demo_gradio_m1.py:224-229): first/last non-blank
    * stripped line. */
  def extractContext(pageContent: String): (String, String) = {
    val lines = pageContent.split("\n").map(_.trim).filter(_.nonEmpty)
    (lines.headOption.getOrElse(""), lines.lastOption.getOrElse(""))
  }

  private def looksLikeHeadingOrListItem(line: String): Boolean =
    line.startsWith("#") || line.startsWith("- ") || line.startsWith("* ") ||
      line.startsWith("> ") || line.startsWith("|") || line.startsWith("$$") ||
      line.startsWith("<table")

  /** Deterministic continuation predicate (replaces the LLM judgment;
    * rules per the reference prompt demo_gradio_m1.py:192-197):
    *   - heading/list/table/formula lines never merge;
    *   - next line starting with CJK continuation punctuation merges;
    *   - otherwise merge iff the previous line lacks terminal punctuation. */
  def shouldMerge(lastLine: String, nextFirstLine: String): Boolean = {
    if (lastLine.isEmpty || nextFirstLine.isEmpty) false
    else if (looksLikeHeadingOrListItem(lastLine) || looksLikeHeadingOrListItem(nextFirstLine)) false
    else if (CjkOpenPunct.contains(nextFirstLine.charAt(0))) true
    else !TerminalPunct.contains(lastLine.charAt(lastLine.length - 1))
  }

  /** merge_ocr_contents (demo_gradio_m1.py:231-269) splice, exactly:
    * same-paragraph → `merged.rstrip() + firstLine (+ "\n" + rest)`;
    * else → `merged + "\n\n" + page`. */
  def mergePages(pages: Seq[String]): String = {
    if (pages.isEmpty) return ""
    val sb = new StringBuilder(pages.head)
    pages.sliding(2).foreach {
      case Seq(prev, cur) =>
        val (_, prevLast) = extractContext(prev)
        val (curFirst, _) = extractContext(cur)
        if (prevLast.isEmpty || curFirst.isEmpty) {
          sb.append("\n\n").append(cur)
        } else if (shouldMerge(prevLast, curFirst)) {
          val lines = cur.split("\n", -1)
          val trimmed = sb.toString.reverse.dropWhile(_.isWhitespace).reverse
          sb.setLength(0)
          sb.append(trimmed).append(lines.head)
          if (lines.length > 1) sb.append("\n").append(lines.tail.mkString("\n"))
        } else {
          sb.append("\n\n").append(cur)
        }
      case _ => ()
    }
    sb.toString
  }

  /** Pages (url, page_no, md) → one merged document per url. */
  def mergeDocuments(pages: DataFrame): DataFrame = {
    import pages.sparkSession.implicits._
    pages.select(col("url"), col("page_no").cast("int"), col("md"))
      .as[(String, Int, String)]
      .groupByKey(_._1)
      .mapGroups { (url, it) =>
        val sorted = it.toVector.sortBy(_._2)
        (url, sorted.length, mergePages(sorted.map(_._3)))
      }
      .toDF("url", "n_pages", "merged_md")
  }
}
